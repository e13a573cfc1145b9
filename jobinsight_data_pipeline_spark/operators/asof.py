"""As-of (point-in-time) join — the temporal lookup Spark lacks as a
built-in: for each probe row, attach the single most recent version row
(same key, version_ts <= probe_ts).

Implementation is the scalable union trick, not a join:

1. tag version rows (side 0) and probe rows (side 1) and union them;
2. one hash shuffle on the key, sort within each key by (ts, side) —
   versions sort BEFORE probes at equal ts, giving <= semantics;
3. forward-fill the latest version payload with
   ``last(struct, ignorenulls=True)`` over the running window (a struct
   so legitimately-NULL payload fields can't bleed across versions);
4. keep probe rows; matched payload comes from the fill.

Cost: ONE shuffle of |probes| + |versions| rows and a per-key sort —
no fan-out. The naive key-join + range-filter + row_number alternative
materializes |probes| x versions-per-key intermediate rows, which is
exactly what kills SCD2 lookups at 100 TB when hot keys have long
version histories.

The same shape backs SCD2 point-in-time audits (dim version as of each
fact's event date) — the batch counterpart of the reference's
"current-version" dimension resolution (SURVEY §2.9).

Right side must be unique per (key, version_ts); ties across versions
with identical timestamps would fill nondeterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key: str,
    probe_ts: str,
    version_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Attach, to each probe row, ``payload_cols`` from the latest
    version with the same ``key`` and ``version_ts`` <= ``probe_ts``.
    ``how='left'`` keeps unmatched probes with NULL payload;
    ``how='inner'`` drops them."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    out_cols = probes.columns
    probe_side = probes.withColumn("_ats", F.col(probe_ts)).withColumn(
        "_side", F.lit(1)
    )
    version_side = (
        versions.select(key, version_ts, *payload_cols)
        .withColumn("_ats", F.col(version_ts))
        .withColumn("_side", F.lit(0))
        .withColumn("_payload", F.struct(*payload_cols))
        .drop(*payload_cols, version_ts)
    )
    unioned = probe_side.unionByName(version_side, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    result = filled.filter(F.col("_side") == 1)
    if how == "inner":
        result = result.filter(F.col("_match").isNotNull())
    return result.select(
        *out_cols, *[F.col(f"_match.{c}").alias(c) for c in payload_cols]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    band_width: int,
    keys: list[str] | None = None,
    max_bands_per_interval: int = 4096,
) -> DataFrame:
    """Range (interval) join — match each point to every interval with
    ``start <= point <= end`` (and equal ``keys``, if given) — as a
    BANDED EQUI-JOIN, the other temporal join Spark lacks as a builtin.

    A naive range join plans as BroadcastNestedLoopJoin (O(|points| x
    |intervals|) comparisons — the 100-TB killer). Banding restores a
    hash join: every interval explodes into the ``floor(t/band_width)``
    bands it overlaps (fan-out = length/band_width + 1, bounded below),
    every point carries its single band, the engine equi-joins on
    (keys, band) and the exact BETWEEN filter runs on the matched
    sliver. Each (interval, point) pair meets in EXACTLY one band — the
    point's — so no dedup pass is needed.

    ``band_width`` tunes the classic trade: wide bands replicate
    intervals less but match more non-overlapping pairs into the
    filter; size it near the TYPICAL interval length. Bounds are
    inclusive; columns must be integral (convert timestamps to epoch
    micros / dates to epoch days first — exact, engine-portable).

    Guard: one bounded aggregate over ``intervals`` checks the WIDEST
    interval's band fan-out against ``max_bands_per_interval`` and
    raises with sizing advice instead of silently detonating an explode
    (the _guard_brute_force discipline, operators/similarity.py).

    Inner semantics only: unmatched intervals/points drop (a banded
    left join would surface one null row per empty band — recover
    unmatched rows with an anti-join on the result if needed).

    Inverted intervals (end < start) match nothing — the BETWEEN filter
    is vacuously false — but note Spark's ``sequence`` steps DOWNWARD
    for them, so they still replicate across their |span| bands; drop
    them upstream if a corpus carries many.
    """
    if band_width < 1:
        raise ValueError("interval_join: band_width must be >= 1")
    from jobinsight_data_pipeline_spark.operators.sampling import (
        reserve_columns,
    )

    reserve_columns(points, ["_ij_band"], "interval_join")
    reserve_columns(intervals, ["_ij_band"], "interval_join")
    keys = keys or []
    widest = intervals.agg(
        F.max(F.col(end_col) - F.col(start_col)).alias("w")
    ).head()["w"]
    if widest is not None and widest // band_width + 1 > max_bands_per_interval:
        raise ValueError(
            f"interval_join: widest interval ({widest}) spans "
            f"{widest // band_width + 1} bands at band_width={band_width} "
            f"(cap {max_bands_per_interval}); raise band_width, or "
            f"max_bands_per_interval if the fan-out is intended"
        )
    iv = intervals.withColumn(
        "_ij_band",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / band_width).cast("long"),
                F.floor(F.col(end_col) / band_width).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_ij_band", F.floor(F.col(point_col) / band_width).cast("long")
    )
    matched = iv.join(pt, ["_ij_band", *keys]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return matched.drop("_ij_band")
