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
