"""Skew-handling join helpers.

AQE's skew-join splitting (on by default in the session factory) handles
most skew at runtime by splitting oversized partitions. These helpers
cover the cases AQE can't:

- ``salted_join``: explicit key salting for joins where one hot key
  dominates (the classic 'one company posts half the jobs' shape). The
  left (large, skewed) side gets a random-but-deterministic salt in
  [0, buckets); the right side is exploded ×buckets so every salted key
  finds its match. Equi-join semantics are preserved exactly.
- ``hot_keys``: find the keys worth salting (frequency above a
  threshold) — run on a sample at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame, keys: list[str], min_count: int = 1_000_000
) -> DataFrame:
    """Keys whose row count exceeds ``min_count`` — candidates for
    salting (at real scale run over ``df.sample(0.01)`` and scale the
    threshold)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select(*keys, "n")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``buckets``
    salt values. Deterministic: the salt is a hash of the full left row's
    key columns plus a per-row xxhash64 of all columns, modulo buckets —
    stable across retries (no rand()).

    Cost model: right side is replicated ×buckets — use only when the
    right side is small-to-medium and the left has true hot keys; for a
    broadcastable right side just use broadcast().
    """
    salt_basis = [F.col(c) for c in left.columns]
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_basis), F.lit(buckets))
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast(l_salted.schema["_salt"].dataType))
    joined = l_salted.join(r_salted, keys + ["_salt"], how)
    return joined.drop("_salt")


#: hard cap on the isolated hot-key list — it is driver-collected and
#: broadcast, so it must stay bounded by construction
MAX_ISOLATED_HOT_KEYS = 10_000


def skew_isolated_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    min_count: int = 1_000_000,
    sample_fraction: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """The OTHER classic skew strategy: isolate the hot keys instead of
    salting everything. Hot keys (detected with :func:`hot_keys`, on a
    sample when ``sample_fraction`` is set — always sample at real
    scale) are driver-collected (bounded: > ``MAX_ISOLATED_HOT_KEYS``
    raises — a "hot list" that big means the threshold is wrong), the
    right side's matching sliver broadcasts, and only the cold majority
    takes the shuffle join. Unlike :func:`salted_join` the right side is
    never replicated ×buckets, so it works with arbitrarily large right
    sides; unlike AQE's skew split it also fixes the single-key
    build-side explosion AQE cannot (AQE splits the probe side only).

    ``how`` supports inner/left (the hot/cold split of the LEFT side is
    exhaustive, so the union re-assembles exactly). Falls back to the
    plain join when no key crosses the threshold.

    When ``sample_fraction`` is set, the detection threshold is scaled
    to the sample (``max(1, ceil(min_count * sample_fraction))``) so a
    key must exceed its *expected sampled* count, not the full-scale
    count, and the sample is seeded — plan choice is deterministic
    across runs. Join RESULTS are identical either way; only which
    physical strategy handles each key can differ.
    """
    import math

    if how not in ("inner", "left"):
        raise ValueError(f"skew_isolated_join supports inner/left, got {how!r}")
    if sample_fraction:
        src = left.sample(fraction=sample_fraction, seed=42)
        threshold = max(1, math.ceil(min_count * sample_fraction))
    else:
        src = left
        threshold = min_count
    hot = hot_keys(src, keys, threshold).select(*keys)
    hot_rows = hot.limit(MAX_ISOLATED_HOT_KEYS + 1).collect()
    if len(hot_rows) > MAX_ISOLATED_HOT_KEYS:
        raise ValueError(
            f"skew_isolated_join: > {MAX_ISOLATED_HOT_KEYS} hot keys at "
            f"min_count={min_count}; raise the threshold (a list that big "
            "is not 'hot keys', it is the data)"
        )
    if not hot_rows:
        return left.join(right, keys, how)
    spark = left.sparkSession
    marks = F.broadcast(spark.createDataFrame(hot_rows, hot.schema))
    left_hot = left.join(marks, keys, "left_semi")
    left_cold = left.join(marks, keys, "left_anti")
    right_hot = right.join(marks, keys, "left_semi")
    part_hot = left_hot.join(F.broadcast(right_hot), keys, how)
    part_cold = left_cold.join(right, keys, how)
    return part_hot.unionByName(part_cold)


def skew_audit(
    df: DataFrame,
    keys: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Join-key skew report — the DETECTION side of this module's
    mitigation strategies: the ``top_k`` hottest key values with their
    row counts, integer-ppm share of the table, and the multiple of a
    perfectly-uniform key's load (``x_uniform``, in ppm of the mean).
    A key whose share approaches a task's fraction of the data is the
    one that stalls a shuffle stage; feed it to ``salted_join`` /
    ``skew_isolated_join`` (or trust AQE's splitting when the skew is
    mild).

    One partial-aggregating groupBy + a heap top-k
    (TakeOrderedAndProject) — the per-key table crosses the shuffle, the
    row table never does. Totals and per-key counts come from the SAME
    per-key aggregate (total = Σn, n_keys = its row count), re-attached
    as a broadcast 1-row stats frame (the unigram_lm pattern): one
    evaluation of the input — no separate count()/distinct().count()
    scans, and no stale-total risk against a non-deterministic or
    re-evaluated source. Exact integer arithmetic throughout; ties
    break on the key columns ascending so the cut is deterministic."""
    per = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = per.agg(
        F.greatest(F.sum("n"), F.lit(1)).alias("_total"),
        F.greatest(F.count(F.lit(1)), F.lit(1)).alias("_nkeys"),
    )
    return (
        per.orderBy(F.desc("n"), *[F.asc(k) for k in keys])
        .limit(int(top_k))
        .crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "n",
            F.expr("(n * 1000000) div _total").alias("share_ppm"),
            # load multiple vs a uniform key, in ppm: n / (total/n_keys)
            F.expr("(n * _nkeys * 1000000) div _total").alias(
                "x_uniform_ppm"
            ),
        )
    )
