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
