"""Deterministic sampling / dataset splitting for training-data prep.

PRNG-based sampling (``df.sample``/``sampleBy``) is seed-stable within
one engine but not reproducible across engines or data relayouts, and a
row's assignment changes when other rows move. Production splits hash
the KEY instead: ``bucket = md5(key) mod N`` — every engine agrees on
md5 of the same string, a row's split follows it through repartitions
and re-runs forever, and adding rows never reassigns existing ones.
(This is the same stable-split technique TFX/Beam pipelines use.)

The md5-hex prefix is used (not xxhash64) precisely so the assignment
is portable — the DuckDB oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5-hex chars of
    (salt || key) as an integer, mod buckets. Salt shifts the whole
    assignment — use a new salt for an independent re-split."""
    hexpfx = F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)
    return (F.conv(hexpfx, 16, 10).cast("long") % buckets).alias("bucket")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Attach a ``split`` column assigning each row to a named fraction
    (e.g. ``{"train": 0.8, "val": 0.1, "test": 0.1}``; must sum to 1).
    Pure projection — no shuffle, no state."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), 100, salt)
    expr: Column | None = None
    upper = 0.0
    names = list(splits.items())
    for name, frac in names[:-1]:
        upper += frac * 100
        cond = bucket < F.lit(int(round(upper)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs, engines, and appends (new keys don't disturb old picks)."""
    return df.filter(hash_bucket(F.col(key_col), 10_000, salt) < int(fraction * 10_000))


def stratified_sample_exact(
    df: DataFrame,
    stratum_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows from every stratum, deterministic:
    rank by md5(salt || key) within the stratum (key as tie-break) and
    keep the first N — the same engine-portable hash order as
    ``hash_bucket``, so the pick is reproducible across engines, runs,
    and relayouts, and re-salting draws an independent sample.

    One shuffle (the window's partitionBy). The per-stratum sort is
    bounded by stratum size; for mega-strata pre-thin with
    ``deterministic_sample`` (hash-stable, so the composition is still
    deterministic) before the exact rank.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*stratum_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= n_per_stratum)
        .drop("_srn")
    )
