"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

Sorting a table by one column makes parquet min/max row-group stats
selective for THAT column only; range queries on a second dimension scan
everything. Interleaving the bits of several normalized key columns into
one Morton code and sorting by it gives every participating dimension
locality — the layout technique Delta OPTIMIZE ZORDER / Iceberg sort
orders use for multi-column data skipping. Pure integer Column
arithmetic: deterministic, engine-portable (the DuckDB oracle reproduces
keys bit-for-bit), no UDFs.

``zorder_key`` expects inputs already normalized to unsigned ints below
``2**bits`` (rank/scale first — a quantile rank or a fixed linear scale;
normalization choice is the caller's because it is data-dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column into one LONG.

    Column i contributes its bit b at output position ``b*len(cols)+i``
    — the classic Z-curve. ``len(cols)*bits`` must fit in 63 bits.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for i, c in enumerate(cs):
        v = c.cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("long")
    return key


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Range-repartition + sort by the Morton key — the write-side layout
    step (feed the result to a parquet writer; each output file then
    holds a compact Z-curve segment and min/max stats prune on every
    participating column)."""
    key = zorder_key(cols, bits).alias("_zkey")
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
