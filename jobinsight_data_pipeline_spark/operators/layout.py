"""Data-layout optimization: Z-order (Morton) keys for multi-column
data skipping.

The 100-TB story: parquet/lakehouse readers prune row groups by
min/max statistics, but a table sorted by ONE column only skips on
that column — a filter on any other dimension scans everything.
Sorting by a Z-ORDER key (bit-interleave of the dimensions) keeps rows
that are close in ANY dimension close on disk, so min/max pruning
works for every interleaved column at once (the Delta/Databricks
OPTIMIZE ZORDER BY design, built here from first principles: Morton
1966). Everything is exact integer bit math — shifts, masks, one
1-row min/max broadcast for the quantizer — so a DuckDB oracle
replays every key bit-for-bit, and the layout decision is
deterministic on any engine or partitioning.

Usage shape::

    q = zorder_quantize(df, ["o_custkey", "o_epoch_day"], bits=16)
    keyed = q.withColumn("zkey", interleave_bits(["__q0", "__q1"], 16))
    keyed.repartitionByRange(N, "zkey").sortWithinPartitions("zkey")
         .write.parquet(...)   # min/max prunes on BOTH dims
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def interleave_bits(cols: list[str], bits: int = 16) -> Column:
    """The Morton key: bit b of input i lands at output position
    ``b * len(cols) + i`` (column 0 owns the LOW bit of each group, so
    earlier columns get finer interleaving). Inputs must already be
    non-negative ints < 2^bits (see :func:`zorder_quantize`); the key
    fits BIGINT while ``bits * len(cols) <= 63``. Pure shift/mask
    integer math — codegen'd in Spark, identical in any engine."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave_bits: need at least 2 columns")
    if bits * n > 63:
        raise ValueError(
            f"interleave_bits: {bits} bits x {n} cols overflows BIGINT"
        )
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"(shiftleft((shiftright(CAST({c} AS BIGINT), {b}) & 1L),"
                f" {b * n + i}))"
            )
    return F.expr(" + ".join(terms))


def zorder_quantize(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Rank-free min/max quantizer: each column maps to
    ``((x - min) * 2^bits) div (max - min + 1)`` — non-negative, under
    2^bits, exactly reproducible (integer division on the non-negative
    domain, where Spark's ``div`` and DuckDB's ``//`` agree). Appends
    ``__q<i>`` per input column; the stats side is ONE broadcast row
    (bytes, not data). NULLs quantize to bucket 0 (they sort together
    at the low end — the usual layout choice)."""
    if not cols:
        raise ValueError("zorder_quantize: need at least 1 column")
    stats = df.agg(
        *[
            a
            for i, c in enumerate(cols)
            for a in (
                F.min(F.col(c).cast("long")).alias(f"__mn{i}"),
                F.max(F.col(c).cast("long")).alias(f"__mx{i}"),
            )
        ]
    )
    out = df.crossJoin(broadcast(stats))
    for i, c in enumerate(cols):
        out = out.withColumn(
            f"__q{i}",
            F.expr(
                f"coalesce(((CAST({c} AS BIGINT) - __mn{i}) * {2 ** bits})"
                f" div (__mx{i} - __mn{i} + 1), 0L)"
            ),
        )
    return out.drop(
        *[f"__mn{i}" for i in range(len(cols))],
        *[f"__mx{i}" for i in range(len(cols))],
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Quantize + interleave in one call: appends ``zkey`` (BIGINT) and
    drops the quantizer scratch. Sort/range-partition by it before
    writing and min/max pruning works on every column in ``cols``."""
    q = zorder_quantize(df, cols, bits)
    out = q.withColumn(
        "zkey", interleave_bits([f"__q{i}" for i in range(len(cols))], bits)
    )
    return out.drop(*[f"__q{i}" for i in range(len(cols))])


def block_minmax(
    df: DataFrame, sort_col: str, dims: list[str], n_blocks: int = 64
) -> DataFrame:
    """The pruning audit: bucket rows into ``n_blocks`` contiguous
    blocks of the ``sort_col`` order (ntile without a global sort:
    rank-quantized like quality_deciles) and report each block's
    min/max per dimension — exactly the statistics a reader prunes
    against. A range predicate on dimension d touches the blocks whose
    [min_d, max_d] intersects it; counting those measures the layout's
    skipping power (see tests/test_operators.py's Z-order locality
    pin)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(sort_col).asc())
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    blocked = (
        df.withColumn("__r", F.row_number().over(w))
        .crossJoin(broadcast(total))
        .withColumn(
            "block", F.expr(f"((__r - 1) * {n_blocks}) div __n")
        )
    )
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"min_{d}"))
        aggs.append(F.max(d).alias(f"max_{d}"))
    return blocked.groupBy("block").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
