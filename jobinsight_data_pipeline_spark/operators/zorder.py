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


def zorder_quantize(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Min/max linear quantizer for :func:`zorder_key` inputs whose raw
    domain is NOT already under ``2**bits``: each column maps to
    ``((x - min) * 2^bits) div (max - min + 1)`` — non-negative, under
    2^bits, exactly reproducible (integer division on the non-negative
    domain, where Spark's ``div`` and DuckDB's ``//`` agree). Appends
    ``__q<i>`` per input column; the stats side is ONE broadcast row
    (bytes, not data). NULLs quantize to bucket 0 (they sort together
    at the low end — the usual layout choice).

    Domain bound: columns whose range exceeds ``2^(62-bits)`` are
    pre-shifted right (power-of-two coarsening) before the multiply so
    the BIGINT product never overflows under Spark 4 ANSI mode — the
    quantizer is total for any range under ``2^63`` (beyond that the
    ``max - min`` subtraction itself overflows int64; split such a
    domain upstream). For ranges under the bound the shift is 0 and
    the formula is byte-identical to the plain form."""
    from pyspark.sql.functions import broadcast

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
        # pre-shift wide domains so (range >> s) * 2^bits stays under
        # 2^62 (ANSI mode throws on BIGINT overflow). The bit position
        # L = floor(log2(range)) is derived EXACTLY: the double log2
        # ESTIMATE can err ±1 near powers of two (r11 ADVICE — an
        # overestimate just below 2^k would set shift=1 where the
        # plain formula still fits, silently breaking the documented
        # byte-identity with the plain-form oracles), so it is clamped
        # by integer shiftright tests: est is exact iff
        # range >> est ≥ 1 and range >> (est+1) = 0. With exact L,
        # s = max(0, L + bits − 61) and the s = 0 boundary is exact on
        # both engines (range < 2^(L+1) ⇒ range >> s < 2^(62−bits)).
        rng = f"(__mx{i} - __mn{i})"
        # capped at 62: JVM shiftright takes counts mod 64, so est+1
        # must stay < 64; for L = 62 (the int64 ceiling) the capped
        # test chain still lands exactly
        est = (
            f"least(CAST(floor(log2(CAST({rng} AS DOUBLE) + 1.0d))"
            f" AS INT), 62)"
        )
        exact_l = (
            f"(CASE WHEN {rng} <= 0 THEN 0"
            f" WHEN shiftright({rng}, {est}) = 0 THEN {est} - 1"
            f" WHEN shiftright({rng}, {est} + 1) > 0 THEN {est} + 1"
            f" ELSE {est} END)"
        )
        shift = f"greatest(0, {exact_l} + {bits} - 61)"
        out = out.withColumn(
            f"__q{i}",
            F.expr(
                f"coalesce((shiftright(CAST({c} AS BIGINT) - __mn{i},"
                f" {shift}) * {2 ** bits})"
                f" div (shiftright(__mx{i} - __mn{i}, {shift}) + 1), 0L)"
            ),
        )
    return out.drop(
        *[f"__mn{i}" for i in range(len(cols))],
        *[f"__mx{i}" for i in range(len(cols))],
    )


def zorder_key_quantized(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Quantize + interleave in one call: appends ``zkey`` (BIGINT) and
    drops the quantizer scratch — :func:`zorder_key` for arbitrary
    integer domains. Sort/range-partition by ``zkey`` before writing
    and min/max pruning works on every column in ``cols``."""
    q = zorder_quantize(df, cols, bits)
    out = q.withColumn(
        "zkey", zorder_key([f"__q{i}" for i in range(len(cols))], bits)
    )
    return out.drop(*[f"__q{i}" for i in range(len(cols))])


def block_minmax(
    df: DataFrame, sort_col: str, dims: list[str], n_blocks: int = 64
) -> DataFrame:
    """The pruning audit: bucket rows into ``n_blocks`` contiguous
    blocks of the ``sort_col`` order and report each block's min/max
    per dimension — exactly the statistics a reader prunes against. A
    range predicate on dimension d touches the blocks whose
    [min_d, max_d] intersects it; counting those measures the layout's
    skipping power (the Z-order locality pin in
    tests/test_operators.py)."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    w = Window.orderBy(F.col(sort_col).asc())
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    blocked = (
        df.withColumn("__r", F.row_number().over(w))
        .crossJoin(broadcast(total))
        .withColumn("block", F.expr(f"((__r - 1) * {n_blocks}) div __n"))
    )
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"min_{d}"))
        aggs.append(F.max(d).alias(f"max_{d}"))
    return blocked.groupBy("block").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )
