"""Mergeable-sketch audit operators (the Apache DataSketches SQL
surface shipped with Spark 4.1: theta_sketch_agg / theta_union /
theta_intersection / theta_difference / theta_sketch_estimate).

The 100-TB story: a theta sketch is a FIXED-SIZE, MERGEABLE summary of
a key set — per-shard sketches aggregate map-side, merge across
datasets, and answer |A|, |B|, |A∪B|, |A∩B|, |A\\B| WITHOUT ever
joining or shuffling the raw keys. That is exactly the shape of the
recurring corpus-audit questions (how much does the new crawl overlap
the old one? how many users appear in both event streams? how much of
the eval set leaked into training?) whose exact answers need a
distinct-join over every key. Below the sketch's nominal entry count
(default 2^12) estimates are EXACT; above it the published relative
error is ~1/sqrt(k). Sketching uses a fixed hash seed — estimates are
deterministic for the same input on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def theta_sketch(df: DataFrame, key_col: str, lg_nom_entries: int = 12) -> DataFrame:
    """One-row frame holding the theta sketch of ``key_col`` — the
    per-dataset summary artifact callers persist beside a corpus and
    merge later (sketches are tiny: <= 8 bytes x 2^lg_nom_entries)."""
    return df.agg(
        F.expr(
            f"theta_sketch_agg(`{key_col}`, {int(lg_nom_entries)})"
        ).alias("sketch")
    )


def theta_overlap(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    lg_nom_entries: int = 12,
) -> DataFrame:
    """Set-cardinality audit between two key sets, entirely via
    sketches: one row of (est_a, est_b, est_union, est_intersect,
    est_diff) BIGINT estimates (A\\B for the difference). Each side
    aggregates to ONE sketch row (map-side partials, no key shuffle);
    the combine is a 1-row x 1-row broadcast join — bytes, not data."""
    sa = theta_sketch(a, key_col, lg_nom_entries).withColumnRenamed(
        "sketch", "_sa"
    )
    sb = theta_sketch(b, key_col, lg_nom_entries).withColumnRenamed(
        "sketch", "_sb"
    )
    return sa.crossJoin(broadcast(sb)).selectExpr(
        "CAST(theta_sketch_estimate(_sa) AS BIGINT) AS est_a",
        "CAST(theta_sketch_estimate(_sb) AS BIGINT) AS est_b",
        "CAST(theta_sketch_estimate(theta_union(_sa, _sb)) AS BIGINT)"
        " AS est_union",
        "CAST(theta_sketch_estimate(theta_intersection(_sa, _sb))"
        " AS BIGINT) AS est_intersect",
        "CAST(theta_sketch_estimate(theta_difference(_sa, _sb))"
        " AS BIGINT) AS est_diff",
    )


#: cms_estimate broadcasts the sketch table — depth*width rows; keep the
#: product inside comfortable broadcast range
CMS_MAX_CELLS = 4_000_000


def _cms_bucket(j: F.Column, key: F.Column, width: int, salt: str) -> F.Column:
    """Row-``j`` bucket for ``key``: first 8 md5-hex chars of
    ``j:salt:key`` as an integer mod ``width`` — the engine-portable
    hash family (the ``hash_bucket`` idiom; a DuckDB oracle reproduces
    it bit-for-bit, and it is deterministic on any partitioning)."""
    payload = F.concat_ws(":", j.cast("string"), F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast(
        "long"
    ) % F.lit(int(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key STREAM:
    a ``(row_idx, bucket, cnt)`` table of at most ``depth*width`` rows.

    The 100-TB story mirrors the theta sketch above, but for FREQUENCY
    instead of cardinality: the input keys are never shuffled — each
    occurrence fans out to its ``depth`` (row, bucket) cells and the
    groupBy partial-aggregates map-side, so every task emits at most
    ``depth*width`` rows regardless of input size, and sketches of
    shards/days MERGE by adding cells (the same groupBy-sum). Point
    estimates (``cms_estimate``) are upper bounds: never below the true
    count, above it only by hash-collision mass (ε ≈ e/width of the
    stream, δ ≈ e^-depth). Exact top-k (`textstats.top_ngrams`) keeps
    per-key truth; the sketch answers the same question in fixed space
    when the key universe itself doesn't fit.

    ``weight_col`` builds the SAME sketch from a pre-aggregated
    ``(key, count)`` table — cells sum the weights instead of counting
    rows, so ``cms_build(counts, k, weight_col=c)`` is cell-for-cell
    identical to ``cms_build(stream, k)`` when ``counts`` is the
    stream's key histogram. Callers that already pay the key-grain
    aggregation (the heavy-hitter audit computes exact counts anyway)
    hash ``depth`` md5s per DISTINCT key instead of per occurrence."""
    if depth * width > CMS_MAX_CELLS:
        raise ValueError(f"sketch too large to broadcast: {depth}x{width}")
    cols = [
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"),
        F.col(key_col).alias("_k"),
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    ev = df.select(*cols)
    return (
        ev.groupBy(
            F.col("_j").alias("row_idx"),
            _cms_bucket(F.col("_j"), F.col("_k"), width, salt).alias("bucket"),
        )
        .agg(
            (
                F.count(F.lit(1))
                if weight_col is None
                else F.sum("_w")
            ).alias("cnt")
        )
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Point-estimate ``key_col`` of ``keys`` against a ``cms_build``
    sketch (built with the SAME depth/width/salt): min over the key's
    ``depth`` cells, absent cells counting 0. The sketch side is a
    ≤ depth×width-row broadcast — the probe is one equi-join, so a
    billion-key probe frame stays distributed.

    Parameter-mismatch guard: absent cells legitimately coalesce to 0
    (a bucket nothing hashed into), so probing with a depth/width that
    differs from what ``cms_build`` used would SILENTLY return
    underestimates — violating the CMS upper-bound contract. The
    sketch's observed shape (1-row aggregate, broadcast alongside the
    cells) is therefore checked against the probe parameters inside the
    estimate expression: depth drift in either direction (sketch rows ≠
    0..depth−1) and a probe width NARROWER than the built width (a
    sketch bucket ≥ width) raise instead of returning a plausible low
    count. A salt mismatch or a WIDER probe width is structurally
    undetectable from the cells (same shape, different hashing) —
    callers own those two; persist the build parameters beside the
    sketch (the stats-beside-codes discipline of build_sq8_index)."""
    probes = keys.select(F.col(key_col)).distinct()
    ev = probes.select(
        key_col,
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"),
    ).select(
        key_col,
        F.col("_j").alias("row_idx"),
        _cms_bucket(F.col("_j"), F.col(key_col), width, salt).alias("bucket"),
    )
    shape = cms.agg(
        F.max("row_idx").alias("_max_row"),
        F.min("row_idx").alias("_min_row"),
        F.max("bucket").alias("_max_bucket"),
    )
    mismatch = (
        (F.col("_max_row") != F.lit(depth - 1))
        | (F.col("_min_row") != F.lit(0))
        | (F.col("_max_bucket") >= F.lit(int(width)))
    )
    guarded = F.when(
        mismatch,
        F.raise_error(
            F.concat(
                F.lit(
                    "cms_estimate parameter mismatch: sketch shape "
                    "(rows 0.."
                ),
                F.col("_max_row").cast("string"),
                F.lit(", max bucket "),
                F.col("_max_bucket").cast("string"),
                F.lit(f") vs probe depth={depth} width={width}"),
            )
        ).cast("long"),
    ).otherwise(F.col("_cnt0"))
    return (
        ev.join(broadcast(cms), ["row_idx", "bucket"], "left")
        .crossJoin(broadcast(shape))
        .withColumn("_cnt0", F.coalesce("cnt", F.lit(0)))
        .groupBy(key_col)
        .agg(F.min(guarded).alias("cms_cnt"))
    )


def _hll_rho(w: F.Column) -> F.Column:
    """Position of the leftmost 1-bit in a 32-bit value (1-based), 33
    for w = 0 — via ``33 - length(bin(w))``: both Spark and DuckDB
    render ``bin`` as the MINIMAL binary string (verified, incl. BIGINT
    inputs), so the expression is engine-portable integer math with no
    float log2 anywhere."""
    return F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    ).cast("long")


def hll_registers(
    df: DataFrame,
    key_col: str,
    buckets: int = 64,
    salt: str = "hll:",
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) of a key
    stream: ``(bucket, register)`` with at most ``buckets`` rows,
    register = max over the bucket's keys of the leftmost-1-bit
    position of a 32-bit sub-hash.

    The MAX-merged state shape (the sixth, beside sum-merged counts/
    Gram/CMS/DSIR, min-merged first-seen, struct-merged OHLC):
    registers of shards/days/streams merge by per-bucket MAX — max
    commutes, is idempotent, AND absorbs replays, so merged state is
    bit-identical to a single-pass build on any partitioning or batch
    order (the strongest replay story of the six: even double-counting
    a whole batch is harmless). The groupBy partial-aggregates
    map-side, so every task emits ≤ ``buckets`` rows regardless of
    input size — cardinality maintenance for a continuously-ingested
    corpus without rescanning history or shuffling keys.

    Hashing is the engine-portable md5 split: bucket from hex chars
    1-8, the 32-bit value w from chars 9-16 — independent bits, and a
    DuckDB oracle reproduces both exactly. Cardinality ESTIMATION from
    the registers (:func:`hll_estimate_py`) is a driver-side float
    convenience over this exact integer table."""
    if buckets < 1:
        raise ValueError("hll_registers: buckets must be >= 1")
    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(
        int(buckets)
    )
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # per-row md5 is CPU-dense scan work: project to the key FIRST
    # (guide §2.3 — only the key crosses the exchange), then widen so a
    # single-split input doesn't serialize the hashing (no-op when the
    # scan already has ≥ cores splits; registers still partial-agg
    # map-side to ≤ buckets rows per task)
    base = widen_for_cpu(
        df.where(F.col(key_col).isNotNull()).select(F.col(key_col))
    )
    return (
        base.select(bucket.alias("bucket"), _hll_rho(w).alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_merge(states: DataFrame) -> DataFrame:
    """Merge any union of register tables (shards, days, streamed
    batch partitions) into one: per-bucket MAX."""
    return states.groupBy("bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate_py(
    registers: dict[int, int], buckets: int = 64
) -> float:
    """The standard HLL estimator over a collected register dict
    (absent buckets count as register 0): bias-corrected harmonic mean
    with the small-range linear-counting correction. Driver-side float
    convenience — the GATE surface is the exact integer register
    table; accuracy (~1.04/√m) is pinned by pytest against exact
    distinct counts, not by the cross-engine hash."""
    import math

    m = buckets
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 64 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.7213 / (1 + 1.079 / m)
    )
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for b in range(m) if registers.get(b, 0) == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def hll_alpha_micro(buckets: int) -> int:
    """The HLL bias-correction constant α(m) in floor-micro-units —
    computed ONCE host-side so both engines consume the same integer
    (the ndcg_discounts_micro trick; no float constant drifts between
    engines)."""
    m = buckets
    alpha = (
        0.673 if m == 16 else 0.697 if m == 32
        else 0.7213 / (1 + 1.079 / m)
    )
    return int(alpha * 10**6)


def hll_linear_micro(buckets: int) -> list[int]:
    """Host-literal linear-counting table: ``floor(m·ln(m/z)·10⁶)`` for
    z = 1..m empty buckets. ln runs ONCE on the host and the SAME
    integers inline into both engines — the 1-ulp engine-ln wobble
    class is designed out (CLAUDE.md)."""
    import math

    m = buckets
    return [int(math.floor(m * math.log(m / z) * 10**6)) for z in
            range(1, m + 1)]


def hll_estimate_micro(
    registers: DataFrame, buckets: int = 64
) -> DataFrame:
    """The HLL cardinality ESTIMATE as an exact engine-side expression
    over the register table — the number users actually read, under
    the oracle (the r10 verdict's order; :func:`hll_estimate_py` stays
    as the float reference pinned by pytest).

    All float hazards are designed out: the harmonic-mean denominator
    ``Σ 2^−register`` is scaled by 2^33 into the exact BIGINT
    ``S = zeros·2³³ + Σ 2^(33−register)`` (registers are ≤ 33 by
    construction, ≤ m terms — no overflow); the numerator
    ``α·m²·2³³·10⁶``... (micro-units folded into α) is ONE host-exact
    double literal (α_micro·m² needs < 32 mantissa bits, ×2³³ is an
    exponent shift); the bias-corrected estimate is one correctly-
    rounded double division + floor, identical on any IEEE engine; and
    the small-range linear-counting branch reads a host-literal
    ``m·ln(m/zeros)`` micro-unit table indexed by the integer zero
    count. Returns ONE row: (n_buckets, present, zeros, s_scaled,
    est_micro)."""
    m = int(buckets)
    pow33 = 1 << 33
    n_lit = repr(float(hll_alpha_micro(m) * m * m * pow33))
    lc = hll_linear_micro(m)
    lc_lit = "array(" + ",".join(f"{v}L" for v in lc) + ")"
    lin_cut = 2_500_000 * m  # 2.5·m in micro-units, exact
    agg = registers.agg(
        F.count(F.lit(1)).alias("present"),
        F.coalesce(
            F.sum(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    " CAST(33 - register AS INT))"
                )
            ),
            F.lit(0).cast("long"),
        ).alias("sum_pow"),
    )
    return agg.select(
        F.lit(m).cast("long").alias("n_buckets"),
        F.col("present").cast("long").alias("present"),
        (F.lit(m) - F.col("present")).cast("long").alias("zeros"),
        F.expr(f"({m}L - present) * {pow33}L + sum_pow").alias("s_scaled"),
        F.expr(
            f"CASE WHEN CAST(floor({n_lit} / CAST(({m}L - present)"
            f" * {pow33}L + sum_pow AS DOUBLE)) AS BIGINT)"
            f" <= {lin_cut}L AND {m}L - present > 0"
            f" THEN element_at({lc_lit}, CAST({m} - present AS INT))"
            f" ELSE CAST(floor({n_lit} / CAST(({m}L - present)"
            f" * {pow33}L + sum_pow AS DOUBLE)) AS BIGINT) END"
        ).alias("est_micro"),
    )


def hll_registers_by(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    buckets: int = 64,
    salt: str = "hll:",
) -> DataFrame:
    """Per-GROUP HLL register tables — :func:`hll_registers` with the
    group key carried through: ≤ ``buckets`` rows per group, the shape
    of a cardinality dashboard (distinct users per event type, distinct
    docs per source/day) maintained incrementally at any scale. Same
    MAX-merge contract; partial max runs map-side so the shuffle
    payload is ≤ groups × buckets rows regardless of input size."""
    if buckets < 1:
        raise ValueError("hll_registers_by: buckets must be >= 1")
    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(
        int(buckets)
    )
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # same project-then-widen as hll_registers: only (group, key)
    # cross the widening exchange, hashing parallelizes on single-split
    # inputs, map-side partial max keeps the real shuffle model-sized
    base = widen_for_cpu(
        df.where(F.col(key_col).isNotNull()).select(*group_cols, key_col)
    )
    return (
        base.select(
            *group_cols,
            bucket.alias("bucket"),
            _hll_rho(w).alias("_rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def histogram_state(
    df: DataFrame,
    value_col: str = "value",
    group_col: str | list[str] = "event_type",
    lo: float = 0.0,
    hi: float = 1024.0,
    buckets: int = 256,
) -> DataFrame:
    """Fixed-grid integer histogram state — the SUM-mergeable QUANTILE
    sketch (the eighth mergeable-state shape): ``bucket =
    clamp(floor((v − lo)·K/(hi − lo)))`` counts per (group(s), bucket),
    at most ``groups × K`` rows regardless of input size. The grid is
    fixed a priori (a streaming histogram cannot rescale after the
    fact); out-of-range values clamp into the edge buckets, which
    preserves total mass so cumulative RANKS stay exact. Shards, days,
    and micro-batches merge by cell-wise SUM
    (:func:`histogram_merge`) exactly like :func:`cms_build` cells —
    this is the state behind doc-length/quality percentile monitoring
    on an unbounded corpus, where exact percentiles
    (`event_percentiles`) need a full re-sort of history per day.
    Engine-exact: the bucket function is one floor of doubles both
    engines compute identically, counts are integers."""
    width = hi - lo
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    b = F.expr(
        f"CAST(least({buckets - 1}, greatest(0, "
        f"floor((CAST({value_col} AS DOUBLE) - {lo!r}) * {buckets}"
        f" / {width!r}))) AS INT)"
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*[F.col(g) for g in gcols], b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(
    states: DataFrame, group_col: str | list[str] = "event_type"
) -> DataFrame:
    """Merge histogram states (shards / days / stream batches):
    cell-wise SUM — commutative and associative, so batch order is
    irrelevant and shard-merge ≡ single-shot exactly (pinned by
    test)."""
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    return states.groupBy(*gcols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantiles(
    state: DataFrame,
    qs_pct: tuple = (50, 90, 99),
    group_col: str | list[str] = "event_type",
    lo: float = 0.0,
    hi: float = 1024.0,
    buckets: int = 256,
) -> DataFrame:
    """Quantile extraction from a (merged) histogram state: the
    q-quantile BUCKET is the first bucket whose cumulative count
    reaches ``rank = ceil(q·n)`` — exactly the bucket containing the
    type-1 (ceil-rank) order statistic, so the histogram answer equals
    the EXACT quantile quantized to the grid (bucketing is monotone in
    v; pinned by test against Spark's exact ``percentile``). All
    integer arithmetic: ``q_rank = (n·q + 99) div 100``; bucket edges
    emitted in exact micro-units (the grid step must divide into
    microns evenly — asserted). State is groups × K rows, so the
    window cumsum is model-sized, never data-sized."""
    from pyspark.sql import Window

    step_micro = round((hi - lo) * 1_000_000) // buckets
    if step_micro * buckets != round((hi - lo) * 1_000_000):
        raise ValueError(
            f"grid step not exact in micro-units: ({hi}-{lo})/{buckets}"
        )
    lo_micro = round(lo * 1_000_000)
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    w = (
        Window.partitionBy(*gcols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = state.select(
        *gcols, "bucket", F.sum("cnt").over(w).alias("cum")
    )
    tot = state.groupBy(*gcols).agg(F.sum("cnt").alias("n"))
    ranks = tot.select(
        *gcols,
        "n",
        F.explode(
            F.array(*[F.lit(int(q)) for q in qs_pct])
        ).alias("q_pct"),
    ).withColumn("q_rank", F.expr("(n * q_pct + 99) div 100"))
    return (
        ranks.join(cum, gcols)
        .where(F.col("cum") >= F.col("q_rank"))
        .groupBy(*gcols, "q_pct", "n", "q_rank")
        .agg(F.min("bucket").alias("bucket"))
        .select(
            *gcols,
            "q_pct",
            "n",
            "q_rank",
            "bucket",
            F.expr(f"{lo_micro}L + bucket * {step_micro}L").alias(
                "lo_edge_micro"
            ),
            F.expr(
                f"{lo_micro}L + (bucket + 1) * {step_micro}L"
            ).alias("hi_edge_micro"),
        )
    )
