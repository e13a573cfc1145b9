"""Set-based upsert primitives over plain Parquet tables.

The reference implements upserts row-at-a-time or via staged SQL MERGE
(``INSERT ... ON CONFLICT`` — /root/reference/src/db/bulk_operations.py:174-269,
/root/reference/sql/insert_raw_to_staging.sql:37). Without a transactional
table format, the Spark-native equivalent is anti-join + union, rewritten
atomically by the caller (write to temp dir, swap). All operators here are
pure DataFrame→DataFrame; no driver-side iteration.

Scale notes (100 TB posture):
- ``upsert_by_key`` shuffles both sides on the key — on a real deployment
  partition/bucket the base table by the same key so AQE can plan a
  shuffle-free merge; incoming batches are typically small → broadcast.
- surrogate-key assignment uses max()+row_number over the *incoming batch
  only* (dims/facts grow by small daily deltas), never a global resort of
  the base table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def null_safe_cond(left: DataFrame, right: DataFrame, keys: list[str]) -> Column:
    """AND-fold of null-safe equality (<=>) over ``keys`` — required for
    composite natural keys with nullable parts (DimLocation: province and
    district are nullable — ref src/etl/dimension_handler.py:290-299)."""
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    assert cond is not None
    return cond


def dedupe_last_write(
    df: DataFrame, keys: list[str], order_col: str | None = None
) -> DataFrame:
    """Keep one row per key. The reference processes batches sequentially,
    so a key occurring twice takes the LAST write (SURVEY §7.3); with an
    ``order_col`` we keep the max-order row deterministically, otherwise
    an arbitrary row (dropDuplicates)."""
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc_nulls_last(),
        # deterministic tie-break so reruns pick the same survivor
        F.monotonically_increasing_id().desc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_by_key(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """S5 semantics: ``INSERT ... ON CONFLICT (keys) DO UPDATE`` — incoming
    rows win wholesale; existing rows without a matching key survive.
    Columns are aligned by name (unionByName)."""
    incoming = dedupe_last_write(incoming, keys, order_col)
    if existing is None:
        return incoming
    kept = existing.join(incoming.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(incoming.select(existing.columns))


def insert_if_absent(
    existing: DataFrame | None, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """S6/J6 semantics: ``ON CONFLICT DO NOTHING`` — only keys not already
    present are appended; existing rows keep their values."""
    incoming = incoming.dropDuplicates(keys)
    if existing is None:
        return incoming
    fresh = incoming.join(existing.select(*keys), on=keys, how="left_anti")
    return existing.unionByName(fresh.select(existing.columns))


def assign_surrogate_keys(
    df: DataFrame,
    sk_col: str,
    existing_max: int,
    order_by: list[str],
    scalable: bool | None = None,
) -> DataFrame:
    """SC5: dense surrogate keys without a sequence object —
    ``existing_max + row_number() over (order by natural key)``.

    The naive form is a single-partition sort of the new rows — fine for
    daily deltas, a straggler for bulk/initial loads. The scalable form
    (default whenever the session has parallelism) produces IDENTICAL
    keys with no global sort:

    1. ``repartitionByRange`` on the natural key — partition i holds
       strictly earlier keys than partition i+1;
    2. ``row_number`` within each range partition (parallel sorts);
    3. global position = local rank + the cumulative row count of the
       earlier partitions — a window over ≤ numPartitions rows.

    Keys are reproducible when ``order_by`` is unique per row (true for
    every caller: dims key on the deduped natural key, facts on the
    grain). The reference seeds sequences at 10000
    (sql/schema_dwh.sql:3-6); callers pass ``existing_max=9999`` for an
    empty table to match.

    ``scalable`` defaults to False because the two-phase form is only
    safe when the result is consumed ONCE (or materialized first): a
    multi-consumer plan re-executes the subtree per branch, and the
    range-sample + spark_partition_id assignment is not guaranteed
    identical across re-evaluations (same hazard class as
    monotonically_increasing_id mid-plan — measured: composite gate
    joins fan out on mismatched keys). The lake pipeline writes each
    keyed table before reuse, so it opts in for bulk-load parallelism.
    """
    cols = [F.col(c).asc_nulls_last() for c in order_by]
    if scalable is None:
        scalable = False
    if not scalable:
        w = Window.orderBy(*cols)
        return df.withColumn(
            sk_col, (F.row_number().over(w) + F.lit(existing_max)).cast("long")
        )
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*cols))
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    prior = (
        Window.partitionBy(F.lit(0))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(prior), F.lit(0)))
    return (
        local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .withColumn(
            sk_col,
            (F.col("_lrn") + F.col("_off") + F.lit(existing_max)).cast("long"),
        )
        .drop("_pid", "_lrn", "_off")
    )


SEQUENCE_START = 10_000  # reference sequences start at 10000


def max_key(df: DataFrame | None, sk_col: str, default: int = SEQUENCE_START - 1) -> int:
    """Current max surrogate key (driver-side scalar; an O(1) agg)."""
    if df is None:
        return default
    row = df.agg(F.max(sk_col).alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else default
