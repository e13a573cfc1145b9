"""Column profiling (data-quality summary): one pass over the table,
one output row per profiled column — row count, null count, exact
distinct count.

All metrics compute in a SINGLE aggregation (Catalyst plans the
count-distincts via expand + partial aggregation, so the table is
still scanned once); the per-column rows come from unpivoting the one
aggregate row with ``stack`` — no per-column scans, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Returns (column, n_rows, n_null, n_distinct) per requested column.
    n_distinct is exact and excludes NULL (count-distinct semantics in
    both Spark and ANSI SQL)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct")
