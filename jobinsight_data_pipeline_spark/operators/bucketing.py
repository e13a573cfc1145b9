"""Bucketed-table co-located joins.

At 100 TB the fact⋈dim and fact⋈bridge joins repeat every run; bucketing
both sides on the join key at write time removes the shuffle from every
subsequent join (Spark reads bucket files pre-partitioned, so the
sort-merge join plans with zero Exchange). This module wraps the
``bucketBy`` writer + catalog round-trip and exposes a plan check.

The parquet-lake tables stay the default (bucketing requires a catalog
table); use this for the hot star-join tables on a deployment with a
real metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan contains a join but no Exchange —
    the signature of a co-located bucketed join."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return ("Join" in plan) and ("Exchange" not in plan)
