"""S10/S11/S13 — partitioned parquet export, restore, retention.

The reference loops ``COPY (SELECT … WHERE load_month=v) TO file`` per
distinct month (/root/reference/src/etl/partitioning.py:82-182); one
``partitionBy`` write replaces the whole loop. Restore uses dynamic
partition overwrite (only the partitions present in the restored frame
are replaced). Retention drops partition directories by name — partition
pruning means no data scan.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def export_partitioned(
    df: DataFrame, out_dir: str, partition_col: str = "load_month"
) -> None:
    """S10: one call exports every partition Hive-style
    (<out>/load_month=YYYY-MM/part-*.parquet)."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(out_dir)


def export_denormalized(
    fact: DataFrame,
    dim_job: DataFrame,
    dim_company: DataFrame,
    bridge: DataFrame,
    dim_location: DataFrame,
    out_dir: str,
) -> None:
    """J10: the reference's three export flavors (facts / +locations /
    analytics) as star joins + partitioned writes
    (ref src/etl/staging_to_dwh.py:652-796)."""
    jobs = broadcast(dim_job.filter(F.col("is_current")).select("job_sk", "job_id", "title_clean", "skills"))
    # fact rows already carry verified_employer; join only the name
    cos = broadcast(
        dim_company.filter(F.col("is_current")).select(
            "company_sk", "company_name_standardized"
        )
    )
    facts = fact.join(jobs, "job_sk").join(cos, "company_sk")
    export_partitioned(facts, f"{out_dir}/facts")

    locs = broadcast(dim_location.filter(F.col("is_current")))
    fact_locs = (
        fact.select("fact_id", "job_sk", "date_id", "load_month")
        .join(bridge, "fact_id")
        .join(locs.select("location_sk", "province", "city", "district"), "location_sk")
    )
    export_partitioned(fact_locs, f"{out_dir}/locations")

    analytics = (
        facts.groupBy("load_month", "company_name_standardized")
        .agg(
            F.countDistinct("job_sk").alias("job_count"),
            F.round(F.avg("salary_min"), 2).alias("avg_salary_min"),
            F.round(F.avg("salary_max"), 2).alias("avg_salary_max"),
        )
    )
    export_partitioned(analytics, f"{out_dir}/analytics")


def restore_partition(
    spark: SparkSession, export_dir: str, table_df: DataFrame, load_month: str
) -> DataFrame:
    """S11: replace one partition of a table from its export — dynamic
    partition overwrite semantics without mutating unrelated months.
    Returns the repaired full table (caller re-writes to the lake)."""
    restored = spark.read.parquet(export_dir).filter(
        F.col("load_month") == load_month
    )
    kept = table_df.filter(F.col("load_month") != load_month)
    return kept.unionByName(restored.select(table_df.columns))


def retention_partitions(
    export_dir: str, keep_months: int, as_of: dt.date
) -> list[str]:
    """S13: drop load_month=YYYY-MM partition dirs older than the window
    (ref src/etl/partitioning.py:244-341). Name arithmetic only."""
    cutoff = (as_of.replace(day=1) - dt.timedelta(days=keep_months * 31)).strftime(
        "%Y-%m"
    )
    removed: list[str] = []
    if not os.path.isdir(export_dir):
        return removed
    for entry in sorted(os.listdir(export_dir)):
        if not entry.startswith("load_month="):
            continue
        month = entry.split("=", 1)[1]
        if month < cutoff:
            shutil.rmtree(os.path.join(export_dir, entry), ignore_errors=True)
            removed.append(month)
    return removed
