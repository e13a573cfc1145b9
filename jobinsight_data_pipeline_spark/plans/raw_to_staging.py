"""Phase 2 — raw → staging as ONE declarative projection.

The reference splits this phase across two engines: set-based SQL UPDATEs
in PostgreSQL (salary, due_date, time_remaining —
/root/reference/src/etl/raw_to_staging.py:189-243) followed by a pandas
column pipeline (locations, title, company —
/root/reference/src/etl/raw_to_staging.py:353-385). That split exists only
because of the two-engine design; in Spark it collapses into a single
narrow projection that Catalyst fuses into one codegen stage — no shuffle
at all, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.functions.dates import (
    due_date_from_deadline,
    time_remaining,
)
from jobinsight_data_pipeline_spark.functions.location import (
    extract_location_info,
    refine_location,
)
from jobinsight_data_pipeline_spark.functions.salary import with_salary_columns
from jobinsight_data_pipeline_spark.functions.text import (
    clean_company_name_udf,
    clean_title,
)


def raw_to_staging(raw: DataFrame, as_of: dt.datetime) -> DataFrame:
    """Derive all staging columns from a raw_jobs batch.

    Order mirrors the reference: location_pairs from the HTML detail,
    then location refinement, title/company cleaning, salary parsing,
    due_date from the day-count deadline, and the human-readable
    time_remaining rendered against ``as_of`` (never the wall clock).
    """
    as_of_col = F.lit(as_of)
    return (
        raw.withColumn("location_pairs", extract_location_info("location_detail"))
        .withColumn("location", refine_location("location", "location_pairs"))
        .withColumn("title_clean", clean_title("title"))
        .withColumn(
            "company_name_standardized", clean_company_name_udf("company_name")
        )
        .transform(with_salary_columns)
        .withColumn("due_date", due_date_from_deadline("crawled_at", "deadline"))
        .withColumn("time_remaining", time_remaining("due_date", as_of_col))
    )


def incremental_batch(
    staging: DataFrame, last_etl: dt.datetime, lookback_days: int = 7
) -> DataFrame:
    """S3: incremental consumption with lookback — rows with
    ``crawled_at >= min(last_etl, as_of - lookback)`` (the reference
    defaults to now−7d when no watermark is stored —
    ref src/etl/etl_main.py:204-251). Downstream merges are idempotent,
    so reprocessing the window is safe."""
    cutoff = last_etl - dt.timedelta(days=lookback_days)
    return staging.filter(F.col("crawled_at") >= F.lit(cutoff))


def verify_integrity(src_count: int, out_count: int, threshold: float = 0.98) -> dict:
    """V7: raw→staging row-survival gate (ref src/etl/raw_to_staging.py:387-410)."""
    ratio = (out_count / src_count) if src_count else 1.0
    return {
        "source_rows": src_count,
        "output_rows": out_count,
        "ratio": ratio,
        "passed": ratio >= threshold,
    }
