"""Explicit schema contracts for every table the engine owns.

Derived from the reference DDL (never inferred):
- raw_jobs:      /root/reference/sql/schema_raw_jobs.sql:2-18
- staging_jobs:  /root/reference/sql/schema_staging.sql:3-27
- star schema:   /root/reference/sql/schema_dwh.sql:9-76
- CDC record:    /root/reference/src/ingestion/cdc.py:42-93

Deliberate deviations from the reference (Spark-first):
- ``skills`` / ``location_pairs`` are real ``array<string>`` columns, not
  JSON text — the reference round-trips json.dumps/loads constantly
  (src/crawler/parser.py:448-451, src/processing/data_prepare.py:47-50);
  we serialize only at export boundaries.
- salary amounts are DOUBLE (millions of VND). The reference uses NUMERIC;
  double keeps whole-stage codegen and the DuckDB oracle comparisons are
  done on rounded values.
- No sequences: surrogate keys are assigned set-based
  (max-existing + row_number), see operators/keys.py.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Entry table: one row per scraped job posting (free-text fields verbatim).
# --------------------------------------------------------------------------
RAW_JOBS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("job_url", T.StringType(), True),
        T.StructField("company_name", T.StringType(), True),
        T.StructField("company_url", T.StringType(), True),
        T.StructField("salary", T.StringType(), True),  # free text, F1 input
        T.StructField("skills", T.ArrayType(T.StringType()), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("location_detail", T.StringType(), True),  # HTML
        T.StructField("deadline", T.StringType(), True),  # days-as-string
        T.StructField("verified_employer", T.BooleanType(), True),
        T.StructField("last_update", T.StringType(), True),  # vi relative time
        T.StructField("logo_url", T.StringType(), True),
        T.StructField("posted_time", T.TimestampType(), True),
        T.StructField("crawled_at", T.TimestampType(), True),
    ]
)

# --------------------------------------------------------------------------
# Staging: raw columns + derived (cleaned/normalized) columns.
# --------------------------------------------------------------------------
_STAGING_DERIVED = [
    T.StructField("title_clean", T.StringType(), True),
    T.StructField("company_name_standardized", T.StringType(), True),
    T.StructField("salary_min", T.DoubleType(), True),
    T.StructField("salary_max", T.DoubleType(), True),
    T.StructField("salary_type", T.StringType(), True),
    T.StructField("location_pairs", T.ArrayType(T.StringType()), True),
    T.StructField("due_date", T.TimestampType(), True),
    T.StructField("time_remaining", T.StringType(), True),
]

STAGING_JOBS = T.StructType(list(RAW_JOBS.fields) + _STAGING_DERIVED)

# --------------------------------------------------------------------------
# Star schema (Kimball): 4 dims (SCD2) + daily-grain fact + M:N bridge.
# --------------------------------------------------------------------------
_SCD2_COLS = [
    T.StructField("effective_date", T.DateType(), False),
    T.StructField("expiry_date", T.DateType(), True),
    T.StructField("is_current", T.BooleanType(), False),
]

DIM_JOB = T.StructType(
    [
        T.StructField("job_sk", T.LongType(), False),
        T.StructField("job_id", T.StringType(), False),  # natural key
        T.StructField("title_clean", T.StringType(), True),
        T.StructField("job_url", T.StringType(), True),
        T.StructField("skills", T.ArrayType(T.StringType()), True),
        T.StructField("last_update", T.StringType(), True),
        T.StructField("logo_url", T.StringType(), True),
    ]
    + _SCD2_COLS
)

DIM_COMPANY = T.StructType(
    [
        T.StructField("company_sk", T.LongType(), False),
        # natural key
        T.StructField("company_name_standardized", T.StringType(), False),
        T.StructField("company_url", T.StringType(), True),
        T.StructField("verified_employer", T.BooleanType(), True),
    ]
    + _SCD2_COLS
)

# Insert-only dim; composite natural key (province, city, district) with
# nullable province/district — joins must be null-safe (<=>).
DIM_LOCATION = T.StructType(
    [
        T.StructField("location_sk", T.LongType(), False),
        T.StructField("province", T.StringType(), True),
        T.StructField("city", T.StringType(), False),
        T.StructField("district", T.StringType(), True),
    ]
    + _SCD2_COLS
)

DIM_DATE = T.StructType(
    [
        T.StructField("date_id", T.DateType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("quarter", T.IntegerType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("weekday", T.StringType(), False),  # English 'Monday'..
    ]
)

# Grain = (job_sk, date_id); UNIQUE enforced by merge logic + validation,
# Spark has no constraint engine (SURVEY §7.3).
FACT_JOB_POSTING_DAILY = T.StructType(
    [
        T.StructField("fact_id", T.LongType(), False),
        T.StructField("job_sk", T.LongType(), False),
        T.StructField("company_sk", T.LongType(), False),
        T.StructField("date_id", T.DateType(), False),
        T.StructField("salary_min", T.DoubleType(), True),
        T.StructField("salary_max", T.DoubleType(), True),
        T.StructField("salary_type", T.StringType(), True),
        T.StructField("due_date", T.TimestampType(), True),
        T.StructField("time_remaining", T.StringType(), True),
        T.StructField("verified_employer", T.BooleanType(), True),
        T.StructField("posted_time", T.TimestampType(), True),
        T.StructField("crawled_at", T.TimestampType(), True),
        T.StructField("load_month", T.StringType(), False),  # 'YYYY-MM'
    ]
)

FACT_JOB_LOCATION_BRIDGE = T.StructType(
    [
        T.StructField("fact_id", T.LongType(), False),
        T.StructField("location_sk", T.LongType(), False),
    ]
)

# --------------------------------------------------------------------------
# CDC journal record (append-only change log).
# --------------------------------------------------------------------------
CDC_RECORD = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("job_id", T.StringType(), False),
        T.StructField("action", T.StringType(), False),  # insert | update
        T.StructField("data", RAW_JOBS, True),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("batch_id", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: lake-relative table locations (Hive-style layout).
LAKE_TABLES = {
    "raw_jobs": "raw_jobs",
    "staging_jobs": "staging_jobs",
    "dim_job": "dwh/dim_job",
    "dim_company": "dwh/dim_company",
    "dim_location": "dwh/dim_location",
    "dim_date": "dwh/dim_date",
    "fact_job_posting_daily": "dwh/fact_job_posting_daily",
    "fact_job_location_bridge": "dwh/fact_job_location_bridge",
}

SCHEMAS = {
    "raw_jobs": RAW_JOBS,
    "staging_jobs": STAGING_JOBS,
    "dim_job": DIM_JOB,
    "dim_company": DIM_COMPANY,
    "dim_location": DIM_LOCATION,
    "dim_date": DIM_DATE,
    "fact_job_posting_daily": FACT_JOB_POSTING_DAILY,
    "fact_job_location_bridge": FACT_JOB_LOCATION_BRIDGE,
    "cdc_record": CDC_RECORD,
}
