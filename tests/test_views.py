"""The 7 reference views over an engine-built warehouse (pytest-level;
the views also run under the oracle gate via views_salary_filter)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.plans import views as V
from jobinsight_data_pipeline_spark.plans.pipeline import run_full_pipeline
from jobinsight_data_pipeline_spark.sources.export import export_denormalized
from jobinsight_data_pipeline_spark.sources.lake import ParquetLake
from tests.test_pipeline import D1, day1_batch


def _warehouse(spark, tmp_path):
    lake = ParquetLake(str(tmp_path / "lake"))
    run_full_pipeline(lake, spark, day1_batch(spark), D1)
    V.register_dwh_views(
        spark,
        lake.read(spark, "dim_job"),
        lake.read(spark, "dim_company"),
        lake.read(spark, "dim_location"),
        lake.read(spark, "dim_date"),
        lake.read(spark, "fact_job_posting_daily"),
        lake.read(spark, "fact_job_location_bridge"),
    )
    return lake


def test_all_views(spark, tmp_path):
    lake = _warehouse(spark, tmp_path)

    current = V.vw_current_jobs(spark)
    assert current.count() == 20  # 4 resolvable jobs × 5 days
    assert current.filter("is_current = false").count() == 0

    locs = V.vw_job_locations(spark)
    assert locs.count() > 0
    assert set(locs.columns) == {"fact_id", "job_sk", "date_id", "province", "city", "district"}

    monthly = V.vw_monthly_jobs(spark).collect()
    assert len(monthly) == 1
    assert monthly[0]["load_month"] == "2025-06" and monthly[0]["job_count"] == 4

    top_co = V.vw_top_companies(spark).collect()
    assert top_co[0]["job_count"] == 1  # every company has 1 job here
    assert len(top_co) == 4

    top_loc = V.vw_top_locations(spark).collect()
    assert {r["city"] for r in top_loc} >= {"Hà Nội", "Unknown"}

    # J1 (15-20M, due 2025-07-01) passes the salary band at run_date
    filt = V.vw_job_salary_filter(spark, D1.date()).collect()
    assert {r["job_id"] for r in filt} == {"J1"}

    hn = V.vw_top10_hn(spark, D1.date()).collect()
    assert len(hn) == 1 and hn[0]["job_id"] == "J1"
    assert hn[0]["days_to_deadline"] == 30

    # J10: denormalized three-flavor export runs end-to-end
    export_denormalized(
        lake.read(spark, "fact_job_posting_daily"),
        lake.read(spark, "dim_job"),
        lake.read(spark, "dim_company"),
        lake.read(spark, "fact_job_location_bridge"),
        lake.read(spark, "dim_location"),
        str(tmp_path / "export"),
    )
    facts = spark.read.parquet(str(tmp_path / "export/facts"))
    assert facts.count() == 20 and "title_clean" in facts.columns
    analytics = spark.read.parquet(str(tmp_path / "export/analytics"))
    assert analytics.count() == 4
