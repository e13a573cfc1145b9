"""Phase 4 — the reference's 7 canned views as Spark SQL.

Source DDL: /root/reference/sql/schema_dwh.sql:91-143 and
/root/reference/sql/views.sql:2-55. Registered verbatim-shaped over temp
views so they run through ``spark.sql``; every view is also exposed as a
DataFrame function parameterized on ``run_date`` (the reference reads
CURRENT_DATE inline).

Plan quality: the star joins broadcast the dims (small by construction);
vw_top10_hn plans as TakeOrderedAndProject (true top-k, no global sort).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession


def register_dwh_views(
    spark: SparkSession,
    dim_job: DataFrame,
    dim_company: DataFrame,
    dim_location: DataFrame,
    dim_date: DataFrame,
    fact: DataFrame,
    bridge: DataFrame,
) -> None:
    dim_job.createOrReplaceTempView("DimJob")
    dim_company.createOrReplaceTempView("DimCompany")
    dim_location.createOrReplaceTempView("DimLocation")
    dim_date.createOrReplaceTempView("DimDate")
    fact.createOrReplaceTempView("FactJobPostingDaily")
    bridge.createOrReplaceTempView("FactJobLocationBridge")


def vw_current_jobs(spark: SparkSession) -> DataFrame:
    """J1 (schema_dwh.sql:91-97)."""
    return spark.sql(
        """
        SELECT j.*, c.company_name_standardized, c.verified_employer
        FROM DimJob j
        JOIN FactJobPostingDaily f ON j.job_sk = f.job_sk
        JOIN DimCompany c ON f.company_sk = c.company_sk
        WHERE j.is_current = TRUE AND c.is_current = TRUE
        """
    )


def vw_job_locations(spark: SparkSession) -> DataFrame:
    """J2 (schema_dwh.sql:100-105)."""
    return spark.sql(
        """
        SELECT f.fact_id, f.job_sk, f.date_id, l.province, l.city, l.district
        FROM FactJobPostingDaily f
        JOIN FactJobLocationBridge b ON f.fact_id = b.fact_id
        JOIN DimLocation l ON b.location_sk = l.location_sk
        WHERE l.is_current = TRUE
        """
    )


def vw_monthly_jobs(spark: SparkSession) -> DataFrame:
    """A1 (schema_dwh.sql:108-118)."""
    return spark.sql(
        """
        SELECT
            f.load_month,
            DATE_TRUNC('month', f.date_id) AS month,
            COUNT(DISTINCT f.job_sk) AS job_count,
            COUNT(DISTINCT f.company_sk) AS company_count,
            AVG(f.salary_min) AS avg_salary_min,
            AVG(f.salary_max) AS avg_salary_max
        FROM FactJobPostingDaily f
        GROUP BY f.load_month, DATE_TRUNC('month', f.date_id)
        ORDER BY f.load_month, DATE_TRUNC('month', f.date_id)
        """
    )


def vw_monthly_jobs_sets(spark: SparkSession) -> DataFrame:
    """A1 extended with GROUPING SETS — the monthly view plus its
    load_month subtotals and a grand total in ONE scan (the cube/rollup
    family the reference approximates by re-querying the monthly view;
    grouping_id disambiguates subtotal NULLs from data NULLs). At scale
    this is strictly cheaper than three separate aggregations: Spark
    expands the sets after a single shuffle of the fact."""
    return spark.sql(
        """
        WITH f AS (
            SELECT load_month,
                   CAST(DATE_TRUNC('month', date_id) AS DATE) AS month,
                   job_sk, company_sk, salary_min, salary_max
            FROM FactJobPostingDaily
        )
        SELECT load_month, month,
               CAST(GROUPING_ID(load_month, month) AS INT) AS gid,
               COUNT(DISTINCT job_sk) AS job_count,
               COUNT(DISTINCT company_sk) AS company_count,
               ROUND(AVG(salary_min), 2) AS avg_salary_min,
               ROUND(AVG(salary_max), 2) AS avg_salary_max
        FROM f
        GROUP BY GROUPING SETS ((load_month, month), (load_month), ())
        """
    )


def vw_top_companies(spark: SparkSession) -> DataFrame:
    """A2 (schema_dwh.sql:121-130)."""
    return spark.sql(
        """
        SELECT
            c.company_name_standardized,
            c.verified_employer,
            COUNT(DISTINCT f.job_sk) AS job_count
        FROM DimCompany c
        JOIN FactJobPostingDaily f ON c.company_sk = f.company_sk
        WHERE c.is_current = TRUE
        GROUP BY c.company_name_standardized, c.verified_employer
        ORDER BY job_count DESC
        """
    )


def vw_top_locations(spark: SparkSession) -> DataFrame:
    """A2/J2 (schema_dwh.sql:133-143)."""
    return spark.sql(
        """
        SELECT
            COALESCE(l.province, 'Unknown') AS province,
            l.city,
            COUNT(DISTINCT f.job_sk) AS job_count
        FROM DimLocation l
        JOIN FactJobLocationBridge b ON l.location_sk = b.location_sk
        JOIN FactJobPostingDaily f ON b.fact_id = f.fact_id
        WHERE l.is_current = TRUE
        GROUP BY l.province, l.city
        ORDER BY job_count DESC
        """
    )


def vw_job_salary_filter(spark: SparkSession, run_date: dt.date) -> DataFrame:
    """P4/J3 (views.sql:2-31): salary 10–20M, not expired at run_date,
    null-tolerant left joins to locations."""
    return spark.sql(
        f"""
        SELECT DISTINCT
            j.job_id, j.title_clean, c.company_name_standardized,
            f.salary_min, f.salary_max, f.due_date, f.posted_time,
            f.time_remaining, j.job_url, j.skills,
            l.province, l.city, l.district
        FROM FactJobPostingDaily f
        INNER JOIN DimJob j ON f.job_sk = j.job_sk
        INNER JOIN DimCompany c ON f.company_sk = c.company_sk
        LEFT JOIN FactJobLocationBridge b ON f.fact_id = b.fact_id
        LEFT JOIN DimLocation l ON b.location_sk = l.location_sk
        WHERE j.is_current = TRUE
          AND c.is_current = TRUE
          AND (l.is_current = TRUE OR l.is_current IS NULL)
          AND f.salary_min >= 10.00
          AND f.salary_max <= 20.00
          AND f.due_date >= DATE'{run_date.isoformat()}'
          AND f.salary_min IS NOT NULL
          AND f.salary_max IS NOT NULL
        """
    )


def vw_top10_hn(spark: SparkSession, run_date: dt.date) -> DataFrame:
    """P5/O1 (views.sql:34-55): Hanoi jobs by soonest deadline, top 10."""
    vw_job_salary_filter(spark, run_date).createOrReplaceTempView(
        "vw_job_salary_filter"
    )
    return spark.sql(
        f"""
        SELECT
            job_id, title_clean, company_name_standardized,
            salary_min, salary_max, due_date, time_remaining, posted_time,
            job_url, skills, city, province,
            datediff(CAST(due_date AS DATE), DATE'{run_date.isoformat()}')
                AS days_to_deadline
        FROM vw_job_salary_filter
        WHERE lower(city) LIKE '%hà nội%'
           OR lower(city) LIKE '%hanoi%'
           OR lower(province) LIKE '%hà nội%'
        ORDER BY due_date ASC
        LIMIT 10
        """
    )


ALL_VIEWS = {
    "vw_current_jobs": vw_current_jobs,
    "vw_job_locations": vw_job_locations,
    "vw_monthly_jobs": vw_monthly_jobs,
    "vw_top_companies": vw_top_companies,
    "vw_top_locations": vw_top_locations,
}
