"""SQL-function surface (SURVEY §2.11): the scalar library exposed to
``spark.sql`` verbatim.

The reference's single true UDF is a plpgsql TABLE function
``normalize_salary(text) → (salary_min, salary_max, salary_type)``
(/root/reference/sql/stored_procedures.sql:6-105) that queries invoke as
a row source. Spark 4's SQL UDFs (CREATE TEMPORARY FUNCTION … RETURNS
TABLE … RETURN <query>) reproduce that calling convention exactly —
``FROM jobs, LATERAL normalize_salary(salary) p`` — while staying fully
native: the body is Catalyst expressions, no Python round trip, same
whole-stage-codegen plan as the Column-API version in
functions/salary.py (whose regex constants this module reuses, so the
two surfaces cannot drift).

Scalar helpers (due-date arithmetic, load-month stamp) register the
same way for parity with views that call them inline.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jobinsight_data_pipeline_spark.functions.salary import (
    _FROM_TRIEU,
    _RANGE_TRIEU,
    _RANGE_USD,
    _SINGLE_TRIEU,
    _SINGLE_USD,
    _UPTO_TRIEU,
    _UPTO_USD,
    USD_VND_RATE,
)


def _pat(p: str) -> str:
    """Render a Java-regex pattern as a Spark SQL string literal body
    (backslashes doubled: SQL literals are escape-processed)."""
    return p.replace("\\", "\\\\")


def _normalize_salary_ddl() -> str:
    ru, rt = _pat(_RANGE_USD), _pat(_RANGE_TRIEU)
    uu, ut = _pat(_UPTO_USD), _pat(_UPTO_TRIEU)
    ft = _pat(_FROM_TRIEU)
    su, st = _pat(_SINGLE_USD), _pat(_SINGLE_TRIEU)

    def usd(pattern: str, group: int) -> str:
        return (
            f"try_cast(replace(regexp_extract(ls, '{pattern}', {group}), ',', '')"
            f" AS DOUBLE) * {USD_VND_RATE!r}D / 1e6"
        )

    def tri(pattern: str, group: int) -> str:
        return (
            f"try_cast(replace(regexp_extract(ls, '{pattern}', {group}), ',', '.')"
            " AS DOUBLE)"
        )

    def pair(lo: str, hi: str, ty: str) -> str:
        return f"named_struct('lo', {lo}, 'hi', {hi}, 'ty', '{ty}')"

    zero = "0.0D"
    # guard-&-rlike branch structure copied from functions/salary.py:
    # extracts only inside the taken branch (rlike conditions appear once
    # each, so Catalyst CSE cannot hoist them and the CASE short-circuits)
    case = f"""CASE
      WHEN salary IS NULL OR salary = '' OR ls = 'thoả thuận'
        THEN {pair(zero, zero, "negotiable")}
      WHEN contains(ls, 'usd') AND contains(salary, '-') AND ls RLIKE '{ru}'
        THEN {pair(usd(ru, 1), usd(ru, 2), "range")}
      WHEN contains(ls, 'triệu') AND contains(salary, '-') AND ls RLIKE '{rt}'
        THEN {pair(tri(rt, 1), tri(rt, 2), "range")}
      WHEN contains(ls, 'tới') AND contains(ls, 'usd') AND ls RLIKE '{uu}'
        THEN {pair(zero, usd(uu, 1), "upto")}
      WHEN contains(ls, 'tới') AND contains(ls, 'triệu') AND ls RLIKE '{ut}'
        THEN {pair(zero, tri(ut, 1), "upto")}
      WHEN contains(ls, 'từ') AND contains(ls, 'triệu') AND ls RLIKE '{ft}'
        THEN {pair(tri(ft, 1), tri(ft, 1), "from")}
      WHEN contains(ls, 'usd') AND NOT contains(salary, '-') AND ls RLIKE '{su}'
        THEN {pair(usd(su, 1), usd(su, 1), "range")}
      WHEN contains(ls, 'triệu') AND NOT contains(salary, '-') AND ls RLIKE '{st}'
        THEN {pair(tri(st, 1), tri(st, 1), "range")}
      ELSE {pair(zero, zero, "negotiable")}
    END"""
    return f"""
    CREATE OR REPLACE TEMPORARY FUNCTION normalize_salary(salary STRING)
    RETURNS TABLE (salary_min DOUBLE, salary_max DOUBLE, salary_type STRING)
    RETURN
    SELECT coalesce(c.lo, 0.0D) AS salary_min,
           coalesce(nullif(c.hi, 0.0D), coalesce(c.lo, 0.0D)) AS salary_max,
           c.ty AS salary_type
    FROM (SELECT {case} AS c FROM (SELECT lower(salary) AS ls) t) s
    """


def register_sql_functions(spark: SparkSession) -> None:
    """Install the SQL-callable function surface on this session
    (idempotent): ``normalize_salary`` UDTF + scalar date helpers."""
    spark.sql(_normalize_salary_ddl())
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION due_date_from_deadline(
            crawled TIMESTAMP_NTZ, deadline STRING)
        RETURNS TIMESTAMP_NTZ
        RETURN CASE WHEN try_cast(deadline AS INT) IS NOT NULL
                    THEN crawled + make_interval(0, 0, 0, try_cast(deadline AS INT), 0, 0, 0)
               END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION load_month(d DATE)
        RETURNS STRING
        RETURN date_format(d, 'yyyy-MM')
        """
    )
