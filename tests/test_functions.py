"""Unit tests for the scalar function library.

Literal I/O pairs ported from the reference's own tests
(/root/reference/tests/test_raw_staging.py, test_staging_to_dwh.py,
test_crawler.py) wherever those tests match the reference's current
implementation; where the reference's tests rotted (clean_company_name —
SURVEY §5 'notable rot'), expectations follow the reference's actual code
behavior (src/processing/data_processing.py:94-153).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.functions.salary import with_salary_columns
from jobinsight_data_pipeline_spark.functions.dates import (
    daily_fact_dates,
    dim_date_frame,
    due_date_from_deadline,
    load_month,
    time_remaining,
)
from jobinsight_data_pipeline_spark.functions.text import (
    clean_company_name_py,
    clean_title,
    parse_last_update,
)
from jobinsight_data_pipeline_spark.functions.location import (
    extract_location_info,
    location_pairs_from_fields,
    parse_job_location,
    parse_locations_udf,
    refine_location,
)


def one_col(spark, values, name="v", dtype="string"):
    return spark.createDataFrame([(v,) for v in values], f"{name} {dtype}")


# --------------------------------------------------------------------- F1
SALARY_CASES = [
    # (input, (min, max, type)) — semantics of sql/stored_procedures.sql:6-105
    (None, (0.0, 0.0, "negotiable")),
    ("", (0.0, 0.0, "negotiable")),
    ("Thoả thuận", (0.0, 0.0, "negotiable")),
    ("thoả thuận", (0.0, 0.0, "negotiable")),
    ("15 - 20 triệu", (15.0, 20.0, "range")),
    ("15-20 triệu", (15.0, 20.0, "range")),
    ("12,5 - 20 triệu", (12.5, 20.0, "range")),  # comma = decimal for triệu
    ("1,000 - 2,000 USD", (24.0, 48.0, "range")),  # comma = thousands for USD
    ("1,000-2,000 usd", (24.0, 48.0, "range")),
    ("Tới 1,500 USD", (0.0, 36.0, "upto")),
    ("tới 25 triệu", (0.0, 25.0, "upto")),
    ("Từ 12 triệu", (12.0, 12.0, "from")),
    ("800 USD", (19.2, 19.2, "range")),
    ("30 triệu", (30.0, 30.0, "range")),
    # dead-code branch in the reference: range branch matches first
    ("0.0 - 0.0 triệu", (0.0, 0.0, "range")),
    ("garbage", (0.0, 0.0, "negotiable")),
    # max=0 → coalesce(nullif(max,0), min): "từ" of 0 stays 0
    ("Tới 0 triệu", (0.0, 0.0, "upto")),
]


def test_normalize_salary(spark):
    df = one_col(spark, [c[0] for c in SALARY_CASES], "salary")
    got = with_salary_columns(df).select("salary", "salary_min", "salary_max", "salary_type")
    by_input = {r["salary"]: r for r in got.collect()}
    for text, (lo, hi, ty) in SALARY_CASES:
        r = by_input[text]
        assert (r["salary_min"], r["salary_max"], r["salary_type"]) == pytest.approx(
            (lo, hi, ty)
        ), f"salary {text!r}"


# --------------------------------------------------------------------- F4
def test_clean_title(spark):
    cases = {
        "Senior Python Developer - Urgent": "Senior Python Developer",
        "Frontend React Developer / Team Lead": "Frontend React Developer / Team Lead",
        "DevOps Engineer (AWS)": "DevOps Engineer",
        None: "",
        "Tuyển Lập Trình Viên - Hà Nội": "Tuyển Lập Trình Viên",  # unicode \w
    }
    df = one_col(spark, list(cases), "title").select(
        "title", clean_title("title").alias("out")
    )
    for r in df.collect():
        assert r["out"] == cases[r["title"]], f"title {r['title']!r}"


# --------------------------------------------------------------------- F5
def test_clean_company_name_actual_behavior():
    # actual behavior of the reference implementation (its own test file
    # predates a rewrite and no longer matches — SURVEY §5)
    assert clean_company_name_py("công ty tnhh ABC") == "Công ty tnhh ABC"
    assert clean_company_name_py("fpt software") == "Fpt software"
    assert clean_company_name_py(None) == ""
    # recruiting keywords dropped, case-insensitively
    assert clean_company_name_py("Tuyển dụng gấp Java Developer") == "Java Developer"
    # all-caps tech words uppercased ('sql' -> 'SQL'); mixed-case list
    # entries can never match (word.upper() comparison)
    assert clean_company_name_py("sql guru co") == "SQL guru co"
    assert clean_company_name_py("java shop") == "Java shop"  # first-word capitalize
    # first word of each '-'/'/'-separated segment is capitalized
    assert clean_company_name_py("abc - def") == "Abc - Def"
    # special chars stripped to space then collapsed; capitalize() then
    # lowercases the rest of the first word
    assert clean_company_name_py("ABC@#%Corp") == "Abc # Corp"


# -------------------------------------------------------------------- F11
def test_parse_last_update(spark):
    cases = {
        "Cập nhật 2 phút trước": 120,
        "Cập nhật 3 giờ trước": 10800,
        "1 ngày trước": 86400,
        "2 tuần trước": 1209600,
        "1 tháng trước": 2592000,
        "": 0,
        None: 0,
        "vừa xong": 0,
        "tháng trước": 0,  # unit but no digits → exception path → 0
    }
    df = one_col(spark, list(cases), "t").select("t", parse_last_update("t").alias("s"))
    for r in df.collect():
        assert r["s"] == cases[r["t"]], f"last_update {r['t']!r}"


# --------------------------------------------------------------------- F6
def test_extract_location_info(spark):
    cases = [
        ("<div>Hà Nội: 123 ABC</div>", ["Hà Nội: 123 ABC"]),
        (
            "<div>Hồ Chí Minh: 456 XYZ<br/>Đà Nẵng: 789 DEF</div>",
            ["Hồ Chí Minh: 456 XYZ", "Đà Nẵng: 789 DEF"],
        ),
        (None, []),
        ("Bare Line<br/>: no key", ["Bare Line"]),  # empty key dropped
    ]
    df = one_col(spark, [c[0] for c in cases], "html").select(
        "html", extract_location_info("html").alias("out")
    )
    by_in = {r["html"]: r["out"] for r in df.collect()}
    for html, expected in cases:
        assert by_in[html] == expected, f"html {html!r}"


# --------------------------------------------------------------------- F7
def test_refine_location(spark):
    rows = [
        Row(location="Hà Nội", location_pairs=["Hà Nội: 123 ABC"]),
        Row(
            location="Hồ Chí Minh & Đà Nẵng",
            location_pairs=["Hồ Chí Minh: 456 XYZ", "Đà Nẵng: 789 DEF"],
        ),
        Row(location="TP HCM", location_pairs=["TP HCM: 101 MNO"]),
    ]
    expected = ["Hà Nội", "Hồ Chí Minh, Đà Nẵng", "TP HCM"]
    df = spark.createDataFrame(rows).select(
        refine_location("location", "location_pairs").alias("out")
    )
    assert [r["out"] for r in df.collect()] == expected


# --------------------------------------------------------------------- F9
def test_parse_job_location_python():
    result = parse_job_location('["Hà Nội: Cầu Giấy, Đống Đa"]')
    assert len(result) == 2
    assert (None, "Hà Nội", "Cầu Giấy") in result
    assert (None, "Hà Nội", "Đống Đa") in result
    assert parse_job_location("Đà Nẵng") == [(None, "Đà Nẵng", None)]
    assert parse_job_location("Bình Định: TP Quy Nhơn") == [("Bình Định", "TP Quy Nhơn", None)]
    assert parse_job_location("") == [(None, "Unknown", None)]
    assert parse_job_location(None) == [(None, "Unknown", None)]
    assert parse_job_location("Hà Nội │ Cầu Giấy") == [(None, "Hà Nội", "Cầu Giấy")]
    assert parse_job_location("Miền Bắc │ Hà Nội │ Cầu Giấy") == [
        ("Miền Bắc", "Hà Nội", "Cầu Giấy")
    ]
    # python-literal (non-JSON) list form
    assert parse_job_location("['Hà Nội: Cầu Giấy']") == [(None, "Hà Nội", "Cầu Giấy")]


def test_parse_locations_udf(spark):
    df = spark.createDataFrame(
        [(["Hà Nội: Cầu Giấy, Đống Đa"],), (["Đà Nẵng"],), (None,), ([],)],
        "location_pairs array<string>",
    ).select(parse_locations_udf("location_pairs").alias("locs"))
    got = [
        [(x["province"], x["city"], x["district"]) for x in r["locs"]]
        for r in df.collect()
    ]
    assert got[0] == [(None, "Hà Nội", "Cầu Giấy"), (None, "Hà Nội", "Đống Đa")]
    assert got[1] == [(None, "Đà Nẵng", None)]
    assert got[2] == [(None, "Unknown", None)]
    assert got[3] == [(None, "Unknown", None)]


# -------------------------------------------------------------------- F10
def test_location_pairs_from_fields(spark):
    df = spark.createDataFrame(
        [
            (["Hà Nội: 123"], "ignored"),
            (None, "Hà Nội │ Cầu Giấy, Đống Đa"),
            ([], "Đà Nẵng"),
            (None, None),
        ],
        "location_pairs array<string>, location string",
    ).select(location_pairs_from_fields("location_pairs", "location").alias("out"))
    got = [r["out"] for r in df.collect()]
    assert got[0] == ["Hà Nội: 123"]
    assert got[1] == ["Hà Nội:Cầu Giấy", "Hà Nội:Đống Đa"]
    assert got[2] == ["Đà Nẵng"]
    assert got[3] == []


# ---------------------------------------------------------------- F2 / F3
def test_due_date_and_time_remaining(spark):
    as_of = dt.datetime(2025, 6, 1, 12, 0, 0)
    rows = [
        ("1", dt.datetime(2025, 5, 20, 0, 0, 0), "30"),  # due 2025-06-19 → days
        ("2", dt.datetime(2025, 6, 1, 10, 0, 0), "0"),  # due = crawled → expired
        ("3", dt.datetime(2025, 6, 1, 14, 30, 0), "1"),  # due in 26.5h → 1 ngày
        ("4", None, "10"),
        ("5", dt.datetime(2025, 6, 1, 11, 30, 0), None),
    ]
    df = spark.createDataFrame(rows, "job_id string, crawled_at timestamp, deadline string")
    out = df.select(
        "job_id",
        due_date_from_deadline("crawled_at", "deadline").alias("due_date"),
    ).select(
        "job_id",
        "due_date",
        time_remaining("due_date", F.lit(as_of)).alias("tr"),
    )
    by_id = {r["job_id"]: r for r in out.collect()}
    assert by_id["1"]["due_date"] == dt.datetime(2025, 6, 19, 0, 0, 0)
    assert by_id["1"]["tr"] == "Còn 17 ngày để ứng tuyển"
    assert by_id["2"]["tr"] == "Đã hết thời gian ứng tuyển"
    assert by_id["3"]["tr"] == "Còn 1 ngày để ứng tuyển"
    assert by_id["4"]["due_date"] is None and by_id["4"]["tr"] is None
    assert by_id["5"]["due_date"] is None


# -------------------------------------------------------- F13 / F14 / F15
def test_load_month(spark):
    run = dt.date(2025, 6, 1)
    df = spark.createDataFrame(
        [(dt.datetime(2025, 5, 29),), (None,)], "d timestamp"
    ).select(load_month("d", run).alias("m"))
    assert [r["m"] for r in df.collect()] == ["2025-05", "2025-06"]


def test_dim_date_frame(spark):
    df = dim_date_frame(spark, dt.date(2025, 1, 30), dt.date(2025, 2, 2))
    rows = df.orderBy("date_id").collect()
    assert len(rows) == 4
    assert rows[0]["day"] == 30 and rows[0]["month"] == 1 and rows[0]["quarter"] == 1
    assert rows[0]["weekday"] == "Thursday"  # 2025-01-30
    assert rows[3]["date_id"] == dt.date(2025, 2, 2)


def test_daily_fact_dates(spark):
    run = dt.date(2025, 5, 26)
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2025, 5, 25), dt.datetime(2025, 5, 27)),
            ("b", None, None),  # start=run, end=run+30
            ("c", dt.datetime(2020, 1, 1), dt.datetime(2020, 1, 5)),  # fully clamped out
        ],
        "id string, posted timestamp, due timestamp",
    ).select("id", daily_fact_dates("posted", "due", run).alias("dates"))
    by_id = {r["id"]: r["dates"] for r in df.collect()}
    assert by_id["a"] == [dt.date(2025, 5, 25), dt.date(2025, 5, 26), dt.date(2025, 5, 27)]
    assert len(by_id["b"]) == 31 and by_id["b"][0] == run
    assert by_id["c"] == []  # start > end after clamp → empty, no fact rows


def test_normalize_salary_sqludf_matches_column_api(spark):
    """The SQL UDTF surface (§2.11, LATERAL calling convention) must
    agree with functions/salary.py on every pinned case."""
    from jobinsight_data_pipeline_spark.functions.sqludf import register_sql_functions

    register_sql_functions(spark)
    one_col(spark, [c[0] for c in SALARY_CASES], "salary").createOrReplaceTempView(
        "_sal_in"
    )
    got = spark.sql(
        "SELECT salary, p.salary_min, p.salary_max, p.salary_type "
        "FROM _sal_in, LATERAL normalize_salary(salary) p"
    )
    by_input = {r["salary"]: r for r in got.collect()}
    assert len(by_input) == len({c[0] for c in SALARY_CASES})
    for text, (lo, hi, ty) in SALARY_CASES:
        r = by_input[text]
        assert (r["salary_min"], r["salary_max"], r["salary_type"]) == pytest.approx(
            (lo, hi, ty)
        ), f"sqludf salary {text!r}"


def test_clean_csv_field_matches_reference_semantics(spark):
    """F20 (ref src/crawler/parser.py:379-402): \n/\r → space, ';' → ',',
    whitespace collapsed via ' '.join(split()), falsy fields unchanged;
    skills per-element stripped with empties/NULLs dropped."""
    from jobinsight_data_pipeline_spark.functions.text import (
        clean_csv_field,
        clean_csv_skills,
    )

    def ref_clean(s):  # the reference's loop body
        if not s:
            return s
        cleaned = s.replace("\n", " ").replace("\r", " ").replace(";", ",")
        return " ".join(cleaned.split())

    raws = [
        "a;b\nc", "x\r\ny   z\t!", "  pad  ", "", None, "no change",
        ";;", " \t ",
    ]
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(raws)], "i long, raw string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_csv_field("raw").alias("c")).collect()
    }
    for i, r in enumerate(raws):
        assert got[i] == ref_clean(r), (i, r, got[i], ref_clean(r))

    def ref_skills(sk):
        if not sk:
            return sk
        out = []
        for s in sk:
            if s and isinstance(s, str):
                c = s.strip().replace("\n", " ").replace("\r", " ")
                if c:
                    out.append(c)
        return out

    skills = [["a\n", " b ", "", None, "c;d", "x  y"], [], None, ["\r\n"]]
    df2 = spark.createDataFrame(
        [(i, s) for i, s in enumerate(skills)], "i long, sk array<string>"
    )
    got2 = {
        r["i"]: r["c"]
        for r in df2.select("i", clean_csv_skills("sk").alias("c")).collect()
    }
    for i, s in enumerate(skills):
        assert got2[i] == ref_skills(s), (i, s, got2[i])
