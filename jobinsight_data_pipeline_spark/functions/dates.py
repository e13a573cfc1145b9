"""Date/time functions (F2, F3, F13–F16, F18, F19) — all native.

Every wall-clock-dependent operator takes an explicit ``as_of`` /
``run_date`` parameter (the reference reads CURRENT_TIMESTAMP inline —
/root/reference/sql/stored_procedures.sql:143-186 — which makes its output
untestable; parameterizing is the deliberate design fix, SURVEY §7.3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def due_date_from_deadline(crawled_at: ColumnOrName, deadline: ColumnOrName) -> Column:
    """F2: ``due_date := crawled_at + deadline days`` (deadline is a
    string day-count; ref sql/stored_procedures.sql:133-135). NULL inputs
    propagate to NULL."""
    return F.timestamp_add("DAY", _col(deadline).try_cast("int"), _col(crawled_at))


def time_remaining(due_date: ColumnOrName, as_of: Column) -> Column:
    """F3: render remaining time as the reference's Vietnamese buckets
    (ref sql/stored_procedures.sql:143-186).

    Buckets on ``due_date - as_of`` (component extraction, like Postgres
    EXTRACT on an interval): >=1 day → days, >=1 hour → hours, >=1 minute
    → minutes, else seconds; expired → 'Đã hết thời gian ứng tuyển';
    NULL due_date → NULL.
    """
    due = _col(due_date)
    # unix_timestamp handles both TIMESTAMP and TIMESTAMP_NTZ inputs
    # (NTZ is interpreted in the pinned session timezone)
    secs = F.unix_timestamp(due) - F.unix_timestamp(as_of)
    days = F.floor(secs / 86400)
    hours = F.floor((secs % 86400) / 3600)
    minutes = F.floor((secs % 3600) / 60)
    seconds = secs % 60
    suffix = F.lit(" để ứng tuyển")
    return (
        F.when(due.isNull(), F.lit(None).cast("string"))
        .when(secs <= 0, F.lit("Đã hết thời gian ứng tuyển"))
        .when(secs >= 86400, F.concat(F.lit("Còn "), days.cast("string"), F.lit(" ngày"), suffix))
        .when(secs >= 3600, F.concat(F.lit("Còn "), hours.cast("string"), F.lit(" giờ"), suffix))
        .when(secs >= 60, F.concat(F.lit("Còn "), minutes.cast("string"), F.lit(" phút"), suffix))
        .otherwise(F.concat(F.lit("Còn "), seconds.cast("string"), F.lit(" giây"), suffix))
    )


def load_month(date_col: ColumnOrName, run_date: dt.date) -> Column:
    """F13: 'YYYY-MM' partition key; NULL → run_date's month
    (ref src/processing/data_prepare.py:304-323)."""
    return F.date_format(
        F.coalesce(_col(date_col).cast("date"), F.lit(run_date)), "yyyy-MM"
    )


def dim_date_frame(spark: SparkSession, start: dt.date, end: dt.date):
    """F14: generated calendar — one row per day with (day, month,
    quarter, year, weekday English-full) — as a single explode, no
    driver loop (ref src/processing/data_prepare.py:325-349)."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(start), F.lit(end), F.expr("interval 1 day"))
            ).alias("date_id")
        )
        .select(
            "date_id",
            F.dayofmonth("date_id").alias("day"),
            F.month("date_id").alias("month"),
            F.quarter("date_id").alias("quarter"),
            F.year("date_id").alias("year"),
            F.date_format("date_id", "EEEE").alias("weekday"),
        )
    )


def daily_fact_dates(
    posted: ColumnOrName, due: ColumnOrName, run_date: dt.date
) -> Column:
    """F15: inclusive array of dates from posted (default run_date) to due
    (default start+30d), clamped to [run_date−90d, run_date+180d]
    (ref src/processing/data_prepare.py:256-302).

    Returns an ``array<date>`` to be exploded; empty when start > end
    after clamping (sequence would throw on reversed bounds, so guard)."""
    start = F.coalesce(_col(posted).cast("date"), F.lit(run_date))
    end = F.coalesce(_col(due).cast("date"), F.date_add(start, 30))
    lo = F.lit(run_date - dt.timedelta(days=90))
    hi = F.lit(run_date + dt.timedelta(days=180))
    start_c = F.greatest(start, lo)
    end_c = F.least(end, hi)
    return F.when(start_c <= end_c, F.sequence(start_c, end_c)).otherwise(
        F.array().cast("array<date>")
    )


def fact_fanout_dates(run_date: dt.date, days: int = 5) -> Column:
    """F16: the production path's fan-out — every valid staging row gets
    fact rows for [run_date, run_date+days-1]
    (ref src/etl/fact_handler.py:66-69,200-234)."""
    return F.sequence(
        F.lit(run_date), F.lit(run_date + dt.timedelta(days=days - 1))
    )


def days_to_deadline(due_date: ColumnOrName, run_date: dt.date) -> Column:
    """F18: EXTRACT(DAYS FROM due_date - CURRENT_DATE) (ref sql/views.sql:48)."""
    return F.datediff(_col(due_date).cast("date"), F.lit(run_date))
