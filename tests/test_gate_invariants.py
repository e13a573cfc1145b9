"""Catalog-wide invariants over the driver-gate query surface.

These police classes of correctness-gate failures that individual query
tests can't see:

- fractional-second timestamps: the driver's DuckDB build renders
  nanosecond-derived timestamps differently from local DuckDB 1.0.0
  (which truncates TIMESTAMP(NANOS) to µs on read), so `sessionize`
  passed locally while failing the driver hash two rounds running.
  The invariant (CLAUDE.md): gate queries must not EMIT timestamp
  columns with sub-second parts — convert to epoch-microsecond BIGINTs
  at the projection boundary (whole-second timestamps are safe: every
  rendering agrees on them).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

SF_DIR = "/root/testdata/sf0.001"


def _gate_queries():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __spark_entry__ import queries

    return queries()


def test_no_fractional_second_timestamps_in_gate_outputs(spark):
    """Every timestamp column any gate query emits must be whole-second.

    Schema inspection is lazy (building the plan is cheap); only queries
    that actually emit timestamp columns pay an action.
    """
    offenders: list[str] = []
    for name, fn in _gate_queries().items():
        df = fn(spark, SF_DIR)
        checks = []
        for field in df.schema.fields:
            if isinstance(field.dataType, TimestampType):
                checks.append(
                    (F.unix_micros(F.col(field.name)) % 1_000_000 != 0)
                    & F.col(field.name).isNotNull()
                )
            elif isinstance(field.dataType, TimestampNTZType):
                # NTZ: no unix_micros — diff against an NTZ epoch instead
                # (never cast NTZ→LTZ, per CLAUDE.md)
                us = F.expr(
                    "timestampdiff(MICROSECOND,"
                    f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {field.name})"
                )
                checks.append((us % 1_000_000 != 0) & F.col(field.name).isNotNull())
        if not checks:
            continue
        cond = checks[0]
        for c in checks[1:]:
            cond = cond | c
        n_bad = df.filter(cond).limit(1).count()
        if n_bad:
            offenders.append(name)
    assert not offenders, (
        "gate queries emit fractional-second timestamps (non-portable "
        f"across DuckDB renderings — emit epoch-micro BIGINTs): {offenders}"
    )


def test_sessionize_emits_epoch_micro_bigints(spark):
    """Pin the sessionize fix shape: session bounds are BIGINT epoch-µs,
    not timestamps (the column the driver hash failed on twice)."""
    df = _gate_queries()["sessionize"](spark, SF_DIR)
    types = dict(df.dtypes)
    assert types["session_start_us"] == "bigint"
    assert types["session_end_us"] == "bigint"
    row = df.orderBy("user_id", "session_no").first()
    assert row is not None and row["session_start_us"] <= row["session_end_us"]
