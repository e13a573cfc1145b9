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


@pytest.mark.sweep
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


@pytest.mark.sweep
def test_no_ltz_timestamp_columns_in_gate_outputs(spark):
    """No driver gate emits a session-TZ-adjusted (LTZ) timestamp column.

    LTZ values cross collect()/rendering through the session+process TZ
    pairing, which the driver host controls, not us — `html_ingest`
    failed the r3 driver hash on date_format'd LTZ columns that were
    built from naive lits. NTZ and DATE are fine (no TZ adjustment);
    anything LTZ-derived must be projected to epoch integers or
    TZ-invariant differences at the gate boundary."""
    offenders = []
    for name, fn in _gate_queries().items():
        df = fn(spark, SF_DIR)
        ltz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)]
        if ltz:
            offenders.append((name, ltz))
    assert not offenders, (
        f"driver gates emit LTZ timestamp columns (TZ-dependent): {offenders}"
    )


def test_no_hugeint_typed_oracle_columns():
    """No oracle output column may be HUGEINT/UHUGEINT-typed: DuckDB's
    integer sum() (plain or windowed) returns HUGEINT, which crosses the
    Arrow/pandas bridge as float64 while Spark emits int64 — the driver
    hash then fails on 7.0-vs-7 (`sessionize`, three rounds running).
    Type-level check via DESCRIBE: catches the class without executing,
    over the FULL catalog (demoted queries may be promoted later)."""
    import duckdb

    from jobinsight_data_pipeline_spark.catalog import TABLES, build_catalog

    _, oracles = build_catalog()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    offenders = []
    for name, sql in oracles.items():
        desc = con.sql(f"DESCRIBE {sql}").fetchall()
        bad = [c for c, typ, *_ in desc if "HUGEINT" in typ.upper()]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        f"oracle columns typed HUGEINT (cross the bridge as float64 — "
        f"CAST to BIGINT): {offenders}"
    )


def test_checker_flags_integer_float_dtype_drift():
    """Regression-test the checker itself: scripts/check_oracles.py must
    FAIL on the r3 `sessionize` shape (oracle HUGEINT→float64-integral vs
    Spark bigint), which its float normalization used to mask."""
    import importlib.util
    import os

    import pandas as pd

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "check_oracles.py",
    )
    spec = importlib.util.spec_from_file_location("check_oracles", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # r3 sessionize: DuckDB HUGEINT window-sum crossed as float64 7.0,
    # Spark bigint 7 — flagged off the DECLARED type
    odf = pd.DataFrame({"session_no": [1.0, 7.0]})
    assert mod.dtype_drift_problems(
        {"session_no": "bigint"}, {"session_no": "HUGEINT"}, odf
    )
    # reverse direction: oracle BIGINT vs Spark double is drift too
    odf2 = pd.DataFrame({"x": pd.array([1, 2], dtype="int64")})
    assert mod.dtype_drift_problems({"x": "double"}, {"x": "BIGINT"}, odf2)
    # oracle DOUBLE vs Spark int: drift
    odf3 = pd.DataFrame({"y": [1.0, 2.0]})
    assert mod.dtype_drift_problems({"y": "int"}, {"y": "DOUBLE"}, odf3)
    # legit float on both sides: no flag
    odf4 = pd.DataFrame({"v": [1.5, 2.0]})
    assert not mod.dtype_drift_problems({"v": "double"}, {"v": "DOUBLE"}, odf4)
    # NULL-upcast: BIGINT-typed oracle column with NULLs arrives float64 —
    # the driver tolerates this (asof_discount green in r3); no flag
    odf5 = pd.DataFrame({"version_no": [1.0, None]})
    assert not mod.dtype_drift_problems(
        {"version_no": "int"}, {"version_no": "BIGINT"}, odf5
    )


def test_driver_surface_fits_cap():
    """The driver verifies at most 50 registered queries (observed cap:
    exactly 50 ran in rounds 2 and 3); the warehouse reference-parity
    core must sit at the FRONT so it can never fall past the cap again."""
    from jobinsight_data_pipeline_spark.catalog import DRIVER_QUERIES

    q = _gate_queries()
    assert list(q) == DRIVER_QUERIES
    assert len(q) <= 50
    # round-6 slot refresh: top10_avg_salary / view_monthly_jobs_sets /
    # view_top_locations demoted (each shadowed by surviving siblings)
    # for bm25_search / pagerank / ivf_pq_topk. Round-7 refresh #3
    # (r6 verdict directive): view_current_jobs / rolling_avg / set_ops
    # demoted for bpe_budget_packs / incremental_dedup /
    # ivf_pq_index_search. Round-8 refresh #4 (r7 verdict directive):
    # ivf_pq_topk / dup_grain_check / view_top_companies demoted
    # (each shadowed — the composed build+serve path, the A4 HAVING
    # inside warehouse_validation, the A2 top-N twin of
    # top10_customers) for forget_propagation / stream_day2_pipeline /
    # bpe_learned_packs — the core below is what must stay
    # front-registered
    core = {
        "scd2_update", "fact_merge", "bridge_rebuild", "warehouse_rollup",
        "warehouse_incremental", "views_salary_filter",
        "view_job_locations", "view_monthly_jobs",
        "stream_pipeline",
    }
    head = set(list(q)[:19])
    assert core <= head, f"warehouse core not front-registered: {core - head}"

    from __spark_entry__ import oracle_sql

    assert set(oracle_sql()) == set(q), "every driver query needs an oracle"


def test_sessionize_emits_epoch_micro_bigints(spark):
    """Pin the sessionize fix shape: session bounds are BIGINT epoch-µs,
    not timestamps (the column the driver hash failed on twice)."""
    df = _gate_queries()["sessionize"](spark, SF_DIR)
    types = dict(df.dtypes)
    assert types["session_start_us"] == "bigint"
    assert types["session_end_us"] == "bigint"
    row = df.orderBy("user_id", "session_no").first()
    assert row is not None and row["session_start_us"] <= row["session_end_us"]


def test_every_catalog_query_has_an_oracle():
    """The full local catalog carries NO rows-only entries: every query
    pairs with a DuckDB oracle (exact, exact twin, or bounded-error
    containment) — the invariant COVERAGE.md claims."""
    from jobinsight_data_pipeline_spark.catalog import build_catalog

    queries, oracles = build_catalog()
    assert set(queries) == set(oracles)
    assert len(queries) >= 93
