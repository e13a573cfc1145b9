#!/usr/bin/env python
"""Side-by-side oracle check, mimicking the driver's correctness gate:
for each catalog query, run the Spark implementation AND the DuckDB
oracle on the same parquet tables; compare row count, column-name sets,
and an order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded, NULLs normalized).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from jobinsight_data_pipeline_spark.catalog import TABLES, build_catalog
from jobinsight_data_pipeline_spark.session import get_spark


def normalize_cell(v):
    # Mirror the driver gate: both sides cross the arrow/pandas bridge, so
    # DuckDB HUGEINT arrives as float64 and TIMESTAMP_NS keeps nanosecond
    # text — type drift must show up HERE, not only in the driver's gate.
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if bool(v) else "false"
    if isinstance(v, float):  # includes np.float64
        if v != v:
            return "NULL"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def dtype_drift_problems(
    sdtypes: dict[str, str], duck_types: dict[str, str], odf: pd.DataFrame
) -> list[str]:
    """Integer-vs-float dtype divergence between the Spark result and the
    oracle: DuckDB HUGEINT (integer sum(), plain or windowed) crosses the
    Arrow/pandas bridge as float64 while Spark emits int64 —
    normalize_cell renders both as "7", so the value hash below can never
    catch it, but the driver's gate DOES (`sessionize` failed it three
    consecutive rounds).

    The flag keys off DuckDB's DECLARED type (DESCRIBE), not the pandas
    dtype: a BIGINT/INTEGER column containing NULLs also arrives as
    float64 (pandas NULL upcast), but that class demonstrably PASSES the
    driver (asof_discount/scd2_rebuild green in r3 with exactly that
    shape) — only type-level divergence is the hazard."""
    _INT = ("tinyint", "smallint", "int", "bigint")
    _DUCK_INT = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                 "USMALLINT", "UINTEGER", "UBIGINT")
    out = []
    for c in odf.columns:
        d_t = duck_types.get(c, "").upper()
        s_t = sdtypes.get(c, "")
        if "HUGEINT" in d_t:
            out.append(
                f"dtype drift col={c}: oracle typed {d_t} (crosses the "
                "Arrow bridge as float64) — CAST the oracle expression "
                "to BIGINT"
            )
        elif d_t in ("DOUBLE", "FLOAT", "REAL") and s_t in _INT:
            out.append(
                f"dtype drift col={c}: oracle {d_t} vs spark {s_t} — "
                "round/cast both sides identically"
            )
        elif d_t in _DUCK_INT and s_t in ("float", "double"):
            out.append(
                f"dtype drift col={c}: oracle {d_t} vs spark {s_t} — "
                "round/cast both sides identically"
            )
    return out


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "|".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    queries, oracles = build_catalog()
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows):7d} rows   ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        # .df() (arrow/pandas) rather than fetchall(): fetchall yields native
        # Python ints/datetimes and masked the HUGEINT→float64 and
        # TIMESTAMP_NS renderings that fail the driver's hash (round-1 bug).
        # date_as_object keeps DATE as datetime.date — the combination that
        # reproduces every round-1 driver pass/fail exactly.
        odf = con.sql(oracles[name]).df(date_as_object=True)
        duck_types = {
            r[0]: r[1] for r in con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        }
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        duck_s = time.time() - t0
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            problems.extend(
                dtype_drift_problems(dict(sdf.dtypes), duck_types, odf)
            )
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duck={oh}")
        status = "PASS" if not problems else "FAIL"
        print(
            f"{name:24s} {status}  rows={len(srows):7d}  spark={spark_s:5.1f}s duck={duck_s:5.1f}s"
            + ("  " + "; ".join(problems) if problems else "")
        )
        if problems:
            failures.append(name)
            # show a tiny diff sample to debug
            sset = {tuple(normalize_cell(v) for v in r) for r in srows}
            oset = {tuple(normalize_cell(v) for v in r) for r in orows}
            so = list(sset - oset)[:3]
            os_ = list(oset - sset)[:3]
            if so:
                print(f"    spark-only sample: {so}")
            if os_:
                print(f"    duck-only  sample: {os_}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
