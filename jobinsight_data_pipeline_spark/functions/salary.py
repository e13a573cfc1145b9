"""F1: Vietnamese salary-string normalization (fully native, no UDF).

Semantics mirror the reference's plpgsql table function
``normalize_salary`` (/root/reference/sql/stored_procedures.sql:6-105),
branch order included:

1. NULL / '' / 'thoả thuận' (case-insensitive)      -> (0, 0, 'negotiable')
2. "x - y USD"   (comma = thousands separator)      -> (x*R/1e6, y*R/1e6, 'range')
3. "x - y triệu" (comma = decimal separator)        -> (x, y, 'range')
4. "tới x USD" / "tới x triệu"                      -> (0, x, 'upto')
5. "từ x triệu"                                     -> (x, x, 'from')
6. single "x USD" / "x triệu" with no '-' anywhere  -> (x, x, 'range')
7. anything else                                    -> (0, 0, 'negotiable')

with the post-conditions ``salary_min := coalesce(salary_min, 0)`` and
``salary_max := coalesce(nullif(salary_max, 0), salary_min)``.

Note: the reference SQL has an explicit branch for the literal
``'0.0 - 0.0 triệu'`` AFTER the generic range branch, so it is dead code —
the actual output for that input is ``(0.0, 0.0, 'range')``. We reproduce
the actual behavior, not the comment.

USD→VND rate is the reference's constant 24 000; amounts are in millions
of VND as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

USD_VND_RATE = 24_000.0

# patterns are matched against lower(salary): lowercase-once beats Java's
# case-insensitive unicode matching by ~1.6x on the parse bench; the only
# semantic difference vs the reference's ~* is exotic case-folding (e.g.
# dotted capital I), outside the salary-string domain
_NUM = r"([0-9,.]+)"
_RANGE_USD = rf"{_NUM}\s*-\s*{_NUM}\s*usd"
_RANGE_TRIEU = rf"{_NUM}\s*-\s*{_NUM}\s*triệu"
_UPTO_USD = rf"tới\s+{_NUM}\s*usd"
_UPTO_TRIEU = rf"tới\s+{_NUM}\s*triệu"
_FROM_TRIEU = rf"từ\s+{_NUM}\s*triệu"
_SINGLE_USD = rf"{_NUM}\s*usd"
_SINGLE_TRIEU = rf"{_NUM}\s*triệu"


def _usd(raw: Column) -> Column:
    """'1,500' → 1500*rate/1e6 millions VND (comma = thousands sep)."""
    return (
        F.regexp_replace(raw, ",", "").try_cast("double") * F.lit(USD_VND_RATE) / F.lit(1e6)
    )


def _trieu(raw: Column) -> Column:
    """'12,5' → 12.5 millions VND (comma = decimal sep)."""
    return F.regexp_replace(raw, ",", ".").try_cast("double")


def normalize_salary(salary: Column) -> Column:
    """Return ``struct(salary_min double, salary_max double, salary_type)``."""
    s = salary

    ls = F.lower(s)
    is_blank = s.isNull() | (s == "") | (ls == "thoả thuận")
    no_dash = ~s.contains("-")

    # Branch conditions are guard-&-rlike, extraction happens only inside
    # the taken branch. Rationale: extract-based conditions get hoisted by
    # Catalyst's common-subexpression elimination and run unconditionally
    # for every row; rlike conditions appear once each (no CSE), so the
    # CASE short-circuits, and the cheap contains-guards skip most regex
    # evaluations entirely (~1.5-2x on the sf0.1 salary bench).
    g_usd = ls.contains("usd")
    g_tr = ls.contains("triệu")
    g_dash = s.contains("-")
    g_toi = ls.contains("tới")
    g_tu = ls.contains("từ")

    def ex(pattern: str, group: int) -> Column:
        return F.regexp_extract(ls, pattern, group)

    r_usd_lo, r_usd_hi = ex(_RANGE_USD, 1), ex(_RANGE_USD, 2)
    r_tr_lo, r_tr_hi = ex(_RANGE_TRIEU, 1), ex(_RANGE_TRIEU, 2)
    upto_usd = ex(_UPTO_USD, 1)
    upto_tr = ex(_UPTO_TRIEU, 1)
    from_tr = ex(_FROM_TRIEU, 1)
    single_usd = ex(_SINGLE_USD, 1)
    single_tr = ex(_SINGLE_TRIEU, 1)

    zero = F.lit(0.0)

    # post-conditions (stored_procedures.sql:100-101) applied PER BRANCH:
    # the original outer form (build the CASE struct, then coalesce its
    # fields) referenced the whole CASE four times — Catalyst inlined a
    # copy per field path and even after codegen subexpression
    # elimination the regex CASE ran twice per row (plan: one
    # _common_expr projection + one triple-reference projection).
    # Per-branch post-conditions are algebraically identical
    # (coalesce(nullif(hi,0), coalesce(lo,0)) branch by branch) and the
    # CASE now appears exactly once in the expression tree.
    def pair(lo: Column, hi: Column, typ: str) -> Column:
        lo0 = F.coalesce(lo, zero)
        return F.struct(
            lo0.alias("salary_min"),
            F.coalesce(F.nullif(hi, zero), lo0).alias("salary_max"),
            F.lit(typ).alias("salary_type"),
        )

    return (
        F.when(is_blank, pair(zero, zero, "negotiable"))
        .when(g_usd & g_dash & ls.rlike(_RANGE_USD), pair(_usd(r_usd_lo), _usd(r_usd_hi), "range"))
        .when(g_tr & g_dash & ls.rlike(_RANGE_TRIEU), pair(_trieu(r_tr_lo), _trieu(r_tr_hi), "range"))
        .when(g_toi & g_usd & ls.rlike(_UPTO_USD), pair(zero, _usd(upto_usd), "upto"))
        .when(g_toi & g_tr & ls.rlike(_UPTO_TRIEU), pair(zero, _trieu(upto_tr), "upto"))
        .when(g_tu & g_tr & ls.rlike(_FROM_TRIEU), pair(_trieu(from_tr), _trieu(from_tr), "from"))
        .when(g_usd & no_dash & ls.rlike(_SINGLE_USD), pair(_usd(single_usd), _usd(single_usd), "range"))
        .when(g_tr & no_dash & ls.rlike(_SINGLE_TRIEU), pair(_trieu(single_tr), _trieu(single_tr), "range"))
        .otherwise(pair(zero, zero, "negotiable"))
    )


def with_salary_columns(df: DataFrame, salary_col: str = "salary") -> DataFrame:
    """Attach ``salary_min``, ``salary_max``, ``salary_type`` columns."""
    parsed = normalize_salary(F.col(salary_col))
    return (
        df.withColumn("_sal", parsed)
        .withColumn("salary_min", F.col("_sal.salary_min"))
        .withColumn("salary_max", F.col("_sal.salary_max"))
        .withColumn("salary_type", F.col("_sal.salary_type"))
        .drop("_sal")
    )


def normalize_salary_sql(col_expr: str) -> str:
    """ANSI-SQL (DuckDB-compatible) rendering of the same semantics, for
    oracle comparison. Returns a SELECT-fragment producing columns
    ``salary_min, salary_max, salary_type`` from ``col_expr``.
    """
    num = "([0-9,.]+)"
    r_usd = f"(?i){num}\\s*-\\s*{num}\\s*usd"
    r_tr = f"(?i){num}\\s*-\\s*{num}\\s*triệu"
    u_usd = f"(?i)tới\\s+{num}\\s*usd"
    u_tr = f"(?i)tới\\s+{num}\\s*triệu"
    f_tr = f"(?i)từ\\s+{num}\\s*triệu"
    s_usd = f"(?i){num}\\s*usd"
    s_tr = f"(?i){num}\\s*triệu"
    c = col_expr
    usd1 = f"CAST(replace(regexp_extract({c}, '{r_usd}', 1), ',', '') AS DOUBLE) * 24000 / 1e6"
    usd2 = f"CAST(replace(regexp_extract({c}, '{r_usd}', 2), ',', '') AS DOUBLE) * 24000 / 1e6"
    tr1 = f"CAST(replace(regexp_extract({c}, '{r_tr}', 1), ',', '.') AS DOUBLE)"
    tr2 = f"CAST(replace(regexp_extract({c}, '{r_tr}', 2), ',', '.') AS DOUBLE)"
    uusd = f"CAST(replace(regexp_extract({c}, '{u_usd}', 1), ',', '') AS DOUBLE) * 24000 / 1e6"
    utr = f"CAST(replace(regexp_extract({c}, '{u_tr}', 1), ',', '.') AS DOUBLE)"
    ftr = f"CAST(replace(regexp_extract({c}, '{f_tr}', 1), ',', '.') AS DOUBLE)"
    susd = f"CAST(replace(regexp_extract({c}, '{s_usd}', 1), ',', '') AS DOUBLE) * 24000 / 1e6"
    str_ = f"CAST(replace(regexp_extract({c}, '{s_tr}', 1), ',', '.') AS DOUBLE)"
    blank = f"({c} IS NULL OR {c} = '' OR lower({c}) = 'thoả thuận')"
    case = f"""
      CASE
        WHEN {blank} THEN struct_pack(lo := 0.0, hi := 0.0, ty := 'negotiable')
        WHEN regexp_matches({c}, '{r_usd}') THEN struct_pack(lo := {usd1}, hi := {usd2}, ty := 'range')
        WHEN regexp_matches({c}, '{r_tr}') THEN struct_pack(lo := {tr1}, hi := {tr2}, ty := 'range')
        WHEN regexp_matches({c}, '{u_usd}') THEN struct_pack(lo := 0.0, hi := {uusd}, ty := 'upto')
        WHEN regexp_matches({c}, '{u_tr}') THEN struct_pack(lo := 0.0, hi := {utr}, ty := 'upto')
        WHEN regexp_matches({c}, '{f_tr}') THEN struct_pack(lo := {ftr}, hi := {ftr}, ty := 'from')
        WHEN regexp_matches({c}, '{s_usd}') AND NOT contains({c}, '-') THEN struct_pack(lo := {susd}, hi := {susd}, ty := 'range')
        WHEN regexp_matches({c}, '{s_tr}') AND NOT contains({c}, '-') THEN struct_pack(lo := {str_}, hi := {str_}, ty := 'range')
        ELSE struct_pack(lo := 0.0, hi := 0.0, ty := 'negotiable')
      END
    """
    return (
        f"coalesce(({case}).lo, 0.0) AS salary_min, "
        f"coalesce(nullif(({case}).hi, 0.0), coalesce(({case}).lo, 0.0)) AS salary_max, "
        f"({case}).ty AS salary_type"
    )
