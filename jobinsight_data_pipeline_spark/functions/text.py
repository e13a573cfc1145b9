"""Text cleaning functions (F4, F5, F11, F20).

- ``clean_title`` / ``parse_last_update``: native Column expressions.
  Java regex needs the ``(?U)`` flag so ``\\w`` matches Vietnamese
  letters like Python 3's ``re`` does (SURVEY §7.3 watch-list).
- ``clean_company_name``: pandas UDF — the per-word tech-casing pass
  is Python-level by nature (ref src/processing/data_processing.py:94-153).
- ``clean_csv_field`` / ``clean_csv_skills``: native regexp chains
  (ref src/crawler/parser.py:379-402).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------------------
# F4: clean_title (ref src/processing/data_processing.py:72-92)
# keep the leading word-ish segment, then take the head of ' - ' splits.
# --------------------------------------------------------------------------
_TITLE_RE = r"(?U)([\w\s./-]+(?:\s*(?:\/|-)\s*[\w\s./-]*)*)"


def clean_title(title: ColumnOrName) -> Column:
    t = _col(title)
    extracted = F.regexp_extract(t, _TITLE_RE, 1)
    cleaned = F.trim(F.split(F.trim(extracted), " - ").getItem(0))
    return (
        F.when(t.isNull(), F.lit(""))
        .when(extracted == "", F.trim(t))  # regex found nothing word-ish
        .otherwise(cleaned)
    )


# --------------------------------------------------------------------------
# F11: parse_last_update (ref src/crawler/crawler_utils.py:21-57)
# Vietnamese relative-time string → seconds. Unit checked in the
# reference's order (tháng > tuần > ngày > giờ > phút > giây); month = 30d.
# Unknown/blank/NULL → 0; unit present but no digits → 0 (the reference
# catches the exception).
# --------------------------------------------------------------------------
_UNIT_SECONDS = [
    ("tháng", 30 * 24 * 3600),
    ("tuần", 7 * 24 * 3600),
    ("ngày", 24 * 3600),
    ("giờ", 3600),
    ("phút", 60),
    ("giây", 1),
]


def parse_last_update(update_text: ColumnOrName) -> Column:
    t = _col(update_text)
    n = F.regexp_extract(t, r"(\d+)", 1).try_cast("long")
    out = F.lit(0).cast("long")
    # build when-chain in reference priority order
    chain = None
    for unit, factor in _UNIT_SECONDS:
        cond = t.contains(unit)
        val = F.coalesce(n * factor, F.lit(0).cast("long"))
        chain = (F.when(cond, val) if chain is None else chain.when(cond, val))
    return F.when(t.isNull() | (t == ""), out).otherwise(
        F.coalesce(chain, out)  # type: ignore[arg-type]
    )


# --------------------------------------------------------------------------
# F20: CSV-hygiene field cleaning (ref src/crawler/parser.py:379-402,
# _validate_job_data). The reference scrubs string fields before CSV
# export: \n and \r become spaces, ';' becomes ',' (the CSV delimiter
# escape), and whitespace is collapsed/stripped via ' '.join(s.split()).
# Moot under parquet interchange (SURVEY agrees) but implemented for
# literal §2 completeness — a pure native regexp chain, scan-fused.
# --------------------------------------------------------------------------


def clean_csv_field(field: ColumnOrName) -> Column:
    """NULL/empty pass through unchanged (the reference only cleans
    truthy fields); otherwise newlines/CRs → spaces, ';' → ',',
    whitespace runs collapsed to one space, ends stripped — exactly
    ``' '.join(s.replace('\\n',' ').replace('\\r',' ')
    .replace(';',',').split())`` for ASCII whitespace."""
    c = _col(field)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, r"[\n\r]", " "), ";", ","
            ),
            r"\s+",
            " ",
        )
    )
    return F.when(c.isNull() | (c == ""), c).otherwise(cleaned)


def clean_csv_skills(skills: ColumnOrName) -> Column:
    """Per-skill cleaning of the reference's skills list: each element
    stripped, \\n/\\r → spaces, empties and non-strings (NULLs) dropped;
    a NULL/absent list passes through unchanged. Internal whitespace is
    deliberately NOT collapsed (the reference doesn't)."""
    c = _col(skills)
    cleaned = F.transform(
        c,
        lambda s: F.regexp_replace(
            F.regexp_replace(s, r"[\n\r]", " "), r"^\s+|\s+$", ""
        ),
    )
    return F.when(
        c.isNotNull(),
        F.filter(cleaned, lambda s: s.isNotNull() & (s != "")),
    )


def posted_time_from_last_update(
    last_update: ColumnOrName, as_of: Column
) -> Column:
    """F12: posted_time := as_of − parse_last_update(last_update) seconds
    (ref src/crawler/parser.py:371-374, parameterized on as_of)."""
    return F.timestamp_add("SECOND", (-parse_last_update(last_update)).cast("int"), as_of)


# --------------------------------------------------------------------------
# F5: clean_company_name — pandas UDF.
#
# Reproduces the reference's ACTUAL behavior
# (src/processing/data_processing.py:94-153), which differs from its own
# stale unit-test expectations (tests/test_raw_staging.py:98-116 predate a
# rewrite; e.g. 'công ty tnhh ABC' → 'Công ty tnhh ABC', not
# 'Công ty TNHH ABC'):
# 1. strip chars outside [\w\s()\[\]\-/.,&+#], collapse whitespace;
# 2. drop recruiting keywords (tuyển dụng / cần tuyển / đang tuyển / hot /
#    gấp / \bhr\b, case-insensitive);
# 3. split on -(/) separators; in each text part, uppercase a word only if
#    word.upper() is in the tech list (so only the all-caps entries can
#    ever match), and capitalize() the first word;
# 4. collapse whitespace again.
# --------------------------------------------------------------------------
_STRIP_RE = re.compile(r"[^\w\s()\[\]\-/.,&+#]")
_WS_RE = re.compile(r"\s+")
_REMOVE_RES = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"tuyển\s+dụng",
        r"cần\s+tuyển",
        r"đang\s+tuyển",
        r"hot",
        r"gấp",
        r"\bhr\b",
    )
]
_SEP_SPLIT_RE = re.compile(r"(\s*[\-\/]\s*)")
_TECH_WORDS = {
    "PHP", "Java", "Python", "AWS", "SQL", "C#", "C++", ".NET",
    "HTML", "CSS", "JS", "UI", "UX", "AI", "ML", "iOS", "API",
    "React", "Vue", "Angular", "Node", "DevOps", "QA", "BA",
}


def clean_company_name_py(name: object) -> str:
    """Pure-Python implementation (shared by the UDF and unit tests)."""
    if name is None or (isinstance(name, float) and pd.isna(name)):
        return ""
    s = str(name)
    s = _STRIP_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s).strip()
    for rx in _REMOVE_RES:
        s = rx.sub("", s)
    parts = _SEP_SPLIT_RE.split(s)
    out_parts: list[str] = []
    for i, part in enumerate(parts):
        if i % 2 == 0:
            words = part.split()
            for j, word in enumerate(words):
                if word.upper() in _TECH_WORDS:
                    words[j] = word.upper()
                elif j == 0:
                    words[j] = word.capitalize()
            out_parts.append(" ".join(words))
        else:
            out_parts.append(part)
    s = "".join(out_parts).strip()
    return _WS_RE.sub(" ", s).strip()


@F.pandas_udf(StringType())
def clean_company_name_udf(names: pd.Series) -> pd.Series:
    return names.map(clean_company_name_py)
