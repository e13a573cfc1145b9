"""URL hygiene for crawl corpora: domain extraction, canonicalization,
and canonical-URL dedup — the preprocessing a web-scale pipeline runs
before content dedup (two crawls of the same page usually differ only by
tracking parameters, case, fragments, or default ports).

All native Column expressions (regex + array lambdas in the Java∩RE2
common subset — no lookaround, so the same patterns drive the DuckDB
oracle); scan-fused and shuffle-free except the final dedup groupBy on
the canonical hash.

Canonical form (documented contract, pinned by the gate):
- scheme and host lowercased (path/query case preserved — it is
  significant on most servers);
- default ports dropped (``:80`` / ``:443``);
- fragment dropped;
- tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``) and the remaining query parameters SORTED (param order is
  almost never significant; sorting makes reordered duplicates
  collide);
- a bare trailing ``?`` left by parameter removal is dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking parameters stripped by canonicalize_url (RE2-safe pattern)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)="

_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def url_domain(url: Column | str) -> Column:
    """Lowercased host (without userinfo or port), or NULL when the
    value does not look like an absolute URL."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(
        F.lower(c), r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    return F.when(host != "", host)


def canonicalize_url(url: Column | str) -> Column:
    """Apply the module's canonical form (see module docstring)."""
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(c, r"#.*$", "")
    prefix = F.regexp_extract(no_frag, _PREFIX_RE, 1)
    rest = F.substring(no_frag, F.length(prefix) + 1, F.lit(2_000_000))
    prefix = F.regexp_replace(F.lower(prefix), r":(80|443)$", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    rebuilt_query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(prefix, path, rebuilt_query)


def dedup_canonical_urls(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Group rows by canonical URL, keep-min survivor: returns
    (canonical, survivor_id, dup_count) — ``exact_dedup`` semantics on
    the canonical form (one shuffle on the canonicalized key)."""
    return (
        df.select(
            F.col(id_col), canonicalize_url(url_col).alias("canonical")
        )
        .groupBy("canonical")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: list[str] | DataFrame,
    url_col: str = "url",
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL host is on (or under) a blocked domain — the
    blocklist-filtering step of crawl curation.

    A small list inlines as literal predicates (scan-fused, no shuffle);
    a DataFrame blocklist (column ``domain``) anti-joins — broadcast it
    when it fits. ``include_subdomains`` also blocks ``*.domain``. Rows
    without a parseable host (NULL domain) are KEPT — they are not web
    URLs and blocklists don't speak for them."""
    dom = url_domain(url_col)
    if isinstance(blocked, list):
        hit: Column = F.lit(False)
        for b in blocked:
            b = b.lower()
            hit = hit | (dom == b)
            if include_subdomains:
                hit = hit | dom.endswith("." + b)
        return df.filter(dom.isNull() | ~hit)
    bl = blocked.select(F.lower(F.col("domain")).alias("_bd"))
    cond = dom == F.col("_bd")
    if include_subdomains:
        cond = cond | dom.endswith(F.concat(F.lit("."), F.col("_bd")))
    return df.join(bl, cond, "left_anti")
