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

    A small list inlines as literal predicates (scan-fused, no shuffle).
    A DataFrame blocklist (column ``domain``) anti-joins on an EQUI key:
    each row's host explodes into its bounded domain-suffix set (host,
    parent, grandparent, … — at most the label count, ~4-6 in practice)
    and any suffix matching a blocklist entry blocks the row. The
    OR-of-equality-and-endswith predicate this replaces planned as a
    BroadcastNestedLoopJoin — O(rows × blocklist) comparisons per
    partition, quadratic against a large (100k-entry) blocklist — while
    the suffix explode is a plain hash/broadcast anti-join: O(rows ×
    labels) keys probed once each. ``include_subdomains`` also blocks
    ``*.domain`` (suffix set collapses to just the host when False).
    Rows without a parseable host (NULL domain) are KEPT — they are not
    web URLs and blocklists don't speak for them."""
    dom = url_domain(url_col)
    if isinstance(blocked, list):
        hit: Column = F.lit(False)
        for b in blocked:
            b = b.lower()
            hit = hit | (dom == b)
            if include_subdomains:
                hit = hit | dom.endswith("." + b)
        return df.filter(dom.isNull() | ~hit)
    bl = blocked.select(F.lower(F.col("domain")).alias("_suffix")).distinct()
    # host "a.b.example.com" → ["a.b.example.com", "b.example.com",
    # "example.com", "com"]; a blocklist entry matches iff it equals one
    # of these suffixes (exact host, or host endswith "."+entry).
    # Blocked hosts resolved over DISTINCT hosts (≪ rows on a crawl
    # corpus), then anti-joined back on the host itself — two equi
    # joins, both broadcastable when the blocklist/blocked-host side is
    # small, never a nested-loop scan.
    host = F.col("_host")
    labels = F.split(host, r"\.")
    suffixes = (
        F.transform(
            F.sequence(F.lit(1), F.size(labels)),
            lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
        )
        if include_subdomains
        else F.array(host)
    )
    hosts = df.select(dom.alias("_host")).filter(host.isNotNull()).distinct()
    blocked_hosts = (
        hosts.select("_host", F.explode(suffixes).alias("_suffix"))
        .join(bl, "_suffix", "left_semi")
        .select("_host")
        .distinct()
    )
    return df.join(blocked_hosts, dom == F.col("_host"), "left_anti")
