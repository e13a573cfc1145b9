"""Mergeable-sketch audit operators (the Apache DataSketches SQL
surface shipped with Spark 4.1: theta_sketch_agg / theta_union /
theta_intersection / theta_difference / theta_sketch_estimate).

The 100-TB story: a theta sketch is a FIXED-SIZE, MERGEABLE summary of
a key set — per-shard sketches aggregate map-side, merge across
datasets, and answer |A|, |B|, |A∪B|, |A∩B|, |A\\B| WITHOUT ever
joining or shuffling the raw keys. That is exactly the shape of the
recurring corpus-audit questions (how much does the new crawl overlap
the old one? how many users appear in both event streams? how much of
the eval set leaked into training?) whose exact answers need a
distinct-join over every key. Below the sketch's nominal entry count
(default 2^12) estimates are EXACT; above it the published relative
error is ~1/sqrt(k). Sketching uses a fixed hash seed — estimates are
deterministic for the same input on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def theta_sketch(df: DataFrame, key_col: str, lg_nom_entries: int = 12) -> DataFrame:
    """One-row frame holding the theta sketch of ``key_col`` — the
    per-dataset summary artifact callers persist beside a corpus and
    merge later (sketches are tiny: <= 8 bytes x 2^lg_nom_entries)."""
    return df.agg(
        F.expr(
            f"theta_sketch_agg(`{key_col}`, {int(lg_nom_entries)})"
        ).alias("sketch")
    )


def theta_overlap(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    lg_nom_entries: int = 12,
) -> DataFrame:
    """Set-cardinality audit between two key sets, entirely via
    sketches: one row of (est_a, est_b, est_union, est_intersect,
    est_diff) BIGINT estimates (A\\B for the difference). Each side
    aggregates to ONE sketch row (map-side partials, no key shuffle);
    the combine is a 1-row x 1-row broadcast join — bytes, not data."""
    sa = theta_sketch(a, key_col, lg_nom_entries).withColumnRenamed(
        "sketch", "_sa"
    )
    sb = theta_sketch(b, key_col, lg_nom_entries).withColumnRenamed(
        "sketch", "_sb"
    )
    return sa.crossJoin(broadcast(sb)).selectExpr(
        "CAST(theta_sketch_estimate(_sa) AS BIGINT) AS est_a",
        "CAST(theta_sketch_estimate(_sb) AS BIGINT) AS est_b",
        "CAST(theta_sketch_estimate(theta_union(_sa, _sb)) AS BIGINT)"
        " AS est_union",
        "CAST(theta_sketch_estimate(theta_intersection(_sa, _sb))"
        " AS BIGINT) AS est_intersect",
        "CAST(theta_sketch_estimate(theta_difference(_sa, _sb))"
        " AS BIGINT) AS est_diff",
    )
