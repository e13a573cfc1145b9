"""Column profiling (data-quality summary): one pass over the table,
one output row per profiled column — row count, null count, exact
distinct count.

All metrics compute in a SINGLE aggregation (Catalyst plans the
count-distincts via expand + partial aggregation, so the table is
still scanned once); the per-column rows come from unpivoting the one
aggregate row with ``stack`` — no per-column scans, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Returns (column, n_rows, n_null, n_distinct) per requested column.
    n_distinct is exact and excludes NULL (count-distinct semantics in
    both Spark and ANSI SQL)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "n_distinct")


def dataset_card(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source dataset-card stats — the release-artifact table a
    corpus ships with (the Hugging Face dataset-card data block):
    document/token/char volumes, exact-duplicate exposure, and the
    language mix, one row per source.

    Columns: ``n_docs``, ``sum_tokens`` (whitespace tokens),
    ``sum_chars``, ``n_dup_docs`` (docs whose content md5 appears more
    than once ANYWHERE in the corpus — cross-source duplication counts
    against both sources), and ``lang_mix`` ("code:count" pairs,
    lexicographically joined with ``|``).

    Scale shape: one language/token projection (scan-fused), one
    partial-agg groupBy on the 16-byte content hash joined back (the
    paragraph-dedup shape — never a corpus-wide window), then the
    per-source rollup; the language mix aggregates (source, lang)
    groups before string-joining, so no collect and no skewed state.
    """
    from jobinsight_data_pipeline_spark.operators.textstats import (
        with_language_id,
        word_count,
    )

    base = with_language_id(df, text_col).select(
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_src"),
        F.col("lang_pred"),
        word_count(F.col(text_col)).cast("long").alias("_tok"),
        F.length(F.col(text_col)).cast("long").alias("_chars"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    dup_hashes = (
        base.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_hn"))
        .filter(F.col("_hn") > 1)
        .select("_h")
    )
    flagged = base.join(
        dup_hashes.withColumn("_is_dup", F.lit(1)), "_h", "left"
    )
    per_lang = flagged.groupBy("_src", "lang_pred").agg(
        F.count(F.lit(1)).alias("_ln")
    )
    lang_mix = per_lang.groupBy("_src").agg(
        F.concat_ws(
            "|",
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", "lang_pred", F.col("_ln").cast("string"))
                )
            ),
        ).alias("lang_mix")
    )
    stats = flagged.groupBy("_src").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("sum_tokens"),
        F.sum("_chars").alias("sum_chars"),
        F.sum(F.coalesce(F.col("_is_dup"), F.lit(0))).cast("long").alias(
            "n_dup_docs"
        ),
    )
    return stats.join(lang_mix, "_src").select(
        F.col("_src").alias(source_col),
        "n_docs", "sum_tokens", "sum_chars", "n_dup_docs", "lang_mix",
    )


def token_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str = "text",
    top_k: int = 50,
) -> DataFrame:
    """Token-frequency drift between two corpus snapshots — the
    release-audit twin of :func:`dataset_card`: which tokens' relative
    frequency moved most between version A and version B? Catches the
    regressions a row-count diff cannot (a scraper that started
    emitting boilerplate, a filter that silently dropped one domain, a
    tokenizer change upstream) before a training run does.

    Exact integer arithmetic end to end: per-corpus token counts, ppm
    relative frequencies (``cnt * 10^6 div total`` — non-negative, so
    truncating div is engine-portable), and the drift is the ppm delta.
    No floats, no log — the whole report value-hashes.

    Scale shape: one explode + partial-agg groupBy per corpus, a full
    outer join on token (hash-partitioned), a 1-row totals aggregate
    broadcast back (bytes, not data), and a top-k cut with an explicit
    tie-break (|delta| desc, token asc) — TakeOrderedAndProject, never
    a global sort.

    Returns ``(token, cnt_a, cnt_b, ppm_a, ppm_b, delta_ppm)``,
    ``top_k`` rows.
    """
    from pyspark.sql.functions import broadcast

    from jobinsight_data_pipeline_spark.operators.textstats import tokens

    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .where(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"cnt_{side}"))
        )

    joined = (
        counts(corpus_a, "a")
        .join(counts(corpus_b, "b"), "token", "full")
        .select(
            "token",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    totals = joined.agg(
        F.sum("cnt_a").alias("_tot_a"), F.sum("cnt_b").alias("_tot_b")
    )
    scored = joined.crossJoin(broadcast(totals)).select(
        "token",
        "cnt_a",
        "cnt_b",
        F.expr("cnt_a * 1000000 div _tot_a").alias("ppm_a"),
        F.expr("cnt_b * 1000000 div _tot_b").alias("ppm_b"),
        (
            F.expr("cnt_a * 1000000 div _tot_a")
            - F.expr("cnt_b * 1000000 div _tot_b")
        ).alias("delta_ppm"),
    )
    return scored.orderBy(
        F.abs(F.col("delta_ppm")).desc(), F.col("token").asc()
    ).limit(int(top_k))


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002) — the release-governance check before publishing or sharing a
    person-keyed dataset: every row must be indistinguishable from at
    least k-1 others on the quasi-identifier columns, or its class
    needs suppression/generalization.

    One partial-aggregating groupBy on the QI columns (map-side combine
    collapses to class cardinality per task — the class table, not the
    row table, crosses the shuffle); each class reports its size,
    whether it meets k, and its integer-ppm share of the dataset (the
    suppression cost if the class is dropped). Derived/generalized QIs
    (banded numerics, truncated zips) are just expressions in
    ``qi_cols``'s frame — build them in the projection before calling.
    The dataset total comes from the SAME class aggregate (Σ class_n)
    re-attached as a broadcast 1-row frame (the unigram_lm pattern) —
    one evaluation of the input, no separate count() scan, no
    stale-total risk against a re-evaluated source.
    """
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_n"))
    stats = classes.agg(
        F.greatest(F.sum("class_n"), F.lit(1)).alias("_total")
    )
    return classes.crossJoin(F.broadcast(stats)).select(
        *qi_cols,
        "class_n",
        (F.col("class_n") >= F.lit(int(k))).alias("meets_k"),
        F.expr("(class_n * 1000000) div _total").alias("share_ppm"),
    )


def iqr_outlier_fences(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    k_tenths: int = 15,
) -> DataFrame:
    """Tukey-fence outlier report per group: exact DISCRETE quartiles
    (the ceil(p·n)-th order statistic — no interpolation, so the
    quartile is an actual data value and every quantity stays integer),
    fences at ``q1 − k·IQR`` / ``q3 + k·IQR`` with ``k = k_tenths/10``
    evaluated in ×10 integer arithmetic (no fraction ever
    materializes), and per-group row/outlier counts — the data-quality
    anomaly screen run before a corpus or metrics release.

    Scale shape: ranks come from ``sampling.quantile_normalize``'s
    grouped histogram-CDF machinery (no per-group global window); the
    quartile extraction is an equi-join of the ranked frame against a
    groups-sized broadcast of (group, target ranks); the final verdict
    is one more partial-agg groupBy. ``value_col`` must be integral
    (quantize first — the house rule).

    Returns per group: ``n``, ``q1``, ``q3``, ``iqr``, ``lo_fence_x10``
    / ``hi_fence_x10`` (×10 integers), ``n_low`` / ``n_high`` outlier
    counts.
    """
    from pyspark.sql.functions import broadcast

    from jobinsight_data_pipeline_spark.operators.sampling import (
        quantile_normalize,
    )

    ranked = quantile_normalize(df, value_col, group_cols, id_cols)
    sizes = ranked.groupBy(*group_cols).agg(
        F.max("rank_in_group").alias("_n")
    )
    targets = sizes.select(
        *group_cols,
        "_n",
        # ceil(n/4) and ceil(3n/4) in pure integer arithmetic
        F.expr("(_n + 3) div 4").alias("_r1"),
        F.expr("(3 * _n + 3) div 4").alias("_r3"),
    )
    q1 = (
        ranked.join(broadcast(targets), group_cols)
        .where(F.col("rank_in_group") == F.col("_r1"))
        .select(*group_cols, F.col(value_col).alias("q1"))
    )
    q3 = (
        ranked.join(broadcast(targets), group_cols)
        .where(F.col("rank_in_group") == F.col("_r3"))
        .select(*group_cols, F.col(value_col).alias("q3"))
    )
    fences = (
        targets.join(broadcast(q1), group_cols)
        .join(broadcast(q3), group_cols)
        .select(
            *group_cols,
            F.col("_n").alias("n"),
            "q1",
            "q3",
            (F.col("q3") - F.col("q1")).alias("iqr"),
            (
                F.col("q1") * 10 - F.lit(int(k_tenths)) * (F.col("q3") - F.col("q1"))
            ).alias("lo_fence_x10"),
            (
                F.col("q3") * 10 + F.lit(int(k_tenths)) * (F.col("q3") - F.col("q1"))
            ).alias("hi_fence_x10"),
        )
    )
    return (
        df.join(broadcast(fences), group_cols)
        .groupBy(
            *group_cols, "n", "q1", "q3", "iqr",
            "lo_fence_x10", "hi_fence_x10",
        )
        .agg(
            F.sum(
                (F.col(value_col) * 10 < F.col("lo_fence_x10")).cast("long")
            ).alias("n_low"),
            F.sum(
                (F.col(value_col) * 10 > F.col("hi_fence_x10")).cast("long")
            ).alias("n_high"),
        )
    )
