"""BM25 keyword relevance over a document corpus — the retrieval
primitive a training-data pipeline uses for targeted corpus slicing
(pull the docs most relevant to a benchmark topic, rank candidates for
human audit) and the query-side twin of the dedup family's
inverted-index machinery.

Shape: for a FIXED small query (a handful of terms), the whole scorer is
a single scan — per-term term frequencies are array-filter expressions
fused into the projection (no explode, no join), corpus statistics
(N, Σdl, per-term document frequencies) reduce to ONE row, and that row
broadcasts back via the established 1-row crossJoin pattern. Zero wide
shuffles; the only exchange is the global aggregation's partial→final
step. At 100 TB that is the plan you want: the scan dominates, the
stats row is bytes.

For ad-hoc / many-term query workloads build the inverted index once
(posexplode tokens → (term, doc, tf) with df alongside) and equi-join
queries against it instead; this module deliberately implements the
fixed-query scan form because it is the one that needs no index
maintenance.

Exactness across engines: ``+ * /`` on doubles are IEEE-identical
everywhere, but ``ln`` is correctly-rounded in neither Java nor DuckDB
(measured: 40/501 idf arguments differ by 1 ulp between Spark and
DuckDB on this box). The idf is therefore quantized —
``round(ln(x), idf_decimals)`` — computed identically on both engines;
downstream arithmetic then stays bit-identical. The catalog gate's
companion test audits the actual per-term idf arguments of the corpus
for boundary proximity, the same boundary-audit discipline as the
round-4 avg gates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jobinsight_data_pipeline_spark.operators.textstats import tokens, word_count

#: BM25 defaults (Robertson/Sparck Jones; the values ES/Lucene ship).
DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _term_tf(text_col: str, term: str) -> Column:
    # scan-fused exact term count: filter the token array by equality —
    # stays inside whole-stage codegen, no explode. The lambda must stay
    # single-parameter: Spark treats a 2-arg HOF lambda as (element,
    # index), so a `t=term` default would bind the array INDEX.
    return F.size(F.filter(tokens(text_col), lambda w: w == F.lit(term)))


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    idf_decimals: int = 6,
) -> DataFrame:
    """Score every document against ``terms`` with BM25.

    Returns (id_col, dl, tf_<i> per term, score) where ``score`` is
    ``Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf_t = round(ln((N − df_t + 0.5)/(df_t + 0.5) + 1), idf_decimals)``
    (the Lucene non-negative idf form). ``dl`` is the whitespace token
    count and ``avgdl = Σdl/N`` (one exact double division).

    The per-term partial scores are added LEFT-TO-RIGHT in ``terms``
    order — mirror the same chain in any cross-engine replay, since
    float addition does not commute across orders.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    reserved = {"dl", "score", *[f"tf_{i}" for i in range(len(terms))]}
    if id_col in reserved:
        raise ValueError(
            f"bm25_scores emits column {id_col!r}; rename the id column"
        )

    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    # widen (per-row regex tf over a possibly single-split scan), then
    # pin the narrow (id, dl, tf…) frame once: both the corpus-stats
    # aggregation and the scored side consume it, so the plan would
    # otherwise run the full text scan + term regexes twice — the
    # guide-§8 shape: decide with small rows, scan heavy text once.
    base = (
        widen_for_cpu(df)
        .select(
            F.col(id_col),
            word_count(F.col(text_col)).cast("long").alias("dl"),
            *[
                _term_tf(text_col, t).cast("long").alias(f"tf_{i}")
                for i, t in enumerate(terms)
            ],
        )
        .localCheckpoint(eager=True)
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n
    norm = F.lit(float(k1)) * (
        F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )

    def term_score(i: int) -> Column:
        dfreq = F.col(f"_df_{i}").cast("double")
        idf = F.round(
            F.log((n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)) + F.lit(1.0)),
            idf_decimals,
        )
        tf = F.col(f"tf_{i}").cast("double")
        return idf * (tf * F.lit(float(k1) + 1.0)) / (tf + norm)

    score = reduce(lambda a, c: a + c, [term_score(i) for i in range(len(terms))])
    from jobinsight_data_pipeline_spark.operators.components import (
        register_pins,
    )

    # the scored frame reads the pinned base — callers free the pin via
    # components.free_pins(result) after the last action (r13)
    return register_pins(
        scored.withColumn("score", score).drop(
            "_n", "_sumdl", *[f"_df_{i}" for i in range(len(terms))]
        ),
        base,
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-``k`` documents by BM25 score, ties broken by ``id_col``
    ascending so the cut is deterministic. Plans as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    scored = bm25_scores(df, terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    from jobinsight_data_pipeline_spark.operators.components import (
        register_pins,
    )

    return register_pins(
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k),
        *getattr(scored, "_pinned_checkpoints", []),
    )


def build_inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Materialize the corpus's inverted index: ``postings`` (term, doc,
    tf) and ``lens`` (doc, dl) — built ONCE (one tokenize+explode pass,
    one shuffle on (term, doc)), then every ad-hoc query is an
    equi-filter + small aggregation instead of a corpus rescan. Persist
    ``postings`` bucketed (or partitioned) BY TERM so query-term filters
    prune at the scan; that turns a 100 TB corpus question into reading
    a handful of term slices."""
    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    lens = df.select(
        F.col(id_col).alias("doc"),
        word_count(F.col(text_col)).cast("long").alias("dl"),
    )
    postings = (
        widen_for_cpu(df.where(F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, lens


def bm25_topk_indexed(
    postings: DataFrame,
    lens: DataFrame,
    terms: list[str],
    k: int,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    idf_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` BM25 against a prebuilt inverted index — the ad-hoc /
    many-term query path :func:`bm25_scores` points at. Work is
    proportional to the query terms' postings, not the corpus: filter
    postings to the terms, pivot to fixed per-term tf columns (pinning
    the term-summation order so results are BIT-IDENTICAL to the scan
    path — a bag-of-rows SUM would re-order float addition), join doc
    lengths, score, heap top-k.

    Contract difference vs the scan path: only documents containing at
    least one query term are ranked (an all-zero-score doc has no
    postings row). Scores for every returned doc are bit-equal to
    :func:`bm25_scores`; the catalog gates pin the two paths to ONE
    shared oracle.
    """
    if not terms:
        raise ValueError("bm25_topk_indexed needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")

    hits = postings.filter(F.col("term").isin(*terms))
    # one row: N and Σdl from the lens side, per-term document
    # frequencies from the filtered postings ((term, doc) is unique, so
    # df_t = count of that term's rows)
    corpus = lens.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    dfs = hits.agg(
        *[
            F.count(F.when(F.col("term") == t, F.lit(1))).alias(f"_df_{i}")
            for i, t in enumerate(terms)
        ]
    )
    stats = corpus.crossJoin(dfs)

    per_doc = hits.groupBy("doc").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    scored = (
        per_doc.join(lens, "doc")
        .crossJoin(F.broadcast(stats))
    )
    n = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n
    norm = F.lit(float(k1)) * (
        F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl").cast("double") / avgdl
    )

    def term_score(i: int) -> Column:
        dfreq = F.col(f"_df_{i}").cast("double")
        idf = F.round(
            F.log((n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5)) + F.lit(1.0)),
            idf_decimals,
        )
        tf = F.col(f"tf_{i}").cast("double")
        return idf * (tf * F.lit(float(k1) + 1.0)) / (tf + norm)

    score = reduce(lambda a, c: a + c, [term_score(i) for i in range(len(terms))])
    return (
        scored.withColumn("score", score)
        .drop("_n", "_sumdl", *[f"_df_{i}" for i in range(len(terms))])
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09) of
    several ranked candidate lists — THE standard hybrid-retrieval
    combiner (lexical BM25 + semantic ANN): each list contributes
    ``1/(rrf_k + rank)`` for every item it ranked, items sum their
    contributions, and the fused order is that sum descending.

    Contributions are exact integers — ``1_000_000 div (rrf_k + rank)``
    micro-units — so the fused score is engine-portable and free of the
    float-summation-order flake class (CLAUDE.md); with the standard
    rrf_k=60 the micro-floor keeps distinct ranks' contributions
    distinct through rank ~940. Ties break on ``id_col`` ascending.

    Scale shape: each input list is already top-k-sized (the expensive
    retrieval happened upstream); fusion is a full-outer join chain on
    the item id across k-sized frames, a projection, and a
    TakeOrderedAndProject — driver-trivial at any corpus size.

    Returns ``id_col``, one nullable ``<name>_rank`` column per input
    list, ``rrf_micro``, and the fused ``rank``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused: DataFrame | None = None
    names = []
    for name, df in rankings:
        names.append(name)
        side = df.select(
            F.col(id_col),
            F.col(rank_col).cast("long").alias(f"{name}_rank"),
        )
        fused = side if fused is None else fused.join(side, id_col, "full")
    contrib = [
        F.coalesce(
            F.expr(f"1000000 div ({int(rrf_k)} + {n}_rank)"), F.lit(0)
        )
        for n in names
    ]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    scored = fused.select(
        id_col, *[f"{n}_rank" for n in names], total.alias("rrf_micro")
    )
    w = Window.orderBy(F.desc("rrf_micro"), F.asc(id_col))
    # the window is single-partition by construction: the input is the
    # union of top-k lists (≤ Σk rows), not corpus data
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ndcg_discounts_micro(k: int) -> list[int]:
    """The binary-gain NDCG discount table in micro-units —
    ``disc[i] = floor(10⁶ / log2(i + 1))`` for 1-based rank i —
    computed HOST-side and inlined as literals everywhere it is used
    (Spark plan AND any cross-engine replay), so no engine log function
    ever runs: the 1-ulp ln/log2 wobble class (CLAUDE.md) is designed
    out rather than boundary-audited."""
    import math

    return [int(10**6 // math.log2(i + 1)) for i in range(1, k + 1)]


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-quality metrics in EXACT integer micro-units
    — the evaluation surface a retrieval/training pipeline runs after
    every index or embedding change: MRR@k, binary-gain NDCG@k, and
    recall@k.

    ``ranked`` is (query, doc, 1-based rank) — any ranker's top list;
    ``qrels`` is (query, doc) binary relevance. All arithmetic is
    integer: the DCG discount table is a host-computed literal
    (:func:`ndcg_discounts_micro`), IDCG is its prefix sum at
    ``min(n_rel, k)``, and the ratios are ``(x · 10⁶) div y`` — so the
    metric table hashes identically on any engine/partitioning.
    Queries with no relevant docs report zero metrics (rather than
    dividing by zero). Scale shape: one equi-join of the top lists
    (≤ Σk rows per query) against qrels plus two partial-agg
    shuffles keyed by query — never corpus-sized."""
    if k < 1:
        raise ValueError("retrieval_metrics: k must be >= 1")
    disc = ndcg_discounts_micro(k)
    prefix = []
    s = 0
    for d in disc:
        s += d
        prefix.append(s)
    disc_lit = "array(" + ",".join(f"{d}L" for d in disc) + ")"
    pre_lit = "array(" + ",".join(f"{p}L" for p in prefix) + ")"

    rel_totals = qrels.groupBy(F.col(query_col).alias("query")).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    rel_side = qrels.select(
        F.col(query_col).alias("__rq"), F.col(doc_col).alias("__rd")
    )
    top = ranked.where(F.col(rank_col) <= k)
    hits = top.join(
        rel_side,
        (top[query_col] == rel_side["__rq"])
        & (top[doc_col] == rel_side["__rd"]),
    ).select(F.col(query_col).alias("query"), F.col(rank_col).alias("__r"))
    hit_aggs = hits.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_rel_topk"),
        F.min("__r").alias("__first"),
        F.sum(F.expr(f"element_at({disc_lit}, CAST(__r AS INT))")).alias(
            "dcg_micro"
        ),
    )
    out = rel_totals.join(hit_aggs, "query", "left").select(
        "query",
        "n_rel",
        F.coalesce("n_rel_topk", F.lit(0).cast("long")).alias("n_rel_topk"),
        F.coalesce(
            F.expr("1000000L div __first"), F.lit(0).cast("long")
        ).alias("mrr_micro"),
        F.coalesce("dcg_micro", F.lit(0).cast("long")).alias("dcg_micro"),
        # element_at is 1-based and ANSI-throws at index 0 — a query
        # with no relevant docs gets idcg 0 (and ndcg 0 below)
        F.when(
            F.col("n_rel") > 0,
            F.expr(
                f"element_at({pre_lit}, CAST(least(n_rel, {k}) AS INT))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("idcg_micro"),
    )
    return out.select(
        "query",
        "n_rel",
        "n_rel_topk",
        "mrr_micro",
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.expr("(dcg_micro * 1000000L) div idcg_micro"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ndcg_micro"),
        F.when(
            F.col("n_rel") > 0,
            F.expr("(n_rel_topk * 1000000L) div n_rel"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("recall_micro"),
    )
