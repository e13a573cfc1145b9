"""Physical-plan assertions: the scale posture is part of the contract.

These tests pin WHAT Catalyst plans, not just results: broadcast joins
for dims, column-pruned + filter-pushed scans, top-k without global
sort, and salted-join equivalence. A regression that silently turns a
broadcast join into a shuffled sort-merge join (or widens a scan) fails
CI here long before it burns a cluster."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.catalog.relational import (
    q_star_revenue,
    q_top10_customers,
)
from jobinsight_data_pipeline_spark.operators.skew import hot_keys, salted_join

SF = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_and_prunes(spark):
    plan = physical_plan(q_star_revenue(spark, SF))
    # every dim side must broadcast, not shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # lineitem scan must read only the 3 needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") > 100_000)
        .select("o_orderkey")
    )
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]" in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan


def test_topk_plans_as_take_ordered(spark):
    plan = physical_plan(q_top10_customers(spark, SF))
    assert "TakeOrderedAndProject" in plan  # true top-k, no global sort


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_spark.operators.bucketing import (
        join_is_shuffle_free,
        read_table,
        write_bucketed,
    )

    # warehouse dir is a static conf — conftest points it at a temp dir
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(orders, "orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        8,
        sort_cols=["o_custkey"],
    )
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "customer_b"), "o_custkey"
        )
        assert join_is_shuffle_free(joined), joined._jdf.queryExecution().executedPlan().toString()[:500]
        assert joined.count() == 1500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_join_equivalence(spark):
    # skewed left: one hot key with 500 rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 30)],
        "k int, payload int",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 30)], "k int, attr string"
    )
    plain = left.join(right, ["k"]).select("k", "payload", "attr")
    salted = salted_join(left, right, ["k"], buckets=8).select("k", "payload", "attr")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0

    hot = hot_keys(left, ["k"], min_count=100).collect()
    assert [(r["k"], r["n"]) for r in hot] == [(1, 500)]

    # salt actually spreads the hot key across buckets
    spread = (
        left.withColumn("_salt", F.pmod(F.xxhash64("k", "payload"), F.lit(8)))
        .filter("k = 1")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


@pytest.mark.sweep
def test_no_accidental_cartesian_or_nested_loop(spark):
    """Sweep EVERY catalog query's physical plan for join shapes that
    explode at scale. Cartesian/broadcast-nested-loop joins are allowed
    only where they are the algorithm (brute-force all-pairs scoring or
    a broadcast theta-join), never as an optimizer accident."""
    from jobinsight_data_pipeline_spark.catalog import build_catalog

    # intentional non-equi joins (documented in each operator):
    #   embedding_topk / *_near_dup: all-pairs cosine baseline vs a
    #     broadcast query side; asof_discount: broadcast offsets range
    #     tag; top10_avg_salary inherits the views' null-tolerant joins;
    #   minhash_lsh / embedding_lsh_near_dup: containment gates crossJoin
    #     three 1-row aggregates into the scalar verdict row (and their
    #     exact-twin halves are the sanctioned all-pairs baselines);
    #   unigram_lm: the smoothing denominator is a broadcast 1-row
    #     (total, vocab_size) aggregate crossJoined onto every word;
    #   bm25_search: the corpus stats (N, Σdl, per-term df) reduce to ONE
    #     row broadcast back onto the scan — bytes, not a join explosion
    #   quality_deciles / langid_curation: quantile_bins crossJoins its
    #     1-row (min, count, step) stats aggregate onto the corpus —
    #     bytes broadcast, not a join explosion (same class as
    #     unigram_lm's smoothing denominator)
    #   sketch_overlap: two 1-row sketch/exact aggregates crossJoin
    #     into the single audit row — bytes, not data
    allowed_nested = {
        "sketch_overlap",
        "quality_deciles",
        "snm_blocking",  # quantile_bins' 1-row stats crossJoin
        "token_drift",  # 1-row totals aggregate broadcast back
        "langid_curation",
        "unigram_lm",
        "bigram_lm",
        "corpus_refine",
        "bm25_search",
        "bm25_index_search",
        "retrieval_eval",  # embeds bm25_scores' 1-row stats crossJoin ×3
        "ann_recall_eval",  # cosine_topk broadcast query side + IVF route
        "ann_recall_residual",  # same class, residual (IVFADC) route
        "dedup_recall_eval",  # three 1-row metric aggregates crossJoined
        "dedup_band_curve",  # same class, three band configs unioned
        "ann_probe_curve",  # same class, four probe widths
        "ann_probe_residual",  # same class, residual route (r11 verdict fix)
        "zorder_digest",  # 1-row min/max quantizer stats broadcast

        "forget_bm25",  # same class: erased index x 1-row stats (r7)
        "embedding_topk",
        "hybrid_search",  # bm25 1-row stats + cosine_topk broadcast query side
        "sq8_search",  # 1-row stats table + broadcast query side
        "sq8_index_search",  # same class: persisted codes x 1-row stats
        "sq8_serve_many",  # same class: persisted codes x 1-row stats
        "skew_audit",  # 1-row totals aggregate broadcast back (r7 advice)
        "k_anonymity",  # same class: 1-row Σclass_n broadcast back
        "cms_heavy_hitters",  # cms_estimate's 1-row shape-guard broadcast
        "stream_cms",  # same class
        "temperature_mixture",  # 1-row Σisqrt broadcast back (r7)
        "epoch_plan",  # waterfill's per-round 1-row budget/agg broadcasts
        "dsir_select",  # 1-row pool-totals aggregate broadcast back (r9)
        "dsir_resample",  # same class + 1-row min-weight shift broadcast
        "collocations",  # 1-row (tot_u, tot_b) totals broadcast back
        "stream_dsir",  # dsir's 1-row totals class over merged state
        "pq_trained_topk",  # sanctioned broadcast query side (4 vectors)
        "corpus_build",  # capstone: embeds the mixture + waterfill class
        "hard_negatives",  # cosine_topk's sanctioned broadcast query side
        "mmr_rerank",  # broadcast query side + capped candidate self-join
        "mutual_knn",  # guarded all-pairs baseline (ANN stream at scale)
        "embedding_near_dup",
        "asof_discount",
        "minhash_lsh",
        "embedding_lsh_near_dup",
        "embedding_lsh_topk",
        "embedding_ivf_topk",
    }
    queries, _ = build_catalog()
    offenders: dict[str, str] = {}
    for name, fn in queries.items():
        plan = physical_plan(fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in allowed_nested:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, f"unexpected scale-hostile joins: {offenders}"


def test_pack_sequences_bucketed_avoids_global_sort(spark):
    """The bucketed cumsum's DATA path must never collapse to a single
    partition: the only SinglePartition exchange allowed is the tiny
    per-bucket offsets window (≤ P rows), which then broadcasts."""
    from jobinsight_data_pipeline_spark.operators.packing import pack_sequences

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 997).cast("int").alias("n_tokens")
    )
    out = pack_sequences(df, "n_tokens", 2048, ["doc_id"], bounds=[2500, 5000, 7500])
    plan = physical_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # exactly one SinglePartition exchange — the ≤P-row offsets frame
    assert plan.count("Exchange SinglePartition") <= 1
    # the row-level window partitions by bucket, not by a constant
    assert "hashpartitioning(_pid" in plan


def test_decontaminate_broadcasts_size_frame_only(spark):
    from jobinsight_data_pipeline_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    plan = physical_plan(
        ngram_containment_pairs(train, test, "doc_id", "text", n=3, threshold=0.8)
    )
    assert "BroadcastHashJoin" in plan  # per-test-doc sizes broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_single_shuffle(spark):
    from jobinsight_data_pipeline_spark.operators.sampling import (
        stratified_sample_exact,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "source")
    plan = physical_plan(stratified_sample_exact(docs, ["source"], "doc_id", 5))
    # one hash shuffle on the stratum for the window; nothing global
    assert plan.count("Exchange") == 1
    assert "Exchange SinglePartition" not in plan


def test_mixture_sample_and_pii_are_shuffle_free(spark):
    """Both are pure per-row projections (explode / regex chains): any
    Exchange in the plan means a regression re-introduced a shuffle."""
    from jobinsight_data_pipeline_spark.operators.sampling import mixture_sample
    from jobinsight_data_pipeline_spark.operators.textstats import redact_pii

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p1 = physical_plan(
        mixture_sample(docs.select("doc_id", "source"), "source", {"src0": 2.5}, "doc_id")
    )
    assert "Exchange" not in p1
    p2 = physical_plan(redact_pii(docs.select("doc_id", "text"), "text"))
    assert "Exchange" not in p2


def test_semantic_dedup_shuffles_on_cell_only(spark):
    """The pair join must hash-shuffle on the cluster key — never a
    cartesian/nested-loop all-pairs plan — and the centroid argmax must
    stay a scan-fused projection (no extra exchange before the join)."""
    from jobinsight_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
        unit_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = physical_plan(
        semantic_dedup(emb, threshold=0.4, centroids=unit_centroids(64, 8, seed=11))
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the pair join is keyed on the cluster cell — broadcast-hash at
    # small scale (the plan here) or shuffled-hash at corpus scale;
    # either way an equi-join on cell, never all-pairs
    assert "HashJoin [cell" in plan or "hashpartitioning(cell" in plan


def test_shuffle_shard_bucketed_avoids_global_sort(spark):
    """Same contract as pack_sequences: the only SinglePartition
    exchange is the ≤P-row bucket-offsets frame; row data ranks inside
    hash buckets."""
    from jobinsight_data_pipeline_spark.operators.packing import shuffle_shard

    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    out = shuffle_shard(df, "k", shard_size=512, bounds=["4", "8", "c"])
    plan = physical_plan(out)
    assert plan.count("Exchange SinglePartition") <= 1
    assert "hashpartitioning(_pid" in plan


def test_duplicate_spans_skew_tolerant_shape(spark):
    """Duplicated hashes come from a partial-aggregated groupBy and flag
    positions via an equi-semi-join (AQE can split a skewed probe side;
    a count-over-window would pile a hot boilerplate window onto one
    sort task) — and nothing runs single-partition or all-pairs."""
    from jobinsight_data_pipeline_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(duplicate_spans(docs, "doc_id", "text", n=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "LeftSemi" in plan
    assert "hashpartitioning(doc" in plan


def test_blocklist_dataframe_path_is_equi_join(spark):
    """The DataFrame blocklist must plan as equi anti/semi joins on the
    exploded domain-suffix key — never a BroadcastNestedLoopJoin over an
    OR-of-endswith predicate (O(rows x blocklist) per partition)."""
    from jobinsight_data_pipeline_spark.operators.urls import (
        filter_blocked_domains,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "url", F.concat(F.lit("https://h"), F.col("doc_id"), F.lit(".example.com/p"))
    )
    bl = spark.createDataFrame(
        [(f"d{i}.com",) for i in range(50)] + [("example.com",)],
        "domain string",
    )
    plan = physical_plan(filter_blocked_domains(df, bl))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_cap_shuffle_budget(spark):
    """The hot-shingle cap costs at most one window shuffle per self-join
    side in the INITIAL plan (AQE's exchange reuse collapses the twin at
    runtime — wall-clock measured at parity with uncapped, 1.21s vs
    1.36s at sf0.1); never a join explosion."""
    from jobinsight_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    capped = physical_plan(
        ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    )
    uncapped = physical_plan(
        ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, max_shingle_freq=None
        )
    )
    assert capped.count("Exchange") <= uncapped.count("Exchange") + 2
    assert "CartesianProduct" not in capped
    assert "BroadcastNestedLoopJoin" not in capped


def test_bm25_topk_scan_fused_heap_topk(spark):
    """BM25's plan contract: per-term tf stays a scan-fused projection
    (no explode, no token join), the corpus-stats side is a single-row
    broadcast, and top-k is TakeOrderedAndProject — per-partition heaps,
    never a global sort."""
    from jobinsight_data_pipeline_spark.operators.ranking import bm25_topk

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(bm25_topk(df, ["spark", "vector"], k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no posexplode in the fixed-query form
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan
    # only the stats aggregation exchanges data (partial → single row)
    assert plan.count("Exchange hashpartitioning") == 0


def test_dedup_paragraphs_partial_aggregates_not_window(spark):
    """The per-hash stats must come from a partial-aggregating groupBy +
    join-back, never a Window partitioned by the hash: a window ships
    every occurrence of a hot boilerplate hash to one task, the groupBy
    ships one min-struct per map partition."""
    from jobinsight_data_pipeline_spark.operators.textstats import (
        dedup_paragraphs,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet").selectExpr(
        "doc_id", "text"
    )
    for mode, kw in (("keep_first", {}), ("drop_common", {"max_df": 3})):
        plan = physical_plan(dedup_paragraphs(df, mode=mode, **kw))
        # the only Window allowed is none at all on this path
        assert "Window" not in plan, mode
        assert "partial_min" in plan or "partial_count" in plan or (
            "HashAggregate" in plan
        ), mode
        assert "CartesianProduct" not in plan, mode


def test_classifier_inference_is_shuffle_free(spark):
    """Classifier inference must be a pure scan-fused projection: no
    Exchange, no Generate (explode), no join — the weight table is a
    parsed literal inside the fold, not a broadcast side."""
    from jobinsight_data_pipeline_spark.operators.classifier import (
        seeded_int_weights,
        with_quality_classification,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = with_quality_classification(
        df, "text", seeded_int_weights(256, seed=11), bias=7
    )
    plan = physical_plan(out)
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "Join" not in plan


def test_pq_paths_scan_fused(spark):
    """PQ encode: the codebook is a parsed literal (never a join side),
    and the operator owns its scan parallelism (r13) — a single-split
    input gains exactly the round-robin widen Exchange (the interpreted
    argmin folds would otherwise run on ONE task no matter the caller),
    while an already-wide input adds no shuffle at all. ADC top-k must
    plan per-partition heaps."""
    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )
    from jobinsight_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    cb = pq_codebooks()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    enc = pq_encode(emb, cb)
    plan = physical_plan(enc)
    # the sf0.001 embeddings parquet is a single split: the operator
    # must insert its own widen (one round-robin exchange, no join)
    assert plan.count("Exchange") == 1, plan
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan
    assert "Join" not in plan

    wide = widen_for_cpu(emb)
    plan_wide = physical_plan(pq_encode(wide, cb))
    # already-wide input: the internal widen is a no-op — still exactly
    # the one caller-side exchange, nothing added by the operator
    assert plan_wide.count("Exchange") == 1, plan_wide

    top = pq_adc_topk(enc, [0.1] * 64, cb, k=5)
    plan = physical_plan(top)
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_skew_isolated_join_equivalence_and_shape(spark):
    """Hot-key isolation must return exactly the plain join's rows, put
    the hot sliver on a broadcast join, and fall back cleanly when
    nothing is hot."""
    from jobinsight_data_pipeline_spark.operators.skew import (
        skew_isolated_join,
    )

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 30)],
        "k int, payload int",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 30)], "k string, attr string"
    ).selectExpr("CAST(k AS INT) AS k", "attr")
    plain = left.join(right, ["k"]).select("k", "payload", "attr")
    iso = skew_isolated_join(left, right, ["k"], min_count=100).select(
        "k", "payload", "attr"
    )
    assert plain.exceptAll(iso).count() == 0
    assert iso.exceptAll(plain).count() == 0
    assert "BroadcastHashJoin" in physical_plan(iso)

    # left join keeps unmatched left rows exactly once
    lbig = left.unionAll(spark.createDataFrame([(99, 7)], "k int, payload int"))
    iso_l = skew_isolated_join(lbig, right, ["k"], min_count=100, how="left")
    plain_l = lbig.join(right, ["k"], "left")
    assert iso_l.count() == plain_l.count()

    # nothing hot -> plain join fallback
    cold = skew_isolated_join(left.filter("k > 1"), right, ["k"], min_count=100)
    assert cold.count() == left.filter("k > 1").join(right, ["k"]).count()


def test_bm25_index_bucketed_postings_prune_and_group_locally(spark):
    """The ad-hoc BM25 story at scale: postings persisted bucketed+sorted
    by term answer a query with the term filter REACHING the scan and no
    extra exchange for the per-term aggregations beyond the final doc
    grouping."""
    from jobinsight_data_pipeline_spark.operators.ranking import (
        bm25_topk_indexed,
        build_inverted_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    postings, lens = build_inverted_index(docs)
    try:
        from jobinsight_data_pipeline_spark.operators.bucketing import (
            read_table,
            write_bucketed,
        )

        write_bucketed(postings, "postings_b", ["term"], 8, sort_cols=["term"])
        pb = read_table(spark, "postings_b")
        top = bm25_topk_indexed(pb, lens, ["spark", "vector"], k=5)
        plan = physical_plan(top)
        # the term filter is applied at/next to the bucketed scan, and
        # the pivot still heap-selects top-k
        assert "TakeOrderedAndProject" in plan
        assert "term" in plan and "IN (spark,vector)" in plan.replace("'", "")
        assert top.count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS postings_b")


def test_ivf_pq_many_dynamic_partition_pruning(spark, tmp_path):
    """The batched serve path at scale: joining the broadcast
    (query, cell) probe frame onto the cell-partitioned index must give
    the scan a DYNAMIC partition-pruning expression on cell — at 100 TB
    only the probe-cell directories are read, even though the cell list
    is computed at runtime from the query batch."""
    from jobinsight_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_topk_many,
        pq_codebooks,
        unit_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents, cb = unit_centroids(64, 16, seed=11), pq_codebooks()
    idx_path = str(tmp_path / "idx")
    build_ivf_pq_index(emb, cents, cb).write.partitionBy("cell").parquet(idx_path)
    index = spark.read.parquet(idx_path)
    queries = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ivf_pq_topk_many(index, queries, cents, cb, k=5, n_probe=3)
    plan = physical_plan(top)
    assert "dynamicpruningexpression" in plan.lower(), plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert top.count() == 4 * 5


def test_ivf_pq_index_partition_prunes_probe_cells(spark, tmp_path):
    """The IVF-PQ serve path at scale: the index persisted PARTITIONED BY
    cell answers a query by reading ONLY the n_probe probe-cell
    partitions — the cell filter must land in PartitionFilters (directory
    pruning, zero IO for the other n_lists − n_probe cells), not as a
    post-scan predicate, and the ADC ranking still heap-selects top-k."""
    from jobinsight_data_pipeline_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_topk_indexed,
        pq_codebooks,
        probe_cells,
        unit_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = unit_centroids(64, 16, seed=11)
    cb = pq_codebooks()
    idx_path = str(tmp_path / "ivfpq_idx")
    build_ivf_pq_index(emb, cents, cb).write.partitionBy("cell").parquet(idx_path)

    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    index = spark.read.parquet(idx_path)
    top = ivf_pq_topk_indexed(index, query, cents, cb, k=5, n_probe=4)
    plan = physical_plan(top)
    probes = probe_cells(query, cents, 4)
    assert "TakeOrderedAndProject" in plan
    # the cell predicate prunes PARTITIONS (directory-level), it is not a
    # row filter after a full scan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cell" in pf.group(1), plan
    assert all(str(c) in pf.group(1) for c in probes), (probes, pf.group(1))
    # and the scan reads only id + codes besides the partition column
    assert "ReadSchema: struct<vec_id:bigint,codes:array<int>>" in plan, plan
    assert top.count() == 5


def test_kmeans_assign_scan_fused_and_update_single_shuffle(spark):
    """Distributed k-means scale shape (operators/clustering.py):
    assignment against the broadcast literal model is a pure projection
    (no Exchange/Join — the centroid matrix lives inside the transform
    fold), and one Lloyd update round is exactly one hash-partitioned
    partial aggregation over (cell, dim)."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_spark.operators.clustering import (
        _assign_expr,
        kmeans_assign,
        quantize_shifted,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [[i * 1000 + j for j in range(64)] for i in range(8)]
    plan = physical_plan(kmeans_assign(emb, cents))
    assert "Exchange" not in plan
    assert "Join" not in plan
    # one update round: scan-fused assign + posexplode + groupBy agg
    shifted = [[x + 10**6 for x in c] for c in cents]
    q = emb.select(quantize_shifted("embedding").alias("__p"))
    cell, _ = _assign_expr(shifted)
    upd = (
        q.select(cell.alias("cell"), F.posexplode("__p").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    uplan = physical_plan(upd)
    assert uplan.count("Exchange hashpartitioning") == 1
    assert "partial" in uplan.lower()  # map-side combine before the shuffle


def test_quantile_bins_no_corpus_wide_single_partition(spark):
    """quantile_bins' only single-partition step is the window over the
    bounded bucket HISTOGRAM (<= hist_buckets rows) — the corpus itself
    must never collapse to one partition the way a global ORDER BY
    window would. The plan shuffles the corpus by bucket hash instead."""
    from jobinsight_data_pipeline_spark.operators.sampling import (
        quantile_bins,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    plan = physical_plan(quantile_bins(docs, "n_chars", ["doc_id"]))
    # corpus-side rank shuffles on the bucket hash, and its row_number
    # window PARTITIONS by bucket — a regression to a global ORDER BY
    # window would drop the bucket from the window spec
    assert "Exchange hashpartitioning(_qb_bucket" in plan
    assert "windowspecdefinition(_qb_bucket" in plan
    # the only SinglePartition exchanges are bounded frames: the 1-row
    # stats aggregate (feeds two branches) and the <=hist_buckets-row
    # histogram cumsum
    assert plan.count("Exchange SinglePartition") <= 3


def test_interval_join_plans_as_hash_join_not_nested_loop(spark):
    """The banded interval join must plan as an equi hash join on the
    band — a naive range predicate degrades to
    BroadcastNestedLoopJoin/CartesianProduct, the O(n*m) shape banding
    exists to kill."""
    from jobinsight_data_pipeline_spark.operators.asof import interval_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "l_orderkey",
        "CAST(datediff(l_shipdate, DATE '1970-01-01') AS LONG) AS s",
    ).selectExpr("l_orderkey", "s", "s + 30 AS e")
    pts = spark.read.parquet(f"{SF}/orders.parquet").selectExpr(
        "o_orderkey",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS LONG) AS p",
    )
    plan = physical_plan(interval_join(pts, li, "p", "s", "e", band_width=32))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_resample_ffill_single_data_shuffle_no_single_partition(spark):
    """resample_ffill's data path: the grid + versions union fills via
    ONE window partitioned by key — no corpus-wide SinglePartition, no
    per-grid-point range join (the plan must contain zero NestedLoop
    and its windows must partition by the key)."""
    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_spark.catalog import load
    from jobinsight_data_pipeline_spark.operators.timeseries import (
        epoch_micros,
        resample_ffill,
    )

    ev = load(spark, SF, "events")["events"].select(
        "user_id",
        epoch_micros("ts").alias("m"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("cents"),
        "event_id",
    )
    plan = physical_plan(
        resample_ffill(ev, "m", "user_id", "cents", 900_000_000, "event_id")
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(user_id" in plan


def test_orc_scan_pushdown_and_pruning(spark, tmp_path):
    """The ORC read path must behave like the parquet one at scale:
    predicate pushdown reaches the scan and the read schema prunes to
    the referenced columns."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = str(tmp_path / "docs_orc")
    docs.write.orc(p)
    df = (
        spark.read.orc(p)
        .filter(F.col("n_chars") > 500)
        .select("doc_id")
    )
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan


def test_ohlc_bars_is_single_shuffle(spark):
    """The whole bar table comes from ONE partial-aggregating groupBy:
    struct-argmin open/close must not re-introduce a window or a
    second shuffle."""
    from jobinsight_data_pipeline_spark.operators.timeseries import ohlc_bars

    df = spark.range(0, 1000).selectExpr(
        "id % 7 AS k", "id * 13 AS m", "id AS tb", "(id * 31) % 100 AS cents"
    )
    plan = physical_plan(ohlc_bars(df, "m", ["k"], "cents", "tb", 100))
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cms_build_is_single_bounded_shuffle(spark):
    """The sketch's contract: one partial-agg shuffle whose payload is
    cell rows (<= depth*width per task), never the key stream."""
    from jobinsight_data_pipeline_spark.operators.sketches import cms_build

    df = spark.range(0, 1000).selectExpr("CAST(id % 97 AS STRING) AS k")
    plan = physical_plan(cms_build(df, "k", depth=4, width=64))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "Exchange SinglePartition" not in plan


def test_pq_trained_fit_jobs_independent_of_subspace_count(spark):
    """train_pq_codebooks_quantized's one-job-per-iteration fusion,
    pinned at the SCHEDULER level (the r9 verdict's optional hardening):
    all m subspace fits advance inside the same per-iteration job, so
    the Spark job count must be flat in m and linear in iterations
    (measured: 3 fixed jobs — widen/localCheckpoint + seed collect +
    AQE's extra stage-job — plus 2 per iteration under AQE). A refactor
    that quietly serialized the m subspaces into per-slice fits would
    multiply the per-iteration term by m and fail both assertions. The
    m-sliced RESULT equality is pinned separately
    (test_operators.test_pq_trained_books_equal_independent_sliced_fits)."""
    from jobinsight_data_pipeline_spark.operators.clustering import (
        train_pq_codebooks_quantized,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    emb.count()  # warm the file index so scan jobs don't skew counts

    def jobs(tag: str, m: int, iterations: int) -> int:
        sc = spark.sparkContext
        sc.setJobGroup(tag, "pq fusion job-count pin")
        try:
            train_pq_codebooks_quantized(
                emb, m=m, k=4, iterations=iterations, dim=64
            )
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    j_m2 = jobs("pqfuse-m2", m=2, iterations=2)
    j_m8 = jobs("pqfuse-m8", m=8, iterations=2)
    assert j_m8 == j_m2, "job count grew with m: subspace fits serialized"
    j_i1 = jobs("pqfuse-i1", m=4, iterations=1)
    j_i3 = jobs("pqfuse-i3", m=4, iterations=3)
    per_iter = (j_i3 - j_i1) / 2
    assert per_iter <= 2, f"per-iteration job cost {per_iter} > 2"
