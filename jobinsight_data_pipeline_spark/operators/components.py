"""Connected components over near-duplicate pair graphs.

Pair emitters (operators/dedup.py: MinHash-LSH, SimHash, n-gram Jaccard)
produce EDGES; corpus-level dedup needs CLUSTERS — transitively closed
groups with one canonical survivor each (A~B and B~C must collapse to
one document even when A~C was never emitted). The reference has no
graph step (its dedupe is a per-key drop_duplicates,
/root/reference/src/crawler/parser.py:455); this operator is part of the
training-data namespace the engine adds on top.

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC 2014) — each round
is two groupBy-min shuffles over the edge list, and the edge set
contracts toward a star forest rooted at each component's minimum node
id in O(log²) rounds regardless of graph diameter. That diameter
independence is the 100 TB property: naive label propagation needs
diameter-many rounds, and near-dup chains (A~B~C~…) can be long; the
star steps short-circuit them. No step materializes a component in one
task, so skewed giant clusters (boilerplate duplicated millions of
times) stay distributed until the final star edges.

Driver-side loop state is two scalars per round (edge count + order-
insensitive xor fingerprint) plus an exact set-equality probe on the
final round — bounded regardless of data size. Lineage is truncated
every round with localCheckpoint (on a multi-executor cluster, point
spark.sql.checkpoint.dir at durable storage and use checkpoint()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u}).

    ``sym`` is the symmetric edge list (both directions present)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least("m", F.col("u")).alias("v"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller neighbor (and u itself) to the minimum.

    ``edges`` is oriented large→small (u > v for every row)."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        edges.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return relink.unionByName(mins.select("u", F.col("m").alias("v"))).distinct()


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint'd DataFrame's storage blocks NOW.

    The checkpointed data lives in the RDD behind the plan's LogicalRDD;
    ``df.unpersist()`` only consults the CacheManager and leaves those
    blocks untouched (verified empirically). The caller must never use
    ``df`` again — the lineage was truncated, so the blocks are the only
    copy. Best-effort: any plan-shape surprise just leaves the blocks
    for the context cleaner."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def register_pins(result: DataFrame, *pins: DataFrame) -> DataFrame:
    """Record the eager localCheckpoints ``result`` still reads on the
    returned frame itself (``result._pinned_checkpoints``). Operators
    whose OUTPUT references a per-invocation pin cannot free it before
    returning (the blocks are the only copy once lineage is truncated);
    in a long-lived session each invocation would otherwise leak
    block-manager storage until session end (guide §5). Callers free
    with :func:`free_pins` after the last action on the result."""
    existing = list(getattr(result, "_pinned_checkpoints", []))
    result._pinned_checkpoints = existing + list(pins)
    return result


def free_pins(df: DataFrame) -> None:
    """Release every pin :func:`register_pins` recorded on ``df`` (and
    nothing else). The frame must not be used again afterwards — the
    pins are the only copy of its truncated lineage. Best-effort and
    idempotent."""
    for p in getattr(df, "_pinned_checkpoints", []) or []:
        _free_local_checkpoint(p)
    df._pinned_checkpoints = []


def connected_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Label every node of the pair graph with its component id.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id in the connected component — deterministic, join-stable, and
    engine-portable (no generated ids).

    ``stats`` (optional dict, filled in place) records ``rounds`` and
    per-round ``edge_counts`` — the observability hook the adversarial
    scale tests use to pin convergence (rounds stay O(log n) on a
    diameter-n chain; intermediate edge counts stay O(nodes), never
    quadratic) without changing the return contract.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
    )
    # checkpoint BEFORE deriving nodes: both the iteration and the final
    # label join must read the materialized edge list, not re-run the
    # (possibly expensive) upstream pair pipeline
    edges = edges.localCheckpoint(eager=True)
    first = edges
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    prev_sig = None
    if stats is not None:
        stats["rounds"] = 0
        stats["edge_counts"] = []
    for _ in range(max_iter):
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        new_edges = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        row = new_edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("sig"),
        ).first()
        sig = (row["n"], row["sig"])
        if stats is not None:
            stats["rounds"] += 1
            stats["edge_counts"].append(row["n"])
        done = sig == prev_sig and new_edges.exceptAll(edges).isEmpty()
        # free the superseded generation's checkpoint blocks — NOT the
        # first (the `nodes` plan reads it) and NOT the one just built.
        # df.unpersist() can't reach localCheckpoint storage (the blocks
        # belong to the plan's LogicalRDD, not the CacheManager), so
        # without this the loop accumulates O(rounds x edges) executor
        # storage that only a much later context-cleaner GC reclaims.
        if edges is not first:
            _free_local_checkpoint(edges)
        prev_sig = sig
        edges = new_edges
        if done:
            # fingerprint + exact set-equality probe both converged
            break

    # star forest: every non-root points at its component's minimum
    return nodes.join(
        edges.select(F.col("u").alias("node"), F.col("v").alias("root")),
        "node",
        "left",
    ).select("node", F.coalesce("root", "node").alias("component"))


def dedup_clusters(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Near-dup pairs → per-document cluster assignment.

    Returns ``(doc_id, component, cluster_size, is_canonical)``: one row
    per document that appears in any pair, where the canonical survivor
    is the smallest doc id of its transitive cluster (the deterministic
    keep-min rule the exact-dedup path uses, operators/dedup.py).
    Documents in no pair are implicitly their own canonical — callers
    drop ``is_canonical = false`` rows from the corpus.
    """
    labels = connected_components(pairs, src, dst)
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labels.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        "component",
        "cluster_size",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def pagerank_quantized(
    edges: DataFrame,
    iterations: int = 5,
    damping_micro: int = 850_000,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic integer PageRank — the link-quality signal a
    web-corpus curation pipeline ranks domains/pages with (CommonCrawl
    publishes exactly this family of centrality scores).

    All arithmetic is BIGINT micro-units: ranks start at
    ``scale // N``, each iteration distributes ``rank // outdeg`` along
    edges (integer division; every quantity non-negative, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree) and damps
    with integer multiply-then-divide. Integer sums are associative —
    the result is bit-identical on any engine, partitioning, or retry,
    which float PageRank cannot promise (per-node float sums depend on
    shuffle arrival order). Quantization error is bounded by
    outdeg/scale per node per iteration — with scale=10¹² it is noise
    far below ranking granularity. Dangling-node mass evaporates
    (documented policy; redistribute explicitly if your graph needs it).

    Scale shape: per iteration, one equi-join of ranks onto edges (on
    src) and one partial-aggregating groupBy (on dst) — the standard
    distributed PageRank; lineage truncates per round with
    localCheckpoint exactly like :func:`connected_components`. Driver
    state: the node count (one bounded scalar).

    Returns (node, rank) — micro-rank BIGINTs summing to ≈ scale.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    init = scale // n
    base = (init * (1_000_000 - damping_micro)) // 1_000_000
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("_dst")).join(
        outdeg, "node"
    ).localCheckpoint(eager=True)

    r = nodes.withColumn("rank", F.lit(init).cast("long"))
    r_is_checkpointed = False  # only free frames THIS loop checkpointed
    for _ in range(iterations):
        sums = (
            e.join(r, "node")
            .select(
                F.col("_dst").alias("node"),
                F.expr("rank div deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        new_r = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_micro} * coalesce(_s, 0L)) div 1000000"
                )
            ).alias("rank"),
        ).localCheckpoint(eager=True)
        if r_is_checkpointed:
            _free_local_checkpoint(r)
        r, r_is_checkpointed = new_r, True
    # the returned frame's lineage is truncated at its own checkpoint,
    # so the nodes/edges scaffolding blocks are no longer reachable —
    # free them instead of pinning storage for the rest of the session
    # (iterations=0 returns the un-checkpointed init frame, which still
    # reads nodes — keep its blocks in that case)
    if r_is_checkpointed:
        _free_local_checkpoint(nodes)
        _free_local_checkpoint(e)
    return r


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — computed by the classic peel loop
    (drop all nodes below k, recompute degrees, repeat to fixpoint).
    Curation use: the dense core of a near-dup pair graph is template
    structure (mirror farms, boilerplate families) that degree or
    triangle thresholds alone misjudge, because coreness is a property
    of the SUBGRAPH that survives peeling, not of the original degrees.

    Scale shape: each round is one partial-aggregating degree groupBy
    plus two semi-joins of the edge list against the (shrinking)
    survivor set — no step materializes a neighborhood in one task, so
    hub nodes stay distributed. Rounds are bounded by ``max_iter`` and
    in practice by the graph's degeneracy ordering depth; lineage is
    truncated per round with localCheckpoint exactly like
    :func:`connected_components`, superseded generations freed.
    Driver-side loop state is two scalars per round.

    ``stats`` (optional dict, filled in place) records ``rounds`` and
    per-round ``edge_counts`` — and whether the loop CONVERGED (reached
    the fixpoint) rather than hit ``max_iter``; gates pin that flag.

    Returns ``(node, core_degree)`` — the surviving nodes with their
    degree INSIDE the k-core (≥ k by definition). Empty when no k-core
    exists.
    """
    alive = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    first = alive
    if stats is not None:
        stats["rounds"] = 0
        stats["edge_counts"] = []
        stats["converged"] = False
    for _ in range(max_iter):
        deg = (
            alive.select(F.col("a").alias("node"))
            .unionAll(alive.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.where(F.col("degree") >= k).select("node")
        new_alive = (
            alive.join(keep.withColumnRenamed("node", "a"), "a", "semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_new = new_alive.count()
        n_prev = alive.count()
        if stats is not None:
            stats["rounds"] += 1
            stats["edge_counts"].append(n_new)
        # the peel only ever REMOVES edges (semi-joins against a
        # survivor subset), so new ⊆ previous and count equality alone
        # proves the fixpoint — no set-equality probe needed
        done = n_new == n_prev
        if alive is not first:
            _free_local_checkpoint(alive)
        alive = new_alive
        if done:
            if stats is not None:
                stats["converged"] = True
            break
    out = (
        alive.select(F.col("a").alias("node"))
        .unionAll(alive.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    return out


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected graph — the third graph operator beside
    :func:`connected_components` and :func:`pagerank_quantized`.
    Curation use: a near-dup pair graph whose neighborhoods close into
    triangles is template/boilerplate structure (mirror farms, spun
    articles); chains and stars are organic overlap. The clustering
    coefficient separates the two where raw degree cannot.

    Algorithm: degree orientation (the standard distributed-triangle
    trick — Suri & Vassilvitskii, WWW 2011). Every undirected edge is
    oriented from its lower to its higher endpoint in the total order
    (degree, node); wedges are enumerated only at each node's oriented
    out-neighborhood and closed against the oriented edge list. Each
    triangle is found exactly once (at its order-minimal corner), and a
    node's oriented out-degree is O(√m) regardless of its raw degree —
    so a 10⁸-follower hub node generates O(m) wedges, not O(deg²). The
    plan is three equi-joins plus partial-aggregating groupBys: the
    shape that survives 100 TB edge lists. No iteration, no collect.

    All outputs are integers (``lcc_ppm`` is the clustering coefficient
    in exact parts-per-million: ``2·tri·10⁶ div deg·(deg−1)``, every
    quantity non-negative so Spark's truncating ``div`` and DuckDB's
    flooring ``//`` agree) — the whole frame value-hashes against a
    textbook three-way self-join oracle.

    Returns ``(node, degree, triangles, lcc_ppm)`` — one row per node
    that appears in any non-loop edge.
    """
    # Pin the canonical edge set and (below) the oriented edge list:
    # the physical plan otherwise re-expands them per reference — e
    # feeds deg (twice via the union) and the orientation join, and
    # `oriented` is consumed three times (w1, w2, closing), so the
    # whole canonicalize-distinct chain re-ran ~6× (a 721-node plan at
    # the bench's 20k-edge graph). Materializing each once is also the
    # at-scale shape: recomputing a distinct (a full shuffle) per
    # reference costs more than storing the edge list (r12, guide §3.3
    # — truncate wide plans by materializing intermediates).
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient by the total order (degree, node): lower endpoint -> higher
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_degb"))
    lo_first = F.struct("_dega", "a") < F.struct("_degb", "b")
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lo_first, F.col("_dega")).otherwise(F.col("_degb")).alias("_degu"),
            F.when(lo_first, F.col("_degb")).otherwise(F.col("_dega")).alias("_degv"),
        )
        .localCheckpoint(eager=True)
    )
    # wedges at u: ordered out-neighbor pairs v1 <(deg,node)< v2
    w1 = oriented.select(
        "u", F.col("v").alias("v1"), F.col("_degv").alias("_d1")
    )
    w2 = oriented.select(
        "u", F.col("v").alias("v2"), F.col("_degv").alias("_d2")
    )
    wedges = w1.join(w2, "u").where(
        F.struct("_d1", "v1") < F.struct("_d2", "v2")
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v1").alias("node")))
        .unionAll(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return register_pins(
        deg.join(corners, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "(2 * coalesce(triangles, 0L) * 1000000)"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_ppm"),
        ),
        # the result plan reads both pins — callers free them via
        # components.free_pins(result) after the last action (r13;
        # each invocation otherwise holds edge-grain blocks for the
        # session lifetime)
        e,
        oriented,
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) — community detection for the near-dup/citation graphs where
    connected components are too coarse (one giant component hiding
    many dense communities, the template/mirror-farm shape).

    Labels start as node ids; each round every node adopts its
    neighbors' most frequent label, ties to the SMALLEST label —
    argmax rides inside the single groupBy as a struct max (count,
    then negated label), so each round is one equi-join + one
    partial-aggregating shuffle and the update is deterministic on any
    engine/partitioning (classic async LPA is run-order-dependent;
    this is the reproducible variant). A FIXED round count is the
    contract: synchronous LPA can 2-cycle on bipartite structure, so
    no convergence is claimed — callers pick rounds ~ community
    diameter. Isolated nodes keep their own label.

    Edges are symmetrized + self-loop-stripped + deduped first; round
    state localCheckpoints with superseded generations freed (the
    pagerank pattern). Returns (node, label). ``rounds`` must be ≥ 1 —
    a zero-round call would return the identity labeling while leaking
    the sym/nodes checkpoints for the session (they are freed only
    after the final round's state supersedes them), so it raises
    instead.
    """
    if int(rounds) < 1:
        raise ValueError(
            f"label_propagation: rounds must be >= 1, got {rounds} "
            "(an identity labeling is nodes.withColumn('label', node) — "
            "no propagation rounds, no checkpoint lifecycle)"
        )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        sym.select(F.col("a").alias("node"))
        .union(
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.withColumn("label", F.col("node"))
    checkpointed = False
    for _ in range(int(rounds)):
        cnt = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"), F.col("label").alias("lab"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = cnt.groupBy("node").agg(
            F.max(F.struct(F.col("n"), (-F.col("lab")).alias("_nl"))).alias(
                "_b"
            )
        ).select("node", (-F.col("_b._nl")).alias("_new"))
        new_labels = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce("_new", "node").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        if checkpointed:
            _free_local_checkpoint(labels)
        labels, checkpointed = new_labels, True
    if checkpointed:
        _free_local_checkpoint(nodes)
        _free_local_checkpoint(sym)
    return labels
