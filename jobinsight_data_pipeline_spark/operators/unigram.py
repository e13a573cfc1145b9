"""Unigram-LM subword tokenizer (SentencePiece-style; Kudo 2018) — the
second tokenizer family beside BPE, built on the SAME scale collapse:
all per-round work runs on the DISTINCT-WORD table (vocabulary ≪ token
count), never on corpus bytes.

Algorithm (hard-EM / Viterbi-EM — the deterministic, engine-replayable
variant of Kudo's E-step):

1. **Seed**: every substring of length 1..``pmax`` of every distinct
   word, occurrence-weighted by word frequency; keep the top
   ``seed_k`` by (count DESC, piece ASC) plus ALL single characters
   (total coverage — every word is always segmentable).
2. **EM rounds** (fixed count, fully unrolled in the catalog oracle —
   the learn_bpe_merges contract): score each piece with integer
   micro-unit logs ``q(cnt) − q(C)`` where ``q(x) = floor(ln(x)·10⁶)``
   (BIGINT; the bigram_lm quantization class — ln is NOT correctly
   rounded in either engine, so only the quantized integers cross the
   engine boundary, and the property suite boundary-audits the actual
   argument set), Viterbi-segment every distinct word, and re-estimate
   counts as frequency-weighted piece usage. Characters that fall out
   of use keep a count-1 floor (coverage).
3. **Prune**: keep the top ``vocab_k`` pieces by (count DESC, piece
   ASC) plus all single characters; ids are the row_number over that
   same ordering, 0-based.
4. **Encode**: Viterbi under the pruned model, reassembled per
   document through the memoized word-table join (the
   bpe_encode_memoized shape).

Viterbi tie-break (pinned identically in the pandas UDF and the
oracle's ``row_number() OVER (ORDER BY score DESC, j ASC)``): highest
integer score wins; equal scores prefer the SMALLEST split point j —
i.e. the longest final piece.

Determinism note: the per-round q values are computed BY SPARK (one
model-sized collect per round), so the trainer's driver-side dict is
bit-identical to what the engine would compute; the DuckDB oracle
recomputes them with its own ln, and the cross-engine audit in
tests/test_properties.py pins equality over the real argument set.

Scale shape: seed counting is one explode + partial-aggregating
groupBy; each EM round is one Arrow-batched pandas-UDF pass over the
distinct-word table plus a model-sized collect (≤ seed_k + alphabet
rows — the learn_bpe_merges driver-state discipline); encode joins the
word table back by word (broadcast at model scale). Nothing collects
the corpus, and nothing is quadratic in anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: default max piece length (seed substrings and Viterbi window)
PMAX = 4


def words_with_freq(
    df: DataFrame, text_col: str = "text", word_col: str = "w"
) -> DataFrame:
    """Corpus → distinct-word frequency table: one tokenize +
    partial-aggregating groupBy pass."""
    from jobinsight_data_pipeline_spark.operators.textstats import tokens

    toks = F.filter(tokens(F.col(text_col)), lambda w: w != "")
    return (
        df.select(F.explode(toks).alias(word_col))
        .groupBy(word_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def unigram_seed_counts(
    words: DataFrame,
    pmax: int = PMAX,
    word_col: str = "w",
    freq_col: str = "freq",
) -> DataFrame:
    """All substrings of length 1..pmax of every distinct word,
    occurrence-weighted (a word containing a substring twice
    contributes its frequency twice): ``(piece, cnt)``. Fully native —
    nested transform over (start, len) pairs, one explode, one
    partial-aggregating groupBy."""
    w = F.col(word_col)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(pmax), F.length(w) - s + 1)
                ),
                lambda ln: w.substr(s, ln),
            ),
        )
    )
    return (
        words.select(F.explode(subs).alias("piece"), F.col(freq_col))
        .groupBy("piece")
        .agg(F.sum(freq_col).cast("long").alias("cnt"))
    )


def _q_ints(spark: SparkSession, values: list[int]) -> dict[int, int]:
    """floor(ln(v)·10⁶) for each distinct positive integer, computed BY
    SPARK (so the trainer's driver-side scores are exactly the engine's
    quantization — never python's libm, which can differ by 1 ulp)."""
    vals = sorted(set(values))
    rows = spark.createDataFrame([(v,) for v in vals], "v: long").selectExpr(
        "v", "CAST(floor(ln(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS q"
    )
    return {r["v"]: r["q"] for r in rows.collect()}


def viterbi_pieces_py(
    w: str, score: dict[str, int], pmax: int, unk: int
) -> list[str]:
    """Best segmentation of one word under integer piece scores —
    the pure-python DP both the trainer's pandas UDF and the property
    tests share. Unknown single characters score at ``unk`` (the
    count-1 floor), keeping the function total; multi-char pieces must
    be in the model. Tie-break: max score, then smallest split point
    (j ascending, strict improvement only)."""
    n = len(w)
    best: list[int | None] = [None] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for pos in range(1, n + 1):
        b = None
        bj = 0
        for j in range(max(0, pos - pmax), pos):
            prev = best[j]
            if prev is None:
                continue
            piece = w[j:pos]
            q = score.get(piece)
            if q is None:
                if len(piece) != 1:
                    continue
                q = unk
            s = prev + q
            if b is None or s > b:
                b = s
                bj = j
        best[pos] = b
        back[pos] = bj
    pieces: list[str] = []
    pos = n
    while pos > 0:
        j = back[pos]
        pieces.append(w[j:pos])
        pos = j
    pieces.reverse()
    return pieces


def _segment_word_table(
    words: DataFrame,
    score: dict[str, int],
    pmax: int,
    unk: int,
    word_col: str = "w",
    out_col: str = "pieces",
) -> DataFrame:
    """One Arrow-batched Viterbi pass over the distinct-word table
    (non-decorator pandas_udf form — the normalize_text_udf
    convention)."""
    from pyspark.sql.types import ArrayType, StringType

    sc = dict(score)

    def _seg_batch(col):
        memo: dict[str, list[str]] = {}

        def one(w):
            if w is None:
                return None
            got = memo.get(w)
            if got is None:
                got = viterbi_pieces_py(w, sc, pmax, unk)
                memo[w] = got
            return got

        return col.map(one)

    seg = F.pandas_udf(_seg_batch, ArrayType(StringType()))
    return words.withColumn(out_col, seg(F.col(word_col)))


def unigram_train(
    spark: SparkSession,
    words: DataFrame,
    rounds: int = 3,
    seed_k: int = 80,
    vocab_k: int = 40,
    pmax: int = PMAX,
    word_col: str = "w",
    freq_col: str = "freq",
    audit: list | None = None,
) -> list[tuple[str, int, int]]:
    """Train the unigram-LM piece model; returns ``[(piece, cnt,
    piece_id), …]`` in id order. Driver state per step is model-sized
    (≤ seed_k + alphabet rows); the word table never collects. Pass
    ``audit`` to receive every (count, total) ln-argument the trainer
    quantized — the cross-engine boundary audit consumes it."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from jobinsight_data_pipeline_spark.operators.components import (
        _free_local_checkpoint,
    )

    # the distinct-word table feeds the seed pass AND every EM round:
    # pin it once (eager localCheckpoint — the learn_bpe_merges round
    # discipline) instead of re-tokenizing the corpus per round
    words = words.localCheckpoint(eager=True)
    seed_all = unigram_seed_counts(words, pmax, word_col, freq_col)
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    )
    m0 = (
        seed_all.withColumn("rk", rk)
        .filter((F.col("rk") <= seed_k) | (F.length("piece") == 1))
        .select("piece", "cnt")
    )
    model = {r["piece"]: r["cnt"] for r in m0.collect()}
    chars = sorted(p for p in model if len(p) == 1)

    for _ in range(rounds):
        total = sum(model.values())
        q = _q_ints(spark, [*model.values(), total, 1])
        if audit is not None:
            audit.extend([*model.values(), total, 1])
        score = {p: q[c] - q[total] for p, c in model.items()}
        unk = q[1] - q[total]
        seg = _segment_word_table(words, score, pmax, unk, word_col)
        counts = (
            seg.select(F.explode("pieces").alias("piece"), F.col(freq_col))
            .groupBy("piece")
            .agg(F.sum(freq_col).cast("long").alias("cnt"))
            .collect()
        )
        model = {r["piece"]: r["cnt"] for r in counts}
        for ch in chars:  # count-1 coverage floor
            model.setdefault(ch, 1)

    _free_local_checkpoint(words)
    kept = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
    final = [
        (p, c)
        for i, (p, c) in enumerate(kept)
        if i < vocab_k or len(p) == 1
    ]
    return [(p, c, i) for i, (p, c) in enumerate(final)]


def validate_model(model: list[tuple[str, int, int]]) -> None:
    """Well-formedness of a unigram piece model: ids contiguous from 0
    in (count DESC, piece ASC) order, counts positive, pieces unique
    and non-empty, and total character coverage (every character of
    every multi-char piece present as a single-char piece — the
    invariant that keeps Viterbi total on the training corpus)."""
    ids = [i for _, _, i in model]
    if ids != list(range(len(model))):
        raise ValueError(f"non-contiguous piece ids: {ids[:5]}…")
    order = [(-c, p) for p, c, _ in model]
    if order != sorted(order):
        raise ValueError("model not in (count DESC, piece ASC) id order")
    pieces = [p for p, _, _ in model]
    if len(set(pieces)) != len(pieces) or "" in pieces:
        raise ValueError("duplicate or empty pieces in model")
    if any(c < 1 for _, c, _ in model):
        raise ValueError("non-positive piece count in model")
    chars = {p for p in pieces if len(p) == 1}
    missing = {ch for p in pieces for ch in p} - chars
    if missing:
        raise ValueError(
            f"multi-char pieces reference characters with no single-char "
            f"entry (coverage hole): {sorted(missing)[:5]}"
        )


def save_model(spark: SparkSession, model: list, path: str) -> None:
    """Persist a trained unigram model as the tokenizer artifact —
    (piece_id, piece, cnt) parquet, the asset shipped beside training
    shards so day-N encodes segment with the EXACT model the corpus
    was packed with (the save_merges twin). Validates before writing —
    a malformed artifact must fail at save time, not at a future
    encode."""
    validate_model(model)
    rows = [(int(i), p, int(c)) for p, c, i in model]
    spark.createDataFrame(
        rows, "piece_id int, piece string, cnt long"
    ).write.mode("overwrite").parquet(path)


def load_model(spark: SparkSession, path: str) -> list[tuple[str, int, int]]:
    """Load a :func:`save_model` artifact back into the id-ordered
    ``[(piece, cnt, piece_id), …]`` form :func:`unigram_encode`
    consumes. Model-sized collect; re-validates — a corrupted or
    hand-edited artifact fails loudly."""
    rows = (
        spark.read.parquet(path)
        .select("piece_id", "piece", "cnt")
        .orderBy("piece_id")
        .collect()
    )
    model = [(r["piece"], r["cnt"], r["piece_id"]) for r in rows]
    validate_model(model)
    return model


def unigram_encode(
    spark: SparkSession,
    df: DataFrame,
    model: list[tuple[str, int, int]],
    pmax: int = PMAX,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode a corpus under a trained model via the memoized
    word-table route: tokenize → posexplode → segment each DISTINCT
    word once → broadcast-join pieces back → one long frame ``(id_col,
    pos, idx, piece, piece_id)`` (pos = word position in the document,
    idx = piece position in the word). Callers aggregate; nothing here
    collects."""
    from jobinsight_data_pipeline_spark.operators.textstats import tokens

    total = sum(c for _, c, _ in model)
    q = _q_ints(spark, [c for _, c, _ in model] + [total, 1])
    score = {p: q[c] - q[total] for p, c, _ in model}
    unk = q[1] - q[total]

    toks = F.filter(tokens(F.col(text_col)), lambda w: w != "")
    tok = df.select(F.col(id_col), F.posexplode(toks).alias("pos", "w"))
    word_pieces = _segment_word_table(
        tok.select("w").distinct(), score, pmax, unk
    ).select("w", F.posexplode("pieces").alias("idx", "piece"))
    ids = spark.createDataFrame(
        [(p, i) for p, _, i in model], "piece: string, piece_id: int"
    )
    return (
        tok.join(F.broadcast(word_pieces), "w")
        .join(F.broadcast(ids), "piece", "left")
        .select(
            id_col,
            "pos",
            "idx",
            "piece",
            F.coalesce("piece_id", F.lit(-1)).alias("piece_id"),
        )
    )
