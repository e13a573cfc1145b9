"""WordPiece tokenizer (BERT-style greedy longest-match-first), the
third member of this engine's tokenizer family next to BPE
(operators/bpe.py) and the unigram LM (operators/unigram.py).

Semantics (Devlin et al. 2019 / the SentencePiece `model_type=word`
docs): a word is consumed left to right; at the word start the LONGEST
vocab piece that prefixes the remainder is taken, afterwards the
longest ``##``-continuation piece; if at any position nothing matches,
the WHOLE word becomes ``[UNK]``. Real WordPiece learns its vocab by
likelihood-greedy merges; this module derives a deterministic
frequency-based vocab from the corpus itself (top whole words + top
2-char start fragments + top 2-char continuations + every single
character the corpus contains, each tier tie-broken by fragment text)
so the gate is exactly replayable in SQL — the greedy ENCODER is fully
general over arbitrary piece lengths either way.

Scale shape: the vocab build is three partial-agg shuffles over the
token stream, each ending in a model-sized top-N (collected — bounded
by construction, like the k-means model). Encoding collapses the
corpus to DISTINCT words first (the bpe_encode_memoized lesson: encode
cost scales with vocabulary, not corpus), runs the greedy in an
Arrow-batched pandas UDF against the broadcast piece sets, and joins
the per-word result back onto the token stream — at 100 TB the
distinct-word table is millions of rows, the join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

UNK = "[UNK]"

#: gate hyperparameters (shared with the DuckDB oracle)
TOP_WORDS = 12
TOP_START2 = 10
TOP_CONT2 = 15


def corpus_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercased whitespace words with corpus frequency:
    ``(w, c)``. One partial-agg shuffle."""
    from jobinsight_data_pipeline_spark.operators.textstats import tokens

    return (
        df.select(
            F.explode(F.transform(tokens(text_col), F.lower)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def build_wordpiece_vocab(
    words: DataFrame,
    top_words: int = TOP_WORDS,
    top_start2: int = TOP_START2,
    top_cont2: int = TOP_CONT2,
) -> dict[str, frozenset[str]]:
    """Derive the deterministic piece inventory from a ``(w, c)``
    frequency table. Returns ``{"start": …, "cont": …}`` — piece TEXTS
    without the ``##`` marker (the encoder adds it when emitting).

    Tiers (every top-N ordered ``count DESC, fragment ASC``):
      start: top ``top_words`` whole words + top ``top_start2`` 2-char
             word prefixes (frequency-weighted) + every first char;
      cont:  top ``top_cont2`` 2-char fragments at positions ≥ 2 +
             every char at positions ≥ 2.
    Single characters are always in, so [UNK] can only arise on text
    containing characters the training corpus never saw.

    Three bounded aggregations; the collects are model-sized (≤
    top_words + top_start2 + top_cont2 + 2·alphabet entries)."""
    from pyspark.sql import Window

    topw = Window.orderBy(F.desc("tc"), F.asc("f"))

    def top_frags(frags: DataFrame, n: int) -> list[str]:
        ranked = (
            frags.groupBy("f")
            .agg(F.sum("c").alias("tc"))
            .withColumn("_r", F.row_number().over(topw))
            .where(F.col("_r") <= n)
        )
        return [r["f"] for r in ranked.select("f").collect()]

    whole = top_frags(words.select(F.col("w").alias("f"), "c"), top_words)
    start2 = top_frags(
        words.where(F.length("w") >= 2).select(
            F.substring("w", 1, 2).alias("f"), "c"
        ),
        top_start2,
    )
    cont2 = top_frags(
        words.where(F.length("w") >= 3)
        .select(
            F.explode(
                F.expr("transform(sequence(2, length(w) - 1), p -> substring(w, p, 2))")
            ).alias("f"),
            "c",
        ),
        top_cont2,
    )
    start1 = [
        r["f"]
        for r in words.select(F.substring("w", 1, 1).alias("f"))
        .distinct()
        .collect()
    ]
    cont1 = [
        r["f"]
        for r in words.where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(2, length(w)), p -> substring(w, p, 1))")
            ).alias("f")
        )
        .distinct()
        .collect()
    ]
    return {
        "start": frozenset(whole) | frozenset(start2) | frozenset(start1),
        "cont": frozenset(cont2) | frozenset(cont1),
    }


def wordpiece_encode_py(
    word: str, start: frozenset[str], cont: frozenset[str]
) -> list[str]:
    """Greedy longest-match-first over ARBITRARY piece lengths (the
    general algorithm — not specialized to this corpus's 1/2-char
    tiers). Returns the piece list, or ``[UNK]`` if any position has no
    match."""
    n = len(word)
    if n == 0:
        return []
    pieces: list[str] = []
    pos = 0
    while pos < n:
        vocab = start if pos == 0 else cont
        match = None
        for length in range(n - pos, 0, -1):
            frag = word[pos : pos + length]
            if frag in vocab:
                match = frag
                break
        if match is None:
            return [UNK]
        pieces.append(match if pos == 0 else "##" + match)
        pos += len(match)
    return pieces


def encode_distinct_words(
    words: DataFrame, vocab: dict[str, frozenset[str]]
) -> DataFrame:
    """Per-distinct-word piece streams: ``(w, c, pieces array)`` via an
    Arrow-batched pandas UDF holding the (model-sized) piece sets in
    its closure. Cost scales with the distinct-word table, never the
    corpus."""
    import pandas as pd  # noqa: F401  (signature contract)

    start, cont = vocab["start"], vocab["cont"]

    def _enc(col):
        return col.map(lambda w: wordpiece_encode_py(w, start, cont))

    enc_udf = F.pandas_udf(_enc, ArrayType(StringType()))
    return words.withColumn("pieces", enc_udf(F.col("w")))


def wordpiece_word_table(
    spark: SparkSession, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The full train+encode chain on one corpus, collapsed to the
    distinct-word grain: ``(w, c, pieces_str, n_pieces, is_unk)`` —
    the shape both gates and the fertility rollup consume. Arrays are
    joined to a scalar at this boundary (gate outputs must not emit
    ARRAY columns — CLAUDE.md).

    The distinct-word table is pinned ONCE (eager localCheckpoint, the
    unigram_train discipline): ``build_wordpiece_vocab`` launches five
    collect jobs and the encode a sixth, and each would otherwise
    re-run the corpus tokenize+explode+aggregate scan — measured six
    full corpus passes per call at sf0.1. After the pin, the corpus is
    tokenized exactly once and the six downstream jobs read the
    vocabulary-sized checkpoint. The checkpoint is NOT freed here: the
    returned lazy frame reads it (blocks are vocabulary-sized) —
    callers free it via ``components.free_pins(result)`` after the
    last action (r13)."""
    words = corpus_words(docs, text_col).localCheckpoint(eager=True)
    vocab = build_wordpiece_vocab(words)
    enc = encode_distinct_words(words, vocab)
    from jobinsight_data_pipeline_spark.operators.components import (
        register_pins,
    )

    return register_pins(
        enc.select(
            "w",
            "c",
            F.array_join("pieces", " ").alias("pieces_str"),
            F.size("pieces").cast("long").alias("n_pieces"),
            (F.array_join("pieces", " ") == UNK).alias("is_unk"),
        ),
        words,
    )


def validate_vocab(vocab: dict[str, frozenset[str]]) -> None:
    """Structural well-formedness of a WordPiece piece inventory: both
    tiers present and non-empty, no empty fragments, every multi-char
    start piece's first char and every multi-char continuation's chars
    covered by the single-char tier of the SAME vocab (the coverage
    property :func:`build_wordpiece_vocab` guarantees and greedy
    termination quietly relies on — a hand-edited artifact that drops a
    char tier would turn formerly-encodable words into [UNK]s
    silently)."""
    for tier in ("start", "cont"):
        pieces = vocab.get(tier)
        if not pieces:
            raise ValueError(f"wordpiece vocab: tier '{tier}' missing/empty")
        if any(p == "" for p in pieces):
            raise ValueError(f"wordpiece vocab: empty fragment in '{tier}'")
    start1 = {p for p in vocab["start"] if len(p) == 1}
    cont1 = {p for p in vocab["cont"] if len(p) == 1}
    for p in vocab["start"]:
        if p[0] not in start1:
            raise ValueError(
                f"wordpiece vocab: start piece {p!r} lacks 1-char cover"
            )
    for p in vocab["cont"]:
        if not set(p) <= cont1:
            raise ValueError(
                f"wordpiece vocab: cont piece {p!r} lacks 1-char cover"
            )


def save_vocab(
    spark: SparkSession, vocab: dict[str, frozenset[str]], path: str
) -> None:
    """Persist a WordPiece piece inventory as the tokenizer artifact —
    (tier, frag) parquet, the asset shipped beside training shards so
    day-N encodes match with the EXACT inventory the corpus was packed
    with (the save_merges / unigram save_model twin). Validates before
    writing — a malformed artifact must fail at save time, not at a
    future encode."""
    validate_vocab(vocab)
    rows = [("start", f) for f in sorted(vocab["start"])] + [
        ("cont", f) for f in sorted(vocab["cont"])
    ]
    spark.createDataFrame(rows, "tier string, frag string").write.mode(
        "overwrite"
    ).parquet(path)


def load_vocab(spark: SparkSession, path: str) -> dict[str, frozenset[str]]:
    """Load a :func:`save_vocab` artifact back into the piece-set form
    the encoder consumes. Model-sized collect; re-validates — a
    corrupted or hand-edited artifact fails loudly."""
    rows = spark.read.parquet(path).select("tier", "frag").collect()
    vocab = {
        "start": frozenset(r["frag"] for r in rows if r["tier"] == "start"),
        "cont": frozenset(r["frag"] for r in rows if r["tier"] == "cont"),
    }
    validate_vocab(vocab)
    return vocab
