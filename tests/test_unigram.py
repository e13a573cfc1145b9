"""Unigram-LM tokenizer pins (operators/unigram): the Arrow-batched
Viterbi pass against the pure-python DP, the DuckDB recursive-CTE
Viterbi (the oracle's engine) against the same DP under adversarial
tie-heavy random models, a FULL independent pure-python replay of the
trainer (seed → EM rounds → prune) against unigram_train, and encode
coverage/roundtrip invariants."""

from __future__ import annotations

import pytest

from jobinsight_data_pipeline_spark.operators.unigram import (
    PMAX,
    _q_ints,
    _segment_word_table,
    unigram_encode,
    unigram_seed_counts,
    unigram_train,
    viterbi_pieces_py,
    words_with_freq,
)

#: tiny deterministic corpus — repeats (the memoization target), deep
#: shared substrings, singleton chars, hyphens/underscores
CORPUS = [
    (0, "the data table joins the data stream"),
    (1, "data data lake datalog update upstream"),
    (2, "the theme thesis there then the"),
    (3, "a ab abc abcd abcde"),
    (4, "stream streaming streams upstream"),
    (5, "x-y_z the-data"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id int, text string")


def _train_replay_py(spark, texts, rounds, seed_k, vocab_k, pmax):
    """Independent pure-python realization of unigram_train (word
    Counter → substring seeding → hard-EM with viterbi_pieces_py →
    count-1 floor → prune). Shares ONLY _q_ints (the Spark-computed
    quantization is the trainer's defined semantics) and the Viterbi
    DP the pandas UDF path is separately pinned against."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.strip(" \t\n\x0b\f\r")):
            if w:
                words[w] += 1

    seed: Counter = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for ln in range(1, min(pmax, len(w) - s) + 1):
                seed[w[s : s + ln]] += f
    ranked = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    model = {
        p: c
        for i, (p, c) in enumerate(ranked)
        if i < seed_k or len(p) == 1
    }
    chars = sorted(p for p in model if len(p) == 1)

    for _ in range(rounds):
        total = sum(model.values())
        q = _q_ints(spark, [*model.values(), total, 1])
        score = {p: q[c] - q[total] for p, c in model.items()}
        unk = q[1] - q[total]
        counts: Counter = Counter()
        for w, f in words.items():
            for piece in viterbi_pieces_py(w, score, pmax, unk):
                counts[piece] += f
        model = dict(counts)
        for ch in chars:
            model.setdefault(ch, 1)

    kept = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
    final = [
        (p, c) for i, (p, c) in enumerate(kept) if i < vocab_k or len(p) == 1
    ]
    return [(p, c, i) for i, (p, c) in enumerate(final)]


def test_train_matches_pure_python_replay(spark, docs):
    got = unigram_train(
        spark, words_with_freq(docs), rounds=3, seed_k=30, vocab_k=15
    )
    want = _train_replay_py(
        spark, [t for _, t in CORPUS], rounds=3, seed_k=30, vocab_k=15,
        pmax=PMAX,
    )
    assert got == want


def test_train_replay_other_hyperparams(spark, docs):
    """A second (rounds, seed_k, vocab_k) point — catches off-by-ones
    in the seed/prune cut positions that one setting can mask."""
    got = unigram_train(
        spark, words_with_freq(docs), rounds=1, seed_k=12, vocab_k=50
    )
    want = _train_replay_py(
        spark, [t for _, t in CORPUS], rounds=1, seed_k=12, vocab_k=50,
        pmax=PMAX,
    )
    assert got == want


def test_train_invariants(spark, docs):
    model = unigram_train(
        spark, words_with_freq(docs), rounds=2, seed_k=30, vocab_k=15
    )
    ids = [i for _, _, i in model]
    assert ids == list(range(len(model)))  # contiguous, 0-based
    order = [(-c, p) for p, c, _ in model]
    assert order == sorted(order)  # id order IS (cnt DESC, piece ASC)
    pieces = {p for p, _, _ in model}
    corpus_chars = {
        ch for _, t in CORPUS for w in t.split() for ch in w
    }
    assert corpus_chars <= pieces  # total coverage: every char present
    with pytest.raises(ValueError, match="rounds"):
        unigram_train(spark, words_with_freq(docs), rounds=0)


def test_seed_counts_occurrence_weighted(spark):
    """'aaa' (freq 2) contains 'aa' twice → cnt('aa') = 4; the nested
    transform must emit EVERY (start, len) occurrence."""
    words = spark.createDataFrame(
        [("aaa", 2), ("ab", 3)], "w string, freq long"
    )
    got = {
        r["piece"]: r["cnt"]
        for r in unigram_seed_counts(words, pmax=2).collect()
    }
    # 'aaa' freq 2: 'a' ×3 occurrences, 'aa' ×2; 'ab' freq 3: each ×1;
    # pmax=2 excludes the length-3 substring entirely
    assert got == {"a": 9, "aa": 4, "ab": 3, "b": 3}


def test_segment_word_table_matches_python_dp(spark):
    """The Arrow-batched pandas-UDF pass must reproduce
    viterbi_pieces_py per word, including tie-heavy models."""
    score = {
        "th": -100, "he": -90, "the": -190, "t": -95, "h": -95, "e": -95,
        "da": -100, "at": -100, "ta": -100, "d": -120, "a": -120,
        "data": -200, "dat": -150, "rea": -10, "am": -500,
    }
    unk = -700
    words = ["the", "data", "thedata", "stream", "aaaa", "x", "readable"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["pieces"]
        for r in _segment_word_table(df, score, PMAX, unk).collect()
    }
    for w in words:
        assert got[w] == viterbi_pieces_py(w, score, PMAX, unk), w


def test_duckdb_recursive_viterbi_matches_python_fuzz(spark):
    """Seeded fuzz of the ORACLE's engine: 30 random tie-heavy integer
    models × random words through the recursive-CTE Viterbi
    (catalog.textml._unigram_viterbi_cte — the exact SQL both unigram
    oracles embed) against viterbi_pieces_py. Scores are drawn from a
    tiny value set so max-score ties are common: the smallest-split
    (longest-final-piece) tie-break is what this pins."""
    import random

    import duckdb

    from jobinsight_data_pipeline_spark.catalog.textml import (
        _unigram_viterbi_cte,
    )

    rng = random.Random(909)
    alpha = "abc"
    for trial in range(30):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(8)
        ]
        pieces = set()
        for w in words:
            for _ in range(6):
                s = rng.randrange(len(w))
                ln = rng.randint(1, min(4, len(w) - s))
                pieces.add(w[s : s + ln])
        # tiny score domain → frequent exact ties
        score = {p: -10 * rng.randint(1, 4) for p in pieces}
        unk = -100
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE words AS SELECT * FROM (VALUES "
            + ",".join(f"('{w}', 1)" for w in set(words))
            + ") t(w, freq)"
        )
        con.execute(
            "CREATE TABLE score AS SELECT * FROM (VALUES "
            + ",".join(f"('{p}', {q})" for p, q in score.items())
            + ") t(piece, q)"
        )
        con.execute(f"CREATE TABLE unk AS SELECT {unk} AS u")
        sql = (
            "WITH RECURSIVE "
            + _unigram_viterbi_cte("v", "words", "score", "unk")
            + "\nSELECT w, list_filter(string_split(p1, chr(30)),"
            " x -> x <> '') AS pieces FROM v WHERE pos = n"
        )
        got = {r[0]: list(r[1]) for r in con.execute(sql).fetchall()}
        for w in set(words):
            want = viterbi_pieces_py(w, score, 4, unk)
            assert got[w] == want, (trial, w, got[w], want)


def test_train_replay_pmax_two(spark, docs):
    """pmax generality: the full replay also holds at pmax=2 (the
    oracle pins pmax=4; this pins the operator's window parameter)."""
    got = unigram_train(
        spark, words_with_freq(docs), rounds=2, seed_k=20, vocab_k=12,
        pmax=2,
    )
    want = _train_replay_py(
        spark, [t for _, t in CORPUS], rounds=2, seed_k=20, vocab_k=12,
        pmax=2,
    )
    assert got == want


def test_model_artifact_roundtrip(spark, docs, tmp_path):
    """The tokenizer-artifact lifecycle (the save_merges twin): train →
    save → load → encode with the loaded model ≡ encode with the
    trained model; corrupted artifacts fail loudly at load."""
    from jobinsight_data_pipeline_spark.operators.unigram import (
        load_model,
        save_model,
    )

    model = unigram_train(
        spark, words_with_freq(docs), rounds=2, seed_k=30, vocab_k=15
    )
    path = str(tmp_path / "unigram_model")
    save_model(spark, model, path)
    loaded = load_model(spark, path)
    assert loaded == model
    a = unigram_encode(spark, docs, model).orderBy(
        "doc_id", "pos", "idx"
    ).collect()
    b = unigram_encode(spark, docs, loaded).orderBy(
        "doc_id", "pos", "idx"
    ).collect()
    assert a == b
    # a coverage hole (a multi-char piece whose char lost its entry)
    # fails loudly at save time
    with pytest.raises(ValueError, match="coverage hole"):
        save_model(
            spark, [("ab", 5, 0), ("b", 3, 1)], str(tmp_path / "bad")
        )
    gap = str(tmp_path / "gap")
    spark.createDataFrame(
        [(0, "x", 5), (2, "y", 3)], "piece_id int, piece string, cnt long"
    ).write.mode("overwrite").parquet(gap)
    with pytest.raises(ValueError, match="non-contiguous"):
        load_model(spark, gap)


def test_encode_coverage_and_ids(spark, docs):
    """Per document: pieces concatenated in (pos, idx) order reproduce
    the document's tokens exactly (the segmentation covers the text),
    and every piece maps to a model id (corpus-trained model never
    emits -1 on its own corpus — all chars are in the vocabulary)."""
    model = unigram_train(
        spark, words_with_freq(docs), rounds=2, seed_k=30, vocab_k=15
    )
    enc = unigram_encode(spark, docs, model)
    rows = enc.orderBy("doc_id", "pos", "idx").collect()
    assert all(r["piece_id"] >= 0 for r in rows)
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["piece"])
    for doc_id, text in CORPUS:
        assert "".join(by_doc[doc_id]) == text.replace(" ", ""), doc_id
    # ids round-trip through the model's piece table
    id_of = {p: i for p, _, i in model}
    for r in rows:
        assert r["piece_id"] == id_of[r["piece"]]
