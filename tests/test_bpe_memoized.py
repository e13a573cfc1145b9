"""Equivalence pins for the vocab-scale memoized BPE encoder
(operators/bpe.bpe_encode_memoized, encode_word_table): memoized ≡
direct chain at the default 55-merge table for BOTH word encoders, the
chunked native path at a tiny batch size, null/empty semantics, and a
learned ≥200-merge table through the python rank-loop path (the regime
the direct chain cannot reach in production)."""

from __future__ import annotations

import pytest

from jobinsight_data_pipeline_spark.operators.bpe import (
    DEFAULT_MERGES,
    bpe_encode,
    bpe_encode_memoized,
    bpe_encode_py,
    encode_word_table,
    learn_bpe_merges_py,
)

#: adversarial corpus: delimiter chars, tab/newline runs, repeated words
#: (the memoization target), single chars, non-ASCII, empty, None,
#: whitespace-only, and vocabulary words that exercise deep merge chains
TEXTS = [
    ("d0", "the data table joins the data stream"),
    ("d1", "  group\tby\nkey   sort merge batch "),
    ("d2", "query query query filter window spark"),
    ("d3", ""),
    ("d4", "   \t\n  "),
    ("d5", None),
    ("d6", "a"),
    ("d7", "x\x1ey z\x1fw"),
    ("d8", "héllo wörld the"),
    ("d9", "aggaggagg thethethe"),
    ("d10", "scan scan-scan_scan"),
]


def _collect(df):
    return {
        r["doc_id"]: (r["ids"], r["n_ids"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id string, text string")


def test_memoized_native_equals_direct(spark, docs):
    direct = _collect(bpe_encode(docs))
    memo = _collect(bpe_encode_memoized(docs, word_encoder="native"))
    assert memo == direct
    # and both match the independent pure-python realization
    for doc_id, text in TEXTS:
        want = None if text is None else bpe_encode_py(text)
        got = direct[doc_id][0]
        assert got == want, (doc_id, got, want)


def test_memoized_python_equals_direct(spark, docs):
    direct = _collect(bpe_encode(docs))
    memo = _collect(bpe_encode_memoized(docs, word_encoder="python"))
    assert memo == direct


def test_memoized_chunked_native_equals_single_chain(spark, docs):
    """merge_batch=8 forces 7 checkpointed rounds over the word table —
    the bounded-expression-tree path a 32k vocab needs."""
    direct = _collect(bpe_encode(docs))
    memo = _collect(
        bpe_encode_memoized(docs, word_encoder="native", merge_batch=8)
    )
    assert memo == direct


def test_memoized_no_broadcast_equals_direct(spark, docs):
    direct = _collect(bpe_encode(docs))
    memo = _collect(bpe_encode_memoized(docs, broadcast_words=False))
    assert memo == direct


def test_null_and_empty_semantics(spark, docs):
    memo = _collect(bpe_encode_memoized(docs))
    assert memo["d5"] == (None, None)  # NULL text → NULL ids
    assert memo["d3"] == ([], 0)  # empty text → empty ids
    assert memo["d4"] == ([], 0)  # whitespace-only → empty ids


def test_learned_large_table_python_path(spark):
    """A ≥200-merge LEARNED table through the rank-loop pandas UDF: the
    production-vocab regime. Pinned against the pure-python
    rank-sequential reference (bpe_encode_py) per document."""
    # ASCII corpus only: the base vocabulary is printable ASCII, so a
    # table learned over non-ASCII text is not validate_merges-well-formed
    corpus = [t for _, t in TEXTS if t and t.isascii()] + [
        "the quick brown fox jumps over the lazy dog " * 3,
        "select star from lineitem where quantity greater than threshold",
        "partition pruning predicate pushdown broadcast join strategy",
        "watermark window aggregate stateful stream checkpoint",
        "minhash simhash shingle jaccard cosine embedding cluster",
        "orchestrate deterministic reproducible lineage checkpoints",
        "vectorized columnar execution whole stage codegen pipeline",
    ]
    learned = learn_bpe_merges_py(corpus, n_merges=400, min_pair_count=1)
    merges = [(l, r) for l, r, _ in learned]
    assert len(merges) >= 200, len(merges)
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id int, text string"
    )
    got = _collect(bpe_encode_memoized(df, merges, word_encoder="python"))
    for i, text in enumerate(corpus):
        assert got[i][0] == bpe_encode_py(text, merges), i
    # chunked native path agrees on the same large table
    got_native = _collect(
        bpe_encode_memoized(df, merges, word_encoder="native", merge_batch=64)
    )
    assert got_native == got


def test_encode_word_table_python_matches_native(spark):
    words = spark.createDataFrame(
        [("the",), ("query",), ("aggaggagg",), ("héllo",), ("x",)],
        "w string",
    )
    nat = {
        r["w"]: r["wids"]
        for r in encode_word_table(words, word_encoder="native").collect()
    }
    py = {
        r["w"]: r["wids"]
        for r in encode_word_table(words, word_encoder="python").collect()
    }
    assert nat == py
    assert nat["the"] == bpe_encode_py("the")


def test_encode_word_table_whitespace_violations_uniform(spark):
    """Precondition-violating words carrying non-space whitespace must
    encode IDENTICALLY on all three paths (≤merge_batch native chain,
    chunked native, python rank-loop): a \\s run is one merge boundary,
    emitting no id — previously the chunked/python paths turned \\t/\\n
    into UNK(-1) while the short chain dropped them (ADVICE r7)."""
    words = spark.createDataFrame(
        [("the\tdata",), ("a\nb",), ("\tthe",), ("th e",), ("x \t y",)],
        "w string",
    )
    short = {
        r["w"]: r["wids"]
        for r in encode_word_table(
            words, word_encoder="native", merge_batch=64
        ).collect()
    }
    chunked = {
        r["w"]: r["wids"]
        for r in encode_word_table(
            words, word_encoder="native", merge_batch=8
        ).collect()
    }
    py = {
        r["w"]: r["wids"]
        for r in encode_word_table(words, word_encoder="python").collect()
    }
    assert short == chunked == py
    # boundary semantics: segments encode independently, no -1 ids
    assert short["the\tdata"] == bpe_encode_py("the data")
    assert all(-1 not in ids for ids in short.values())


def test_merges_artifact_roundtrip(spark, tmp_path):
    """The tokenizer-artifact lifecycle: learn → save → load → encode
    with the loaded table ≡ encode with the learned table."""
    from jobinsight_data_pipeline_spark.operators.bpe import (
        load_merges,
        save_merges,
    )

    corpus = [t for _, t in TEXTS if t and t.isascii()]
    learned = learn_bpe_merges_py(corpus, n_merges=40, min_pair_count=1)
    path = str(tmp_path / "merges")
    save_merges(spark, learned, path)
    loaded = load_merges(spark, path)
    assert loaded == [(l, r) for l, r, _ in learned]
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id int, text string"
    )
    a = _collect(bpe_encode_memoized(df, loaded, word_encoder="python"))
    b = _collect(bpe_encode_memoized(df, [(l, r) for l, r, _ in learned]))
    assert a == b
    # bare (l, r) form saves too; pair_count rides as NULL
    save_merges(spark, loaded, path)
    assert load_merges(spark, path) == loaded
    # a corrupted artifact (rank gap) fails loudly
    import pytest

    gap = str(tmp_path / "gap")
    spark.createDataFrame(
        [(0, "t", "h", None), (2, "th", "e", None)],
        "rank int, left string, right string, pair_count long",
    ).write.mode("overwrite").parquet(gap)
    with pytest.raises(ValueError, match="non-contiguous"):
        load_merges(spark, gap)


def test_memoized_fuzz_against_python_reference(spark):
    """Seeded fuzz: 60 adversarial random texts (whitespace runs,
    delimiter chars, vocab fragments, non-ASCII, repeats) through BOTH
    Spark paths in one DataFrame, pinned against the independent
    pure-python rank-sequential reference."""
    import random

    rng = random.Random(714)
    frags = [
        "the", "data", "query", "agg", "th", "e", "a", "zz",
        "x\x1e", "\x1fy", "héllo", "-", "_", "Q", "7", "...",
        "a\u00a0b", "\u2009thin",  # Unicode ws: ordinary chars to the engine
    ]
    seps = [" ", "  ", "\t", "\n", " \t ", ""]
    texts = []
    for _ in range(60):
        n = rng.randint(0, 12)
        s = "".join(
            rng.choice(frags) + rng.choice(seps) for _ in range(n)
        )
        texts.append(s)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    for enc in ("native", "python"):
        got = _collect(bpe_encode_memoized(df, word_encoder=enc))
        for i, text in enumerate(texts):
            assert got[i][0] == bpe_encode_py(text), (enc, i, repr(text))


def test_byte_fallback_total_coverage_roundtrip(spark):
    """GPT-2-style byte fallback: out-of-vocabulary symbols (non-ASCII,
    control chars) decompose into UTF-8 byte ids in the 256-id block at
    byte_fallback_base(merges) — NO -1 ever reaches an id stream — and
    distributed decode(encode(x)) reproduces x's non-whitespace
    characters exactly (lossless, pinned per row). All three encode
    paths and the pure-python reference agree on the fallback ids."""
    import re

    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_spark.operators.bpe import (
        bpe_decode_column,
        bpe_decode_py,
        bpe_ids_column,
        byte_fallback_base,
    )

    texts = [
        ("o0", "héllo wörld the"),          # 2-byte UTF-8
        ("o1", "naïve café ☕ data"),        # 3-byte UTF-8
        ("o2", "\x01ctl\x02 chars"),        # control chars
        ("o3", "русский текст the query"),  # all-OOV words + vocab word
        ("o4", "emoji 🎉 mix"),             # 4-byte UTF-8 (surrogate pair)
    ]
    df = spark.createDataFrame(texts, "doc_id string, text string")
    bb = byte_fallback_base(DEFAULT_MERGES)

    for enc in ("native", "python"):
        got = _collect(bpe_encode_memoized(df, word_encoder=enc))
        for d, t in texts:
            ids = got[d][0]
            assert ids == bpe_encode_py(t), (enc, d)
            assert -1 not in ids, (enc, d)
            assert all(0 <= i < bb + 256 for i in ids), (enc, d)
            # lossless: decode reproduces the non-whitespace chars
            exp = re.sub(r"[ \t\n\x0b\f\r]+", "", t)
            assert bpe_decode_py(ids) == exp, (enc, d)
    # distributed decode agrees with the python decoder per row
    dec = {
        r["doc_id"]: r["dec"]
        for r in df.select(
            "doc_id", bpe_decode_column(bpe_ids_column("text")).alias("dec")
        ).collect()
    }
    for d, t in texts:
        assert dec[d] == re.sub(r"[ \t\n\x0b\f\r]+", "", t), d
    # byte ids land in the reserved block for a fully-OOV word
    ids = bpe_encode_py("☕")
    assert ids == [bb + b for b in "☕".encode("utf-8")]
    # and the gate corpus itself never exercises the fallback (pure
    # printable ASCII — the documented assumption the oracle mirrors)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_bad = docs.filter(
        F.col("text").rlike(r"[^\x20-\x7e\s]")
    ).count()
    assert n_bad == 0


def test_encode_word_table_rejects_unknown_encoder(spark):
    words = spark.createDataFrame([("a",)], "w string")
    with pytest.raises(ValueError, match="word_encoder"):
        encode_word_table(words, word_encoder="rust").collect()
