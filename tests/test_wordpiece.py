"""WordPiece greedy-encoder semantics + the oracle's unroll bound.

The gate oracle replays vocab derivation and the greedy walk on the
actual corpus; these tests pin the GENERAL algorithm on adversarial
vocabs the corpus can't produce, and the structural precondition the
8-step unrolled oracle rests on."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from jobinsight_data_pipeline_spark.catalog.textml import (
    WORDPIECE_ORACLE_UNROLL,
)
from jobinsight_data_pipeline_spark.operators.wordpiece import (
    UNK,
    wordpiece_encode_py,
)


def test_oracle_unroll_bound_max_word_length():
    """The wordpiece oracles unroll WORDPIECE_ORACLE_UNROLL greedy
    steps — sound only while no corpus word exceeds that many
    characters (worst case: all 1-char pieces). Importing the SAME
    constant the CTE builder uses means the oracle's depth and this pin
    can't drift apart; assert the bound on every frozen sf dir."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        mx = duckdb.sql(
            "SELECT max(len(t.w)) FROM ("
            "SELECT regexp_split_to_array(trim(text), '\\s+') AS ws "
            f"FROM '/root/testdata/{sf}/documents.parquet'), "
            "unnest(ws) AS t(w)"
        ).fetchone()[0]
        assert mx <= WORDPIECE_ORACLE_UNROLL, (sf, mx)


def test_longest_prefix_beats_char_walk():
    start = frozenset({"table", "t", "a", "b", "l", "e", "u"})
    cont = frozenset({"au", "a", "u", "b", "l", "e"})
    assert wordpiece_encode_py("tableau", start, cont) == ["table", "##au"]
    # without the whole-word prefix the walk starts at one char
    assert wordpiece_encode_py("tableau", start - {"table"}, cont)[0] == "t"


def test_two_char_continuation_preferred():
    start = frozenset({"x"})
    cont = frozenset({"yz", "y", "z"})
    assert wordpiece_encode_py("xyz", start, cont) == ["x", "##yz"]


def test_whole_word_and_empty():
    start = frozenset({"hash", "h"})
    cont = frozenset({"ash", "a", "s", "h"})
    assert wordpiece_encode_py("hash", start, cont) == ["hash"]
    assert wordpiece_encode_py("", start, cont) == []


def test_unk_on_dead_end():
    start = frozenset({"a"})
    cont = frozenset({"b"})
    # 'c' never matches as a continuation -> the WHOLE word is [UNK]
    assert wordpiece_encode_py("abc", start, cont) == [UNK]
    # dead end at the very start
    assert wordpiece_encode_py("zab", start, cont) == [UNK]


@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=12),
    extra=st.sets(st.text(alphabet="abcd", min_size=2, max_size=4), max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_greedy_invariants_fuzz(word, extra):
    """With every single char in vocab the encode never UNKs; pieces
    reassemble the word exactly; and every emitted piece is the LONGEST
    vocab match at its position (the greedy contract)."""
    chars = frozenset("abcd")
    start = chars | {f for f in extra}
    cont = chars | {f for f in extra}
    out = wordpiece_encode_py(word, frozenset(start), frozenset(cont))
    assert out != [UNK]
    rebuilt = "".join(p[2:] if p.startswith("##") else p for p in out)
    assert rebuilt == word
    pos = 0
    for i, p in enumerate(out):
        frag = p[2:] if i > 0 else p
        assert (p.startswith("##")) == (i > 0)
        vocab = start if pos == 0 else cont
        assert frag in vocab
        # nothing longer matches here
        rest = word[pos:]
        for longer in range(len(frag) + 1, len(rest) + 1):
            assert rest[:longer] not in vocab
        pos += len(frag)
    assert pos == len(word)


def test_pandas_udf_path_matches_python(spark):
    """The Arrow-batched distinct-word encode (the gate's engine path)
    agrees with the pure-python reference on the real corpus words."""
    from jobinsight_data_pipeline_spark.operators.wordpiece import (
        build_wordpiece_vocab,
        corpus_words,
        encode_distinct_words,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    words = corpus_words(docs)
    vocab = build_wordpiece_vocab(words)
    got = {
        r["w"]: list(r["pieces"])
        for r in encode_distinct_words(words, vocab).collect()
    }
    assert len(got) == 31
    for w, pieces in got.items():
        assert pieces == wordpiece_encode_py(w, vocab["start"], vocab["cont"])


def test_vocab_artifact_roundtrip_and_corruption(spark, tmp_path):
    """save_vocab → load_vocab roundtrips the exact piece sets and the
    reloaded inventory encodes identically; corrupted artifacts
    (dropped tier, missing 1-char cover) fail loudly at load."""
    import pytest

    from jobinsight_data_pipeline_spark.operators.wordpiece import (
        build_wordpiece_vocab,
        corpus_words,
        load_vocab,
        save_vocab,
        validate_vocab,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    vocab = build_wordpiece_vocab(corpus_words(docs))
    path = str(tmp_path / "wp_vocab")
    save_vocab(spark, vocab, path)
    back = load_vocab(spark, path)
    assert back == vocab

    w = "customer"
    assert wordpiece_encode_py(
        w, back["start"], back["cont"]
    ) == wordpiece_encode_py(w, vocab["start"], vocab["cont"])

    # corruption: drop the continuation tier entirely
    spark.read.parquet(path).where("tier = 'start'").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "wp_bad1"))
    with pytest.raises(ValueError, match="missing/empty"):
        load_vocab(spark, str(tmp_path / "wp_bad1"))

    # corruption: a 2-char continuation whose chars lack 1-char cover
    with pytest.raises(ValueError, match="lacks 1-char cover"):
        validate_vocab(
            {"start": frozenset({"a"}), "cont": frozenset({"zy", "z"})}
        )
