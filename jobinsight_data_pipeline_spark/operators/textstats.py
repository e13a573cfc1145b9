"""Text-analysis operators for training-data pipelines.

All native Column expressions (JVM-side, whole-stage codegen): tokenize,
quality stats, language guess, fingerprinting. Designed to run over
billions of documents — per-row independent, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: tiny embedded stopword lists (language-id heuristic; extend per corpus)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "vi": ["của", "và", "là", "các", "cho", "được"],
}


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokenization (the baseline tokenizer; BPE-ish regex
    token counting available via ``bpe_ish_token_count``)."""
    return F.split(F.trim(_col(text)), r"\s+")


def word_count(text: ColumnOrName) -> Column:
    t = _col(text)
    return F.when(F.trim(t) == "", F.lit(0)).otherwise(F.size(tokens(t)))


def unique_word_count(text: ColumnOrName) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: ColumnOrName, lang: str = "en") -> Column:
    stops = STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda w: F.lower(w).isin(stops)))


def punct_count(text: ColumnOrName) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(_col(text), r"[\w\s]", ""))


def bpe_ish_token_count(text: ColumnOrName) -> Column:
    """Approximate subword token count: word runs + individual punctuation
    marks (a cheap, deterministic proxy for BPE tokenizers — good enough
    for length-bucketing training data). ``(?U)`` keeps ``\\w`` Unicode
    (Vietnamese letters count as word chars)."""
    pieces = F.regexp_extract_all(_col(text), F.lit(r"(?U)\w+|[^\w\s]"), F.lit(0))
    return F.size(pieces)


def lang_guess(text: ColumnOrName) -> Column:
    """N-gram/stopword heuristic language id: scores each configured
    language by stopword hits, picks the max (ties → first in dict
    order), 'und' when nothing matches."""
    t = _col(text)
    scores = [
        (code, stopword_count(t, code)) for code in STOPWORDS
    ]
    best_code = F.lit("und")
    best_score = F.lit(0)
    for code, score in scores:
        take = score > best_score
        best_code = F.when(take, F.lit(code)).otherwise(best_code)
        best_score = F.when(take, score).otherwise(best_score)
    return best_code


def quality_score(text: ColumnOrName) -> Column:
    """Composite [0,1] quality heuristic: penalize very short docs, high
    punctuation density, low vocabulary diversity. Deterministic, cheap,
    and monotone in each signal — the standard pre-training filter shape."""
    t = _col(text)
    n = word_count(t)
    length_ok = F.least(n / F.lit(50.0), F.lit(1.0))
    diversity = F.when(n > 0, unique_word_count(t) / n).otherwise(F.lit(0.0))
    punct_density = F.when(
        F.length(t) > 0, punct_count(t) / F.length(t)
    ).otherwise(F.lit(1.0))
    return F.round(
        0.4 * length_ok + 0.4 * diversity + 0.2 * (1 - F.least(punct_density * 5, F.lit(1.0))),
        4,
    )


def fingerprint(text: ColumnOrName) -> Column:
    """64-bit document fingerprint (xxhash64 of the normalized text —
    collapse whitespace + lowercase). Exact-dup detection key."""
    normalized = F.lower(F.regexp_replace(F.trim(_col(text)), r"\s+", " "))
    return F.xxhash64(normalized)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stats block in one narrow projection (widened
    first: the regex battery is CPU-dense scan-stage work)."""
    from jobinsight_data_pipeline_spark.operators.parallelism import widen_for_cpu

    return (
        widen_for_cpu(df).withColumn("n_words", word_count(text_col))
        .withColumn("n_unique_words", unique_word_count(text_col))
        .withColumn("stop_count_en", stopword_count(text_col, "en"))
        .withColumn("punct_chars", punct_count(text_col))
        .withColumn("approx_tokens", bpe_ish_token_count(text_col))
        .withColumn("lang_guess", lang_guess(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )
