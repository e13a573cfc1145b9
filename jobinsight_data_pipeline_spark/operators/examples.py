"""Training-example CONSTRUCTION operators — the step between a curated
corpus and a training batch: fill-in-middle reordering (Bavarian et al.
2022, the FIM objective code models train with) and T5-style span
corruption (Raffel et al. 2020 §3.1.4 — sentinel-masked inputs and
span targets for denoising objectives).

Both are deterministic (split points and mask decisions derive from
engine-portable md5 uniforms keyed on (doc, position) — no RNG to
reconcile, re-runs rebuild identical examples) and fully relational:
FIM is a pure projection (array slices off two hash-drawn cut points);
span corruption is explode → two windows keyed on the doc → one
groupBy(doc) re-assembly — shuffle cost rides token volume, the same
class as every tokenizer pass, and nothing touches the driver.

Reconstruction note: both operators re-join tokens with single spaces
(the corpus's whitespace is collapsed — the same contract as every
tokens()-based operator here; see CLAUDE.md's trim/split parity note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobinsight_data_pipeline_spark.operators.textstats import tokens

FIM_PRE, FIM_SUF, FIM_MID = "<PRE>", "<SUF>", "<MID>"


def _md5_u32(*parts: Column) -> Column:
    """Engine-portable 32-bit uniform: md5 hex prefix → BIGINT in
    [0, 2^32) — the repo's established hash-uniform (DuckDB replays it
    as CAST(('0x' || substring(md5(...), 1, 8)) AS BIGINT))."""
    return F.conv(
        F.substring(F.md5(F.concat(*parts)), 1, 8), 16, 10
    ).cast("long")


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 4,
) -> DataFrame:
    """Fill-in-middle reordering (PSM format): two hash-drawn cut
    points split the token stream into prefix | middle | suffix, and
    the example is re-serialized as ``<PRE> prefix <SUF> suffix <MID>
    middle`` — the model learns to infill the middle given both sides
    (Bavarian et al. 2022). Cut points guarantee all three parts are
    non-empty: p1 ∈ [1, n−2] from one uniform, p2 ∈ [p1+1, n−1] from a
    second. Documents under ``min_tokens`` pass through unchanged with
    ``fim_applied = false`` (nothing to infill).

    One scan-fused projection — no shuffle, no UDF; the same plan shape
    at 5 k docs and 5 B. Returns (id, fim_text, fim_applied, n_tokens,
    p1, p2)."""
    if min_tokens < 3:
        raise ValueError("fim_transform: min_tokens must be >= 3")
    toks = tokens(text_col)
    n = F.size(toks)
    h1 = _md5_u32(F.lit("fima:"), F.col(id_col).cast("string"))
    h2 = _md5_u32(F.lit("fimb:"), F.col(id_col).cast("string"))
    # greatest(..., 1) keeps the modulus positive on short docs — the
    # expression evaluates for EVERY row (ANSI % by zero throws) even
    # though when(applied) discards it for the pass-through branch
    p1 = (
        F.lit(1) + h1 % F.greatest(n - F.lit(2), F.lit(1)).cast("long")
    ).cast("int")
    p2 = (
        p1
        + F.lit(1)
        + h2 % F.greatest(n - F.lit(1) - p1, F.lit(1)).cast("long")
    ).cast("int")
    applied = n >= F.lit(min_tokens)
    fim_text = F.concat_ws(
        " ",
        F.lit(FIM_PRE),
        F.array_join(F.slice(toks, 1, p1), " "),
        F.lit(FIM_SUF),
        F.array_join(F.slice(toks, p2 + 1, n - p2), " "),
        F.lit(FIM_MID),
        F.array_join(F.slice(toks, p1 + 1, p2 - p1), " "),
    )
    return df.select(
        F.col(id_col),
        F.when(applied, fim_text).otherwise(F.col(text_col)).alias(
            "fim_text"
        ),
        applied.alias("fim_applied"),
        n.cast("long").alias("n_tokens"),
        F.when(applied, p1).otherwise(F.lit(None).cast("int")).alias("p1"),
        F.when(applied, p2).otherwise(F.lit(None).cast("int")).alias("p2"),
    )


INS_BOS, INS_SEP, INS_EOS = "<s>", "<sep>", "</s>"


def instruction_example(
    df: DataFrame,
    id_col: str = "doc_id",
    prompt_col: str = "prompt",
    completion_col: str = "completion",
) -> DataFrame:
    """Instruction-tuning example assembly with the LOSS-MASK span as
    data: the example is ``<s> prompt <sep> completion </s>`` and the
    trainer masks loss to the completion plus EOS — the half-open token
    range [loss_from, loss_to) over the example's whitespace tokens
    (position 0 = ``<s>``; prompt tokens 1..n_p; ``<sep>`` at n_p+1;
    completion n_p+2..n_p+n_c+1; ``</s>`` last). Pure scan-fused
    projection. Returns (id, example_text, n_tokens, n_prompt_tokens,
    n_completion_tokens, loss_from, loss_to)."""
    p_toks = tokens(prompt_col)
    c_toks = tokens(completion_col)
    n_p = F.size(p_toks).cast("long")
    n_c = F.size(c_toks).cast("long")
    return df.select(
        F.col(id_col),
        F.concat_ws(
            " ",
            F.lit(INS_BOS),
            F.array_join(p_toks, " "),
            F.lit(INS_SEP),
            F.array_join(c_toks, " "),
            F.lit(INS_EOS),
        ).alias("example_text"),
        (n_p + n_c + F.lit(3)).alias("n_tokens"),
        n_p.alias("n_prompt_tokens"),
        n_c.alias("n_completion_tokens"),
        (n_p + F.lit(2)).alias("loss_from"),
        (n_p + n_c + F.lit(3)).alias("loss_to"),
    )


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_denominator: int = 7,
) -> DataFrame:
    """T5-style span corruption: each token is masked with probability
    ``1/mask_denominator`` (hash-Bernoulli on (doc, position) — ~15% at
    the default, the paper's rate), consecutive masked tokens merge
    into spans, the INPUT replaces each span with one ``<extra_id_k>``
    sentinel (k = 1-based span ordinal), and the TARGET lists each
    sentinel followed by the span's original tokens (the exact
    input/target pair a denoising trainer consumes).

    Relational construction on purpose — the SAME formulation runs on
    any engine (the DuckDB oracle replays it verbatim): explode to
    (doc, position, token, masked), one running-sum window numbers the
    spans, one groupBy(doc) re-assembles both strings via an
    order-pinned collect. Shuffle cost rides token volume (the
    tokenizer-pass class). Returns (id, inputs, targets, n_tokens,
    n_masked, n_spans)."""
    if mask_denominator < 2:
        raise ValueError("span_corrupt: mask_denominator must be >= 2")
    from pyspark.sql import Window

    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    # the per-token md5 Bernoulli runs in the scan-stage projection —
    # CPU-dense map work that a single-file parquet would put on ONE
    # task (the classifier/shingles lesson); widen first
    df = widen_for_cpu(df)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(text_col)).alias("_i", "_t"),
    ).select(
        "_id",
        "_i",
        "_t",
        (
            _md5_u32(
                F.lit("sc:"),
                F.col("_id").cast("string"),
                F.lit(":"),
                F.col("_i").cast("string"),
            )
            % F.lit(int(mask_denominator))
            == 0
        ).alias("_m"),
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev = F.lag("_m", 1, False).over(
        Window.partitionBy("_id").orderBy("_i")
    )
    spans = base.withColumn("_start", F.col("_m") & ~prev).withColumn(
        "_k", F.sum(F.col("_start").cast("int")).over(w)
    )
    sent = F.concat(
        F.lit("<extra_id_"), F.col("_k").cast("string"), F.lit(">")
    )
    in_piece = F.when(~F.col("_m"), F.col("_t")).when(
        F.col("_start"), sent
    )
    tgt_piece = F.when(
        F.col("_m") & F.col("_start"),
        F.concat(sent, F.lit(" "), F.col("_t")),
    ).when(F.col("_m"), F.col("_t"))
    assembled = spans.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            in_piece.isNotNull(),
                            F.struct(F.col("_i").alias("i"), in_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("inputs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            tgt_piece.isNotNull(),
                            F.struct(F.col("_i").alias("i"), tgt_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        ).alias("targets"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("_m").cast("long")).alias("n_masked"),
        F.max("_k").cast("long").alias("n_spans"),
    )
    return assembled.select(
        F.col("_id").alias(id_col),
        "inputs",
        "targets",
        "n_tokens",
        "n_masked",
        "n_spans",
    )
