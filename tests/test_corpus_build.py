"""Structural invariants of the corpus_build capstone (the gate hash
pins exact values corpus-wide; these spell the pipeline's shape out):
monotone survivor attrition through the filter stages, token/pack
accounting identities, and stage-set completeness."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"

FILTER_ORDER = [
    "ingest",
    "exact",
    "near",
    "semantic",
    "langid",
    "quality",
    "decontaminate",
]


def _stages(spark):
    from jobinsight_data_pipeline_spark.catalog.textml import q_corpus_build

    return {
        r["stage"]: (r["n_rows"], r["chk"])
        for r in q_corpus_build(spark, SF).collect()
    }


def test_survivor_sets_shrink_monotonically(spark):
    s = _stages(spark)
    counts = [s[name][0] for name in FILTER_ORDER]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] > 0  # the pipeline keeps SOMETHING


def test_stage_set_complete_and_accounting(spark):
    from jobinsight_data_pipeline_spark.catalog.textml import CB_PACK_CAP

    s = _stages(spark)
    for name in FILTER_ORDER + ["mixture", "encode", "tokens", "packs"]:
        assert name in s, name
    # per-source rows exist for both waterfill and card, same sources
    wf = {k.split(":", 1)[1] for k in s if k.startswith("waterfill:")}
    card = {k.split(":", 1)[1] for k in s if k.startswith("card:")}
    assert wf == card and wf
    # every final survivor appears in exactly the card rows
    assert sum(s[f"card:{src}"][0] for src in card) == s["decontaminate"][0]
    # encode covers exactly the final survivors
    assert s["encode"][0] == s["decontaminate"][0]
    # mixture never drops a survivor outright below w_base=0+bucket:
    # realized copies ≥ 0 and the stream is nonempty when survivors are
    assert s["mixture"][0] > 0
    # pack accounting: packs hold ceil(total_mixture_tokens / capacity)
    # windows — the mixture stream repeats docs, so total packed tokens
    # ≥ the distinct-corpus token count; every pack is ≤ capacity and
    # the count matches the capacity cut exactly
    n_packs, tokens = s["packs"][0], s["tokens"][0]
    assert tokens > 0
    assert n_packs >= -(-tokens // CB_PACK_CAP)  # ≥ distinct-token cut


def test_filter_stages_are_subsets_by_checksum(spark):
    """Equal n_rows between adjacent stages ⇒ identical survivor SET
    (the xor-of-md5 checksum must match too — a swap that preserves
    count but changes membership would break this)."""
    s = _stages(spark)
    for a, b in zip(FILTER_ORDER, FILTER_ORDER[1:]):
        if s[a][0] == s[b][0]:
            assert s[a][1] == s[b][1], (a, b)
