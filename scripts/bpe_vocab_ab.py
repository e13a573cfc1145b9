#!/usr/bin/env python
"""A/B the BPE encode paths at a production-shaped merge-table size.

The direct encoder (operators/bpe.bpe_ids_column) chains one `replace`
per merge rank over the FULL document text — O(merges x corpus bytes)
and an O(merges) expression tree. The memoized encoder
(bpe_encode_memoized) pays per-merge work on the DISTINCT-word table
and joins ids back. This probe measures both at the 55-merge default
AND at a >=1,024-merge table, on the sf0.1 corpus (5,000 docs).

Merge table for the large run: every merge learnable from the real
corpus via the DISTRIBUTED trainer (learn_bpe_merges, min_pair_count=1
— the testdata vocabulary is 31 words, so it exhausts at a few dozen
merges), extended to 1,024 with deterministic well-formed filler
chains over base symbols. Filler merges rarely fire — exactly like a
real 32k vocab, where a length-L word applies at most L-1 of the 32k
merges; the DIRECT chain still pays one full-text replace pass per
rank regardless, which is the asymmetry this probe demonstrates.

All timed paths are consumed by ONE aggregate (sum n_ids + xxhash64
checksum) per the aggregated-probe discipline, and the checksums are
asserted equal across paths at each table size.

Usage: python scripts/bpe_vocab_ab.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobinsight_data_pipeline_spark.session import get_spark  # noqa: E402


def filler_merges(existing: list[tuple[str, str]], n_total: int):
    """Extend a learned table to n_total with deterministic well-formed
    merges: chains built over printable-ASCII base pairs whose outputs
    are all distinct from each other and from the learned outputs."""
    from jobinsight_data_pipeline_spark.operators.bpe import BASE_SYMBOLS

    out = list(existing)
    outputs = {a + b for a, b in out}
    # chain seeds: (c, d) pairs over base symbols, then extend each
    # chain (sym, d') while more are needed
    base = [c for c in BASE_SYMBOLS]
    i = 0
    chains: list[str] = []
    while len(out) < n_total:
        if i < len(base) * len(base):
            a, b = base[i // len(base)], base[i % len(base)]
            i += 1
            cand = a + b
            if cand in outputs:
                continue
            out.append((a, b))
            outputs.add(cand)
            chains.append(cand)
        else:
            # extend earliest chains with base symbols
            head = chains.pop(0)
            for c in base:
                if len(out) >= n_total:
                    break
                cand = head + c
                if cand in outputs:
                    continue
                out.append((head, c))
                outputs.add(cand)
                chains.append(cand)
    return out


def consume(df):
    """One aggregate over (doc_id, ids, n_ids): total ids + checksum."""
    import pyspark.sql.functions as F

    row = df.select(
        F.sum("n_ids").alias("total_ids"),
        F.bit_xor(
            F.xxhash64(
                "doc_id", F.array_join(F.transform("ids", lambda i: i.cast("string")), "-")
            )
        ).alias("checksum"),
    ).collect()[0]
    return int(row["total_ids"]), int(row["checksum"])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    from jobinsight_data_pipeline_spark.catalog import load
    from jobinsight_data_pipeline_spark.operators.bpe import (
        DEFAULT_MERGES,
        bpe_encode,
        bpe_encode_memoized,
        learn_bpe_merges,
        validate_merges,
    )
    from jobinsight_data_pipeline_spark.operators.parallelism import (
        widen_for_cpu,
    )

    spark = get_spark(app_name="bpe-vocab-ab")
    docs = widen_for_cpu(load(spark, sf_dir, "documents")["documents"])
    docs = docs.localCheckpoint(eager=True)  # isolate encode cost

    t0 = time.time()
    learned = learn_bpe_merges(docs, n_merges=n_merges, min_pair_count=1)
    learn_s = time.time() - t0
    table = filler_merges([(l, r) for l, r, _ in learned], n_merges)
    validate_merges(table)

    results: dict = {
        "sf_dir": sf_dir,
        "learned_merges": len(learned),
        "learn_s": round(learn_s, 2),
        "table_size": len(table),
        "runs": {},
    }

    def timed(name, thunk, best_of=2):
        best, check = None, None
        for _ in range(best_of):
            t0 = time.time()
            check = consume(thunk())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results["runs"][name] = {"sec": round(best, 2), "checksum": check}
        print(f"{name:34s} {best:7.2f}s  total_ids={check[0]}", flush=True)
        return check

    # --- 55-merge default table ---
    c1 = timed("direct@55", lambda: bpe_encode(docs))
    c2 = timed(
        "memoized-native@55",
        lambda: bpe_encode_memoized(docs, word_encoder="native"),
    )
    c3 = timed(
        "memoized-python@55",
        lambda: bpe_encode_memoized(docs, word_encoder="python"),
    )
    assert c1 == c2 == c3, (c1, c2, c3)

    # --- large table ---
    big = table
    c5 = timed(
        f"memoized-native-chunked@{len(big)}",
        lambda: bpe_encode_memoized(docs, big, word_encoder="native", merge_batch=64),
    )
    c6 = timed(
        f"memoized-python@{len(big)}",
        lambda: bpe_encode_memoized(docs, big, word_encoder="python"),
    )
    assert c5 == c6, (c5, c6)
    # the direct chain last (may be pathologically slow / fail to plan)
    try:
        c4 = timed(f"direct@{len(big)}", lambda: bpe_encode(docs, big), best_of=1)
        assert c4 == c5, (c4, c5)
    except Exception as e:  # noqa: BLE001
        results["runs"][f"direct@{len(big)}"] = {"error": str(e)[:300]}
        print(f"direct@{len(big)}: FAILED — {str(e)[:200]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
