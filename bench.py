#!/usr/bin/env python
"""Benchmark the headline catalog queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully materialized through the noop sink (no driver-side
collect, no result-size bias). Session startup is excluded from per-query
times; a separate "startup_sec" field reports it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jobinsight_data_pipeline_spark.catalog import build_catalog
from jobinsight_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from jobinsight_data_pipeline_spark.session import get_spark

# the scale-representative subset: joins/aggs/windows, parsing projections,
# dedup (exact + LSH + capped-jaccard), similarity (exact + LSH)
HEADLINE = [
    "star_revenue",
    "monthly_orders",
    "top10_customers",
    "dedup_keepmin",
    "scd2_rebuild",
    "sessionize",
    "asof_discount",
    "windowed_events",
    "event_percentiles",
    "salary_parse",
    "location_parse",
    "date_fanout",
    "exact_dedup",
    "text_stats",
    "minhash_lsh",
    "simhash_pairs",
    "embedding_topk",
    "embedding_lsh_topk",
    # Phase-3-equivalent work, directly comparable to the reference's
    # staging→DWH baseline (51 rec/s per-row loop — BASELINE.md): full
    # SCD2 dims + 5-day fan-out + grain merge over every order row.
    "warehouse_rollup",
    "fact_merge",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    t0 = time.time()
    spark = get_spark(app_name="jobinsight-bench")
    startup = time.time() - t0

    queries, _ = build_catalog()

    # warm-up: file-index + parquet footers + first codegen compile, so
    # per-query numbers reflect steady-state compute (reported separately)
    t0 = time.time()
    from jobinsight_data_pipeline_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t)[t].count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warmup = time.time() - t0

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # exact n-gram jaccard at its bench threshold (minhash_lsh above is
    # the approximate/scale path over the same corpus)
    t0 = time.time()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    materialize(ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5))
    timings["ngram_jaccard"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "startup_sec": round(startup, 3),
                "warmup_sec": round(warmup, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
