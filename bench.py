"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is a full cold plan (read → compute → count); the timing
includes Catalyst planning and the action. The suite covers every
engine pillar: relational agg, top-k, batch k-NN, BM25 build+score,
fusion, range join, sessionization, chunking fan-out, MinHash dedup,
and the end-to-end hybrid pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from customkb_spark.session import get_spark

BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "top_orders_by_price",
    "segment_order_stats",
    "events_sessionize",
    "events_hourly_agg",
    "events_funnel",
    "events_asof_join",
    "chunk_documents_fixed",
    "bm25_term_stats",
    "bm25_score",
    "bm25_score_batch",
    "corpus_filter_pipeline",
    "vector_topk_cosine",
    "knn_join",
    "rrf_fusion",
    "context_range_join",
    "minhash_lsh_dedup",
    "simhash_fingerprints",
    "quality_scores",
    "rerank_topk",
    "ngram_jaccard_topk",
    "lsh_bucketed_near_dups",
    "multimodal_decode",
    "hybrid_context_flagship",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("bench", cpus=cpus)
    qs = E.queries()

    # warm the JVM/parquet footer caches once (not counted)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # two runs per query, min taken: the first run pays one-time
    # codegen/JIT compilation (several seconds of per-process noise at
    # these scale factors); the min reflects the engine's steady state
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
