"""Measured ANN recall@k vs exact brute force — the engine's analogue of
the reference's vector-DB evaluation table
(docs/vector-db-evaluation.md:46-56, recall@20 per engine/config).

Runs at a given sf dir over N probe queries drawn from the embeddings
table; prints a markdown table (paste into BASELINE.md) plus one JSON
line for tooling.

    python tools/recall_table.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customkb_spark.session import get_spark  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from customkb_spark.embedding.index import assign_clusters, ivf_search, train_centroids
    from customkb_spark.embedding.lsh import lsh_search, random_hyperplanes
    from customkb_spark.embedding.pq import encode_pq, pq_topk, train_pq
    from customkb_spark.operators.topk import brute_force_topk

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("recall_table")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    dims = len(emb.select("embedding").first()[0])
    qrows = emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]

    exact = {
        qid: [r.id for r in brute_force_topk(emb, qv, k, "vec_id", "embedding", "cosine").collect()]
        for qid, qv in queries
    }

    def recall(results: dict[int, list[int]]) -> float:
        hits = sum(len(set(results[q]) & set(exact[q])) for q, _ in queries)
        return round(hits / (len(queries) * k), 3)

    rows: list[tuple[str, str, float]] = []

    cents = train_centroids(emb, "embedding", nlist=16)
    indexed = assign_clusters(emb, cents, "embedding").cache()
    indexed.count()
    for nprobe in (1, 2, 4, 8, 16):
        got = {
            qid: [
                r.id
                for r in ivf_search(
                    indexed, cents, qv, k=k, nprobe=nprobe,
                    id_col="vec_id", vec_col="embedding",
                ).collect()
            ]
            for qid, qv in queries
        }
        rows.append((f"IVF nlist=16", f"nprobe={nprobe}", recall(got)))

    for m, nbits in ((8, 4), (8, 6), (16, 6)):
        pq = train_pq(emb, "embedding", m=m, nbits=nbits, centroids=cents)
        codes = encode_pq(emb, pq, "vec_id", "embedding").cache()
        codes.count()
        got = {
            qid: [
                r.id
                for r in pq_topk(
                    codes, pq, qv, k=k, nprobe=8, metric="ip",
                    id_col="vec_id", vectors=emb, vec_col="embedding",
                ).collect()
            ]
            for qid, qv in queries
        }
        rows.append((f"IVFPQ m={m} nbits={nbits}", "nprobe=8 refine=4x", recall(got)))
        codes.unpersist()

    for nbits, probes in ((8, 1), (8, 2), (12, 2)):
        planes = random_hyperplanes(dims, nbits, 42)
        got = {
            qid: [
                r.id
                for r in lsh_search(
                    emb, qv, planes, k=k, id_col="vec_id", vec_col="embedding",
                    multiprobe_hamming=probes,
                ).collect()
            ]
            for qid, qv in queries
        }
        rows.append((f"LSH nbits={nbits}", f"hamming≤{probes}", recall(got)))

    print(f"| index | search config | recall@{k} |")
    print("|---|---|---|")
    for idx, cfg, r in rows:
        print(f"| {idx} | {cfg} | {r} |")
    print()
    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n, "dims": dims,
        "n_queries": len(queries), "k": k,
        "recall": [{"index": a, "config": b, "recall": c} for a, b, c in rows],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
