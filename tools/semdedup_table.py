"""Measured SemDeDup pair recall + candidate-cost vs the nlist knob —
the cluster-scope analogue of tools/recall_table.py (the same
measure-don't-guess artifact for the dedup family).

For each nlist, reports:
- recall: fraction of the exact all-pairs near-dups (cosine >= t) that
  the cluster-scoped search still finds (pairs split across cells are
  the loss);
- cand_frac: sum-of-squared-cell-sizes / n^2 — the pairwise-work
  fraction vs brute force (the cost the scope buys).

    python tools/semdedup_table.py [sf_dir] [threshold]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customkb_spark.session import get_spark  # noqa: E402


def main() -> int:
    from pyspark.sql import functions as F

    from customkb_spark.embedding.index import assign_clusters, train_centroids
    from customkb_spark.operators import dedup as D

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.35

    spark = get_spark("semdedup-table")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    # Two recall measures, because they answer different questions:
    # - threshold recall: fraction of ALL exact pairs ≥ threshold found.
    #   On near-orthogonal synthetic vectors this band is dominated by
    #   loose pairs that do NOT co-locate, so it falls ~with cand_frac.
    # - planted recall: 200 ε-perturbed copies (cosine ≈ 1 to their
    #   source — real duplicate geometry) injected before clustering;
    #   fraction of those pairs recovered. This is the property SemDeDup
    #   relies on: tight duplicate balls land in the same k-means cell.
    n_plant = 200
    base = emb.orderBy("vec_id").limit(n_plant)
    planted = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * 1.001 + 0.0005).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    # the ACTUAL sampled ids, not range(n) — a corpus whose ids are
    # offset or non-contiguous would otherwise score recall 0 silently
    planted_pairs = {
        (r.vec_id, r.vec_id + 10_000_000)
        for r in base.select("vec_id").collect()
    }
    n_plant = len(planted_pairs)

    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_duplicates(
            emb, "vec_id", "embedding", threshold
        ).collect()
    }
    rows = []
    for nlist in (1, 2, 4, 8, 16, 32):
        cents = train_centroids(emb, "embedding", nlist=nlist)
        got = {
            (r.id_a, r.id_b)
            for r in D.semantic_duplicates(
                emb, cents, "vec_id", "embedding", threshold
            ).collect()
        }
        pcents = train_centroids(corpus, "embedding", nlist=nlist)
        pgot = {
            (r.id_a, r.id_b)
            for r in D.semantic_duplicates(
                corpus, pcents, "vec_id", "embedding", 0.99
            ).collect()
        }
        sizes = (
            assign_clusters(emb, cents, "embedding")
            .groupBy("cluster_id")
            .count()
            .collect()
        )
        cand = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
        rows.append(
            {
                "nlist": nlist,
                "recall": round(len(got) / len(exact), 3) if exact else 1.0,
                "planted_recall": round(
                    len(pgot & planted_pairs) / n_plant, 3
                ),
                "pairs": len(got),
                "cand_frac": round(cand / (n * (n - 1) / 2), 4),
            }
        )

    print(
        f"| nlist | threshold recall (≥{threshold}) | planted-dup recall"
        f" | pairs found | candidate work vs n²/2 |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['nlist']} | {r['recall']:.3f} | {r['planted_recall']:.3f} |"
            f" {r['pairs']} | {r['cand_frac']:.4f} |"
        )
    print(
        json.dumps(
            {"sf_dir": sf_dir, "threshold": threshold, "n": n,
             "exact_pairs": len(exact), "rows": rows}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
