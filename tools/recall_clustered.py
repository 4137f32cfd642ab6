"""ANN recall@k + probe-fraction on a CLUSTERED corpus at auto-tier
scale — closes the round-5 gap that BASELINE.md's recall table used
2,000 near-orthogonal random vectors (the conservative floor, below the
100k auto-tier cutoff, so IVF/PQ never engaged on bench data).

Generates planted Gaussian clusters (unit-norm centers, isotropic
noise), sized so `select_index_kind` engages the large tier
(n ≥ medium_dataset_threshold = 100k), then measures:

  * the AUTO tier end-to-end: `build_vector_index(cfg)` →
    `VectorIndexTier.topk(qv, k, cfg.faiss_nprobe)` — byte-for-byte the
    vector leg KnowledgeBase.query runs (plans/hybrid.py:133-134);
  * forced IVF at the auto nlist and at the FAISS-recipe nlist ≈ 4·√n
    (trained on a 39×nlist sample per the FAISS guideline);
  * LSH hyperplane buckets with Hamming multiprobe.

Probe-fraction = (rows in probed clusters) / n — the fraction of the
corpus a query actually scans, i.e. the partition-pruning win at 100 TB.
Mirrors reference docs/vector-db-evaluation.md:46-56 (recall@20 per
engine/config table).

    python tools/recall_clustered.py [n] [dim] [n_clusters] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from customkb_spark.session import get_spark  # noqa: E402


def make_clustered(
    n: int, dim: int, n_clusters: int, n_queries: int, seed: int = 42,
    spread: float = 0.6, aniso: bool = False,
):
    """Planted Gaussian mixture: unit-norm centers, per-point noise with
    E[noise norm] ≈ `spread` (σ = spread/√dim per coordinate) so
    intra-cluster cosine ≈ 1/√(1+spread²) ≈ 0.86 — clustered enough
    that IVF pruning is meaningful, noisy enough that recall is not
    trivially 1.0. Queries are FRESH draws from the same mixture (never
    corpus members), the realistic retrieval condition.

    ``aniso=True`` gives the noise a decaying per-coordinate spectrum
    (same total energy) — the correlated-residual regime real embedding
    models produce (PCA'd features, uneven variance), where OPQ's
    balanced eigen-allocation separates from plain PQ; isotropic noise
    is OPQ's null case (rotation can't improve a spherical residual)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sigma = np.full(dim, spread / np.sqrt(dim))
    if aniso:
        spec = np.exp(-np.arange(dim) / (dim / 8.0))
        sigma = spread * spec / np.linalg.norm(spec)
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + rng.normal(size=(n, dim)) * sigma
    qassign = rng.integers(0, n_clusters, size=n_queries)
    qs = centers[qassign] + rng.normal(size=(n_queries, dim)) * sigma
    return pts.astype(np.float64), qs.astype(np.float64)


def main() -> int:
    import pandas as pd
    from pyspark.sql import functions as F

    from customkb_spark.config import KBConfig
    from customkb_spark.embedding.auto import build_vector_index
    from customkb_spark.embedding.index import (
        assign_clusters,
        ivf_search,
        nearest_clusters,
        sample_vectors,
        train_centroids,
    )
    from customkb_spark.embedding.lsh import lsh_search, random_hyperplanes
    from customkb_spark.operators.topk import brute_force_topk

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_clusters = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 10
    aniso = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False

    spark = get_spark("recall_clustered")
    pts, qs = make_clustered(n, dim, n_clusters, n_queries, aniso=aniso)
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(pts)})
    emb = spark.createDataFrame(pdf).repartition(32).cache()
    emb.count()
    queries = [(i, qs[i].tolist()) for i in range(n_queries)]

    print(f"# corpus n={n} dim={dim} planted_clusters={n_clusters} "
          f"queries={n_queries} k={k} aniso={int(aniso)}", file=sys.stderr)

    t0 = time.time()
    exact = {
        qid: [r.id for r in
              brute_force_topk(emb, qv, k, "vec_id", "embedding", "cosine").collect()]
        for qid, qv in queries
    }
    print(f"# exact ground truth: {time.time()-t0:.1f}s", file=sys.stderr)

    def recall(results: dict[int, list[int]]) -> float:
        hits = sum(len(set(results[q]) & set(exact[q])) for q, _ in queries)
        return round(hits / (len(queries) * k), 3)

    def probe_fraction(cents: np.ndarray, sizes: dict[int, int], nprobe: int) -> float:
        tot = sum(
            sizes.get(c, 0)
            for qid, qv in queries
            for c in nearest_clusters(qv, cents, nprobe)
        )
        return round(tot / (len(queries) * n), 4)

    rows: list[dict] = []

    # ---- auto tier, end-to-end (the KnowledgeBase.query vector leg) ----
    cfg = KBConfig()
    t0 = time.time()
    tier = build_vector_index(emb, cfg, id_col="vec_id", vec_col="embedding", n=n)
    tier.indexed.count()
    build_s = round(time.time() - t0, 2)
    sizes = {
        r.cluster_id: r.cnt
        for r in tier.indexed.groupBy("cluster_id").agg(F.count("*").alias("cnt")).collect()
    }
    t0 = time.time()
    got = {
        qid: [r.id for r in tier.topk(qv, k, cfg.faiss_nprobe).collect()]
        for qid, qv in queries
    }
    search_s = round((time.time() - t0) / len(queries), 3)
    rows.append({
        "index": f"AUTO→{tier.kind} nlist={len(tier.centroids)}",
        "config": f"nprobe={cfg.faiss_nprobe} (cfg default)",
        "recall": recall(got),
        "probe_frac": probe_fraction(tier.centroids, sizes, cfg.faiss_nprobe),
        "build_s": build_s, "search_s_per_q": search_s,
    })

    # ---- OPQ vs plain PQ, ADC-only (refine masks quantization quality;
    # the ADC ranking is where the rotation earns its keep) ----
    from customkb_spark.embedding.pq import encode_pq, pq_topk, train_pq
    from customkb_spark.functions.vector import l2_normalize

    normed = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding")
    ).cache()
    nlist_pq = len(tier.centroids)
    sample = sample_vectors(normed, "embedding", 39 * nlist_pq, 42)
    cents_pq = train_centroids(normed, "embedding", nlist_pq, sample=sample)
    for label, use_opq in (("PQ", False), ("OPQ", True)):
        t0 = time.time()
        model = train_pq(
            normed, "embedding", m=8, nbits=8, centroids=cents_pq,
            sample=sample, opq=use_opq,
        )
        codes = encode_pq(normed, model, "vec_id", "embedding").cache()
        codes.count()
        build_s = round(time.time() - t0, 2)
        pq_sizes = {
            r.cluster_id: r.cnt
            for r in codes.groupBy("cluster_id").agg(F.count("*").alias("cnt")).collect()
        }
        t0 = time.time()
        got = {
            qid: [r.id for r in
                  pq_topk(codes, model, qv, k=k, nprobe=cfg.faiss_nprobe,
                          metric="ip", id_col="vec_id").collect()]
            for qid, qv in queries
        }
        rows.append({
            "index": f"IVF{label} nlist={nlist_pq} m=8×8b ADC-only",
            "config": f"nprobe={cfg.faiss_nprobe}, no refine",
            "recall": recall(got),
            "probe_frac": probe_fraction(cents_pq, pq_sizes, cfg.faiss_nprobe),
            "build_s": build_s,
            "search_s_per_q": round((time.time() - t0) / len(queries), 3),
        })
        codes.unpersist()
    normed.unpersist()

    # ---- SQ8 tier (opt-in ivfsq): 4× codes, exact dequantized scoring,
    # no refine pass ----
    cfg_sq = KBConfig(ann_index="ivfsq")
    t0 = time.time()
    sq_tier = build_vector_index(emb, cfg_sq, id_col="vec_id", vec_col="embedding", n=n)
    sq_tier.indexed.count()
    sq_build = round(time.time() - t0, 2)
    sq_sizes = {
        r.cluster_id: r.cnt
        for r in sq_tier.indexed.groupBy("cluster_id").agg(F.count("*").alias("cnt")).collect()
    }
    t0 = time.time()
    got = {
        qid: [r.id for r in sq_tier.topk(qv, k, cfg_sq.faiss_nprobe).collect()]
        for qid, qv in queries
    }
    rows.append({
        "index": f"IVFSQ8 nlist={len(sq_tier.centroids)}",
        "config": f"nprobe={cfg_sq.faiss_nprobe}, no refine",
        "recall": recall(got),
        "probe_frac": probe_fraction(sq_tier.centroids, sq_sizes, cfg_sq.faiss_nprobe),
        "build_s": sq_build,
        "search_s_per_q": round((time.time() - t0) / len(queries), 3),
    })
    sq_tier.indexed.unpersist()

    # ---- forced IVF at the auto nlist and at FAISS-recipe 4·√n ----
    recipe_nlist = int(4 * n ** 0.5)
    for nlist, sample_n in ((len(tier.centroids), 10_000), (recipe_nlist, 39 * recipe_nlist)):
        t0 = time.time()
        sample = sample_vectors(emb, "embedding", sample_n, 42)
        cents = train_centroids(emb, "embedding", nlist, sample=sample)
        indexed = assign_clusters(emb, cents, "embedding").cache()
        indexed.count()
        build_s = round(time.time() - t0, 2)
        sizes = {
            r.cluster_id: r.cnt
            for r in indexed.groupBy("cluster_id").agg(F.count("*").alias("cnt")).collect()
        }
        for nprobe in (8, 16, 32, 64):
            if nprobe > nlist:
                continue
            t0 = time.time()
            got = {
                qid: [r.id for r in
                      ivf_search(indexed, cents, qv, k=k, nprobe=nprobe,
                                 id_col="vec_id", vec_col="embedding").collect()]
                for qid, qv in queries
            }
            rows.append({
                "index": f"IVF nlist={len(cents)} (sample={sample_n})",
                "config": f"nprobe={nprobe}",
                "recall": recall(got),
                "probe_frac": probe_fraction(cents, sizes, nprobe),
                "build_s": build_s,
                "search_s_per_q": round((time.time() - t0) / len(queries), 3),
            })
        indexed.unpersist()

    # ---- LSH (pre-bucketed index table, the repeated-query shape) ----
    from customkb_spark.embedding.lsh import assign_lsh_buckets

    for nbits, probes in ((12, 1), (16, 1), (16, 2)):
        planes = random_hyperplanes(dim, nbits, 42)
        t0 = time.time()
        bucketed = assign_lsh_buckets(emb, planes, "embedding").cache()
        bucketed.count()
        lsh_build = round(time.time() - t0, 2)
        t0 = time.time()
        got = {
            qid: [r.id for r in
                  lsh_search(bucketed, qv, planes, k=k, id_col="vec_id",
                             vec_col="embedding", multiprobe_hamming=probes).collect()]
            for qid, qv in queries
        }
        expected_frac = sum(
            __import__("math").comb(nbits, h) for h in range(probes + 1)
        ) / (2 ** nbits)
        rows.append({
            "index": f"LSH nbits={nbits}",
            "config": f"hamming≤{probes}",
            "recall": recall(got),
            "probe_frac": round(expected_frac, 4),
            "build_s": lsh_build,
            "search_s_per_q": round((time.time() - t0) / len(queries), 3),
        })
        bucketed.unpersist()

    print(f"| index | search config | recall@{k} | probe frac | build s | s/query |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['index']} | {r['config']} | {r['recall']} "
              f"| {r['probe_frac']} | {r['build_s']} | {r['search_s_per_q']} |")
    print()
    print(json.dumps({
        "n": n, "dim": dim, "planted_clusters": n_clusters,
        "n_queries": n_queries, "k": k, "aniso": int(aniso), "rows": rows,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
