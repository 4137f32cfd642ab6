"""Product quantization (IVFPQ tier, reference embed_manager.py:199-213):
recall vs exact, residual encoding, compression, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from customkb_spark.embedding.index import train_centroids
from customkb_spark.embedding.pq import encode_pq, pq_topk, train_pq
from customkb_spark.operators.topk import brute_force_topk


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


@pytest.fixture(scope="module")
def pq_setup(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding").cache()
    model = train_pq(emb, "embedding", m=8, nbits=6, seed=42)
    codes = encode_pq(emb, model, "vec_id", "embedding").cache()
    return emb, model, codes


def test_pq_shapes_and_compression(pq_setup):
    emb, model, codes = pq_setup
    dim = len(emb.first()["embedding"])
    assert model.dim == dim and model.m == 8 and model.ksub == 64
    assert codes.count() == emb.count()
    row = codes.first()
    assert len(row["pq_code"]) == 8
    assert all(0 <= c < 64 for c in row["pq_code"])
    # 8 shorts vs dim float32: the storage win PQ exists for
    assert (dim * 4) / (model.m * 2) >= 16


def test_pq_adc_recall_with_refine(pq_setup):
    emb, model, codes = pq_setup
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    exact = [r["id"] for r in brute_force_topk(emb, q, 10, "vec_id", "embedding", "ip").collect()]
    refined = [
        r["id"]
        for r in pq_topk(
            codes, model, q, k=10, metric="ip",
            id_col="vec_id", vectors=emb, vec_col="embedding", refine_factor=8,
        ).collect()
    ]
    assert _recall(refined, exact) >= 0.9
    # ADC-only (no refine): on the near-orthogonal synthetic vectors the
    # quantized signal is weak, but the query's own vector must surface
    # and a non-trivial share of true neighbors with it
    adc = [r["id"] for r in pq_topk(codes, model, q, k=10, metric="ip", id_col="vec_id").collect()]
    assert 7 in adc
    assert _recall(adc, exact) >= 0.3


def test_ivfpq_residual_encoding_and_search(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    cents = train_centroids(emb, "embedding", nlist=8, seed=1)
    model = train_pq(emb, "embedding", m=8, nbits=6, centroids=cents, seed=1)
    codes = encode_pq(emb, model, "vec_id", "embedding").cache()
    assert "cluster_id" in codes.columns
    assert codes.filter("cluster_id IS NULL").count() == 0
    q = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    exact = [r["id"] for r in brute_force_topk(emb, q, 10, "vec_id", "embedding", "ip").collect()]
    got = [
        r["id"]
        for r in pq_topk(
            codes, model, q, k=10, nprobe=8, metric="ip",
            id_col="vec_id", vectors=emb, vec_col="embedding", refine_factor=8,
        ).collect()
    ]
    assert _recall(got, exact) >= 0.9  # nprobe=nlist + refine ⇒ near-exact
    # pruning: nprobe=2 scans a strict subset of clusters
    some = pq_topk(codes, model, q, k=10, nprobe=2, metric="ip", id_col="vec_id").collect()
    assert len(some) == 10


def test_pq_training_deterministic(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    m1 = train_pq(emb, "embedding", m=4, nbits=4, seed=9)
    m2 = train_pq(emb, "embedding", m=4, nbits=4, seed=9)
    assert np.allclose(m1.codebooks, m2.codebooks)


def test_pq_rejects_bad_m(spark, embeddings):
    with pytest.raises(ValueError, match="must divide"):
        train_pq(embeddings.select("vec_id", "embedding"), "embedding", m=7)

def test_residual_adc_score_is_ip_of_reconstruction(spark, embeddings):
    """Regression lock for the r6 IP-bias bug: in RESIDUAL (IVFPQ) mode
    the ADC inner-product score of every scanned row must equal
    q·(centroid + Σⱼ codewordⱼ) — the IP of the query with the PQ
    reconstruction. The broken version built the LUT from q − c (the
    L2 residual recipe), scoring q·r − c·r instead: missing the
    per-cell q·c bias, recall on clustered corpora collapsed to ≈0
    while structural tests (self-hit, determinism) still passed."""
    emb = embeddings.select("vec_id", "embedding").filter("vec_id < 500").cache()
    cents = train_centroids(emb, "embedding", nlist=8, seed=1)
    model = train_pq(emb, "embedding", m=8, nbits=4, centroids=cents, seed=1)
    codes = encode_pq(emb, model, "vec_id", "embedding").cache()
    q = np.asarray(emb.filter("vec_id = 3").first()["embedding"], dtype=np.float64)

    got = {
        r["id"]: r["adc_score"]
        for r in pq_topk(codes, model, q.tolist(), k=500, nprobe=8,
                         metric="ip", id_col="vec_id").collect()
    }
    code_rows = codes.collect()
    assert len(got) == len(code_rows)  # nprobe=nlist scans everything
    for r in code_rows:
        recon = model.centroids[r["cluster_id"]].copy()
        for j, c in enumerate(r["pq_code"]):
            recon[j * model.dsub : (j + 1) * model.dsub] += model.codebooks[j][c]
        assert got[r["vec_id"]] == pytest.approx(float(q @ recon), abs=1e-4)

    # and the L2 path: ADC distance == squared L2 to the reconstruction
    got_l2 = {
        r["id"]: r["adc_score"]
        for r in pq_topk(codes, model, q.tolist(), k=500, nprobe=8,
                         metric="l2", id_col="vec_id").collect()
    }
    for r in code_rows[:50]:
        recon = model.centroids[r["cluster_id"]].copy()
        for j, c in enumerate(r["pq_code"]):
            recon[j * model.dsub : (j + 1) * model.dsub] += model.codebooks[j][c]
        assert got_l2[r["vec_id"]] == pytest.approx(float(((q - recon) ** 2).sum()), abs=1e-4)
