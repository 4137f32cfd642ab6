"""OPQ rotation (Ge et al. 2014) — orthonormality, quantization-error
improvement on correlated data, rotated-ADC == IP-of-reconstruction,
end-to-end recall, and persistence round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from customkb_spark.embedding.index import train_centroids
from customkb_spark.embedding.pq import (
    _assign_nearest,
    _pq_encode_decode,
    encode_pq,
    learn_opq_rotation,
    pq_topk,
    train_pq,
)
from customkb_spark.operators.topk import brute_force_topk


def _correlated_sample(n=1500, d=32, seed=7, mixed=True):
    """Anisotropic Gaussians — the regime OPQ exists for. ``mixed``
    rotates by a random orthonormal basis (cross-correlated dims; OPQ's
    PCA step decorrelates, ~10% error cut); ``mixed=False`` keeps the
    decaying spectrum axis-aligned, where plain PQ's contiguous split
    piles all the variance into the first buckets and OPQ's balanced
    eigen-allocation wins big (~40% cut — the paper's Figure 4
    shape)."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, d))
    spectrum = np.exp(-np.arange(d) / 4.0)
    if not mixed:
        return z * spectrum
    mix = rng.standard_normal((d, d))
    q, _ = np.linalg.qr(mix)
    return (z * spectrum) @ q.T


def test_rotation_is_orthonormal_and_deterministic():
    x = _correlated_sample()
    r1 = learn_opq_rotation(x, m=8, nbits=4, iters=3)
    r2 = learn_opq_rotation(x, m=8, nbits=4, iters=3)
    assert np.allclose(r1, r2)
    assert np.allclose(r1 @ r1.T, np.eye(x.shape[1]), atol=1e-9)
    # rotation preserves norms (the property every downstream metric
    # contract relies on)
    v = x[:50]
    assert np.allclose(
        np.linalg.norm(v @ r1.T, axis=1), np.linalg.norm(v, axis=1)
    )


def _recon_mse(x, books, rot=None):
    xr = x @ rot.T if rot is not None else x
    recon = _pq_encode_decode(xr, books)
    if rot is not None:
        recon = recon @ rot  # back to original space
    return float(((x - recon) ** 2).sum(axis=1).mean())


def test_opq_cuts_quantization_error_on_correlated_data(spark):
    dummy = spark.range(1)  # train_pq's sample= short-circuits the scan
    # axis-aligned anisotropy: balanced eigen-allocation ≥25% better
    x = _correlated_sample(mixed=False)
    plain = train_pq(dummy, m=8, nbits=4, sample=x, seed=3)
    opq = train_pq(dummy, m=8, nbits=4, sample=x, seed=3, opq=True)
    assert opq.rotation is not None and plain.rotation is None
    e_plain = _recon_mse(x, plain.codebooks)
    e_opq = _recon_mse(x, opq.codebooks, opq.rotation)
    assert e_opq < 0.75 * e_plain, (e_plain, e_opq)
    # cross-correlated basis: decorrelation still ≥5% better
    xm = _correlated_sample(mixed=True)
    plain_m = train_pq(dummy, m=8, nbits=4, sample=xm, seed=3)
    opq_m = train_pq(dummy, m=8, nbits=4, sample=xm, seed=3, opq=True)
    e_plain_m = _recon_mse(xm, plain_m.codebooks)
    e_opq_m = _recon_mse(xm, opq_m.codebooks, opq_m.rotation)
    assert e_opq_m < 0.95 * e_plain_m, (e_plain_m, e_opq_m)


def test_opq_residual_adc_is_ip_of_reconstruction(spark, embeddings):
    """The OPQ twin of the r6 IP-bias lock: with rotation R the
    reconstruction is c + Rᵀ·(concatenated codewords) and the ADC
    score must equal q·reconstruction exactly."""
    emb = embeddings.select("vec_id", "embedding").cache()
    cents = train_centroids(emb, "embedding", nlist=4, seed=1)
    model = train_pq(emb, "embedding", m=8, nbits=4, centroids=cents,
                     seed=1, opq=True)
    codes = encode_pq(emb, model, "vec_id", "embedding").cache()
    q = np.asarray(emb.filter("vec_id = 3").first()["embedding"], dtype=np.float64)
    got = {
        r["id"]: r["adc_score"]
        for r in pq_topk(codes, model, q.tolist(), k=10_000, nprobe=4,
                         metric="ip", id_col="vec_id").collect()
    }
    rows = codes.collect()
    assert len(got) == len(rows)
    for r in rows[:80]:
        rec_rot = np.concatenate(
            [model.codebooks[j][c] for j, c in enumerate(r["pq_code"])]
        )
        recon = model.centroids[r["cluster_id"]] + model.rotation.T @ rec_rot
        assert got[r["vec_id"]] == pytest.approx(float(q @ recon), abs=1e-4)


def test_opq_end_to_end_recall_with_refine(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding").cache()
    cents = train_centroids(emb, "embedding", nlist=4, seed=2)
    model = train_pq(emb, "embedding", m=8, nbits=6, centroids=cents,
                     seed=2, opq=True)
    codes = encode_pq(emb, model, "vec_id", "embedding")
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    exact = [r["id"] for r in
             brute_force_topk(emb, q, 10, "vec_id", "embedding", "ip").collect()]
    got = [
        r["id"]
        for r in pq_topk(codes, model, q, k=10, nprobe=4, metric="ip",
                         id_col="vec_id", vectors=emb, vec_col="embedding",
                         refine_factor=8).collect()
    ]
    assert len(set(got) & set(exact)) / len(exact) >= 0.9


def test_opq_persistence_roundtrip(spark, embeddings, tmp_path):
    from customkb_spark.embedding.store import load_pq, save_pq

    emb = embeddings.select("vec_id", "embedding")
    cents = train_centroids(emb, "embedding", nlist=4, seed=5)
    model = train_pq(emb, "embedding", m=4, nbits=4, centroids=cents,
                     seed=5, opq=True)
    path = str(tmp_path / "opq_model")
    save_pq(spark, model, path)
    loaded = load_pq(spark, path)
    assert loaded.rotation is not None
    assert np.allclose(loaded.rotation, model.rotation)
    assert np.allclose(loaded.codebooks, model.codebooks)
    assert np.allclose(loaded.centroids, model.centroids)
    # identical search results through the loaded model
    codes = encode_pq(emb, model, "vec_id", "embedding").cache()
    q = [float(x) for x in emb.filter("vec_id = 2").first()["embedding"]]
    a = pq_topk(codes, model, q, k=5, nprobe=4, metric="ip", id_col="vec_id").collect()
    b = pq_topk(codes, loaded, q, k=5, nprobe=4, metric="ip", id_col="vec_id").collect()
    assert [(r.id, r.adc_score) for r in a] == [(r.id, r.adc_score) for r in b]


def test_flat_opq_no_centroids(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding")
    model = train_pq(emb, "embedding", m=8, nbits=6, seed=4, opq=True)
    codes = encode_pq(emb, model, "vec_id", "embedding")
    q = [float(x) for x in emb.filter("vec_id = 1").first()["embedding"]]
    got = pq_topk(codes, model, q, k=10, metric="ip", id_col="vec_id").collect()
    assert 1 in [r.id for r in got]  # self-hit surfaces under rotation
