"""Scalar quantization tier (SQ8 — FAISS IndexScalarQuantizer family):
reconstruction-exact scoring, compression, recall, IVF coupling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from customkb_spark.embedding.index import train_centroids
from customkb_spark.embedding.sq import encode_sq, sq_topk, train_sq
from customkb_spark.operators.topk import brute_force_topk


@pytest.fixture(scope="module")
def sq_setup(spark, embeddings):
    emb = embeddings.select("vec_id", "embedding").cache()
    model = train_sq(emb, "embedding", nbits=8)
    codes = encode_sq(emb, model, "vec_id", "embedding").cache()
    return emb, model, codes


def test_sq_shapes_and_compression(sq_setup):
    emb, model, codes = sq_setup
    dim = len(emb.first()["embedding"])
    assert model.dim == dim
    assert codes.count() == emb.count()
    row = codes.first()
    assert len(row["sq_code"]) == dim
    assert all(0 <= c <= 255 for c in row["sq_code"])
    # uint8/dim vs float32/dim — the fixed 4× storage cut SQ8 is for
    assert (dim * 4) / (dim * 1) == 4


def test_sq_score_is_exact_ip_of_reconstruction(sq_setup):
    """The ADC-style score must equal q·(vmin + scale·code) for every
    row — the same reconstruction-equality lock as PQ's r6 test, which
    would catch any dropped bias/weight term."""
    emb, model, codes = sq_setup
    q = np.asarray(emb.filter("vec_id = 3").first()["embedding"], dtype=np.float64)
    got = {
        r["id"]: r["sq_score"]
        for r in sq_topk(codes, model, q.tolist(), k=100_000,
                         metric="ip", id_col="vec_id").collect()
    }
    for r in codes.limit(100).collect():
        recon = model.vmin + model.scale * np.asarray(r["sq_code"], dtype=np.float64)
        assert got[r["vec_id"]] == pytest.approx(float(q @ recon), abs=1e-4)

    got_l2 = {
        r["id"]: r["sq_score"]
        for r in sq_topk(codes, model, q.tolist(), k=100_000,
                         metric="l2", id_col="vec_id").collect()
    }
    for r in codes.limit(50).collect():
        recon = model.vmin + model.scale * np.asarray(r["sq_code"], dtype=np.float64)
        assert got_l2[r["vec_id"]] == pytest.approx(
            float(((q - recon) ** 2).sum()), abs=1e-4
        )


def test_sq_recall_near_exact_without_refine(sq_setup):
    """8-bit per-dim error is ~0.2% of the value range — top-10 under
    SQ must recover ≥0.8 of the exact IP top-10 with NO refine pass
    (the tier's selling point vs PQ). Self-hit must rank first."""
    emb, model, codes = sq_setup
    q = [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]
    exact = [r["id"] for r in
             brute_force_topk(emb, q, 10, "vec_id", "embedding", "ip").collect()]
    got = [r["id"] for r in
           sq_topk(codes, model, q, k=10, metric="ip", id_col="vec_id").collect()]
    assert got[0] == 7
    assert len(set(got) & set(exact)) >= 8


def test_sq_ivf_coupling_prunes_and_degenerate_dims(spark, embeddings):
    """With centroids: codes carry cluster_id, nprobe filters the scan,
    full probe equals the unpruned ranking. A constant dimension gets
    scale 0 and reconstructs exactly."""
    emb = embeddings.select("vec_id", "embedding").filter("vec_id < 500").cache()
    const = emb.select(
        "vec_id", F.concat(F.col("embedding"), F.array(F.lit(2.5))).alias("embedding")
    )
    cents = train_centroids(const, "embedding", nlist=8, seed=1)
    model = train_sq(const, "embedding", centroids=cents, seed=1)
    assert model.scale[-1] == 0.0  # degenerate dim
    codes = encode_sq(const, model, "vec_id", "embedding").cache()
    assert "cluster_id" in codes.columns
    q = [float(x) for x in const.filter("vec_id = 3").first()["embedding"]]
    full = [(r["id"], r["sq_score"]) for r in
            sq_topk(codes, model, q, k=10, nprobe=8, id_col="vec_id").collect()]
    # full probe == no pruning at all (model without centroids, same grid)
    flat = [(r["id"], r["sq_score"]) for r in
            sq_topk(codes, model.__class__(model.vmin, model.scale, model.nbits),
                    q, k=10, id_col="vec_id").collect()]
    assert full == flat
    # pruned probe scans fewer rows and still self-hits
    pruned = sq_topk(codes, model, q, k=10, nprobe=2, id_col="vec_id").collect()
    assert pruned[0]["id"] == 3
    # the constant dim decodes exactly: reconstruction last coord == 2.5
    r = codes.filter("vec_id = 3").first()
    recon_last = model.vmin[-1] + model.scale[-1] * r["sq_code"][-1]
    assert recon_last == pytest.approx(2.5, abs=1e-9)


def test_ivfsq_tier_build_search_and_persistence(spark, embeddings, tmp_path):
    """Opt-in tier: cfg.ann_index='ivfsq' builds SQ8 codes + IVF cells;
    tier.topk self-hits and overlaps exact; save/load round-trips the
    grid and returns identical results (the <kb>.faiss-analogue path)."""
    from customkb_spark.config import KBConfig
    from customkb_spark.embedding.auto import build_vector_index
    from customkb_spark.embedding.store import load_vector_index, save_vector_index

    emb = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).cache()
    tier = build_vector_index(emb, KBConfig(ann_index="ivfsq"))
    assert tier.kind == "ivfsq" and tier.sq is not None
    assert "cluster_id" in tier.indexed.columns
    q = [float(x) for x in emb.filter("id = 5").first()["vector"]]
    exact = [r["id"] for r in brute_force_topk(emb, q, 10).collect()]
    got = [(r["id"], r["score"]) for r in tier.topk(q, 10, nprobe=512).collect()]
    assert got[0][0] == 5
    assert len({i for i, _ in got} & set(exact)) >= 8

    path = str(tmp_path / "vindex")
    save_vector_index(tier, path)
    loaded = load_vector_index(spark, path, emb)
    assert loaded is not None and loaded.kind == "ivfsq"
    np.testing.assert_allclose(loaded.sq.vmin, tier.sq.vmin)
    np.testing.assert_allclose(loaded.sq.scale, tier.sq.scale)
    got2 = [(r["id"], r["score"]) for r in loaded.topk(q, 10, nprobe=512).collect()]
    assert got2 == got


def test_ivfsq_absorbs_appends_like_ivf(spark, embeddings, tmp_path):
    """FAISS-add semantics for the SQ tier: a persisted ivfsq index
    reloaded against an APPENDED vectors table encodes only the new
    rows with the frozen grid+centroids (no retrain); searches then see
    the appended vector. An in-place re-embed still invalidates."""
    from customkb_spark.config import KBConfig
    from customkb_spark.embedding.auto import build_vector_index
    from customkb_spark.embedding.store import load_vector_index, save_vector_index

    base = embeddings.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).filter("id < 500").cache()
    tier = build_vector_index(base, KBConfig(ann_index="ivfsq"))
    path = str(tmp_path / "vindex")
    save_vector_index(tier, path)

    novel = base.filter("id = 3").select(
        F.lit(999_999).alias("id"), F.col("vector")
    )
    appended = base.unionByName(novel).cache()
    loaded = load_vector_index(spark, path, appended)
    assert loaded is not None and loaded.kind == "ivfsq"
    assert loaded.indexed.filter("id = 999999").count() == 1
    q = [float(x) for x in base.filter("id = 3").first()["vector"]]
    got = [r["id"] for r in loaded.topk(q, 3, nprobe=512).collect()]
    assert 999_999 in got and 3 in got  # the clone and its twin both hit

    # in-place mutation of an existing id → stale, rebuild required
    mutated = appended.withColumn(
        "vector",
        F.when(F.col("id") == 7, F.expr("transform(vector, x -> x + 1.0)"))
        .otherwise(F.col("vector")),
    )
    assert load_vector_index(spark, path, mutated) is None


def test_sq_quantization_error_bound_property(spark):
    """Hypothesis-style invariant: for any vector inside the trained
    range, per-dim reconstruction error ≤ scale/2 + eps (the grid's
    rounding radius), hence |q·x̂ − q·x| ≤ Σ|qᵢ|·scaleᵢ/2 — the bound
    that makes SQ8's no-refine ranking trustworthy."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(17)
    sample = rng.uniform(-2.0, 3.0, size=(2000, 8))
    from customkb_spark.embedding.sq import SQModel, train_sq

    vmin = sample.min(axis=0)
    vmax = sample.max(axis=0)
    model = SQModel(vmin, (vmax - vmin) / 255.0, 8)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(-2.0, 3.0, allow_nan=False), min_size=8, max_size=8))
    def check(vec):
        x = np.clip(np.asarray(vec, dtype=np.float64), vmin, vmax)
        code = np.clip(np.rint((x - vmin) / np.where(model.scale > 0, model.scale, 1.0)),
                       0, 255)
        recon = vmin + model.scale * code
        assert np.all(np.abs(recon - x) <= model.scale / 2 + 1e-9)

    check()
