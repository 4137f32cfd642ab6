"""Product quantization — the reference's IVFPQ tier for large corpora
(embed_manager.py:199-213: IVF + 8-bit PQ with ≤16 subquantizers once
the corpus passes medium_dataset_threshold).

Why this exists at 100 TB: a float32×1024-dim vector is 4 KB/row; PQ
codes at m=16 subquantizers are 16 bytes — a 256× storage/scan
reduction, which is the difference between the vector table fitting in
the page cache or not. The Spark shapes:

  train:  seeded uniform sample → per-subvector k-means codebooks
          (driver/NumPy, exactly like FAISS PQ training on a sample)
  encode: one Arrow-batched pandas UDF pass adds ``pq_code``
          (array<smallint>, m entries) — vectorized argmin over each
          sub-block; with IVF centroids given, codes encode the
          RESIDUAL (vec - centroid) like FAISS IVFPQ
  search: asymmetric distance (ADC) — the query builds per-probed-
          cluster lookup tables driver-side (m×2^nbits floats, tiny),
          broadcast-joined on cluster_id; scoring is a JVM-side
          zip_with + aggregate over the code array: NO Python, no
          shuffle, reads only probed clusters (partition pruning when
          the table is written partitioned by cluster_id)
  refine: optional exact re-scoring of the ADC top (k×refine_factor)
          against the full vectors — the standard PQ re-rank that
          recovers near-exact recall while scanning full vectors for only
          a few hundred rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customkb_spark.embedding.index import lloyd_kmeans, nearest_clusters, sample_vectors


def _assign_nearest(x: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Row-wise nearest-center argmin in the BLAS form
    ``argmin(|c|² − 2·x·Cᵀ)`` (the per-row |x|² term can't change the
    argmin) — one (n × k) matrix instead of the naive broadcast
    subtraction's (n × k × dim) temp, which at a 10k-row Arrow batch ×
    512 centroids × 256 dims is a ~10 GB allocation PER TASK (×32
    local threads ⇒ memory thrash). First-minimum tiebreak matches
    index.assign_clusters' array_position semantics."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    c = np.ascontiguousarray(centers, dtype=np.float64)
    d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
    return d2.argmin(axis=1)


@dataclass
class PQModel:
    """Trained codebooks: (m, 2^nbits, dsub). ``centroids`` non-None ⇒
    codes are residuals vs the IVF centroid (FAISS IVFPQ semantics).
    ``rotation`` non-None ⇒ OPQ (Ge et al. 2014): residuals are rotated
    by the orthonormal (d×d) matrix before coding, and queries are
    rotated symmetrically at search — rotation commutes with both
    metrics (‖Rx‖=‖x‖, (Rq)·(Rx)=q·x), so every downstream contract
    (ADC decomposition, IP bias, refine) is unchanged."""

    codebooks: np.ndarray
    centroids: np.ndarray | None = None
    rotation: np.ndarray | None = None

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def _pq_encode_decode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Quantize-and-reconstruct a sample against codebooks (training
    helper; the distributed encode is ``encode_pq``)."""
    m, _, dsub = books.shape
    recon = np.empty_like(x)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        recon[:, j * dsub : (j + 1) * dsub] = books[j][_assign_nearest(sub, books[j])]
    return recon


def learn_opq_rotation(
    sample: np.ndarray,
    m: int,
    nbits: int = 8,
    iters: int = 4,
    kmeans_iters: int = 4,
    seed: int = 42,
) -> np.ndarray:
    """Orthonormal OPQ rotation over a bounded training sample (Ge et
    al. 2014, "Optimized Product Quantization"; FAISS ``OPQMatrix``).

    Init = the PARAMETRIC solution: eigendecompose the sample
    covariance and greedily allocate eigen-directions to the m
    subspaces balancing the per-subspace log-eigenvalue product (each
    subquantizer gets equal variance mass — the closed-form optimum
    under a Gaussian assumption). Then ``iters`` rounds of the
    NON-PARAMETRIC alternation: PQ-train on the rotated sample,
    reconstruct, and solve the orthogonal Procrustes problem
    ``min_R ‖X Rᵀ − recon‖_F`` via SVD. All driver-side NumPy on the
    k-means-discipline sample — the corpus never participates in
    rotation learning. Deterministic (seeded k-means, LAPACK SVD).
    """
    x = np.ascontiguousarray(sample, dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"m={m} must divide dim={d}")
    dsub = d // m
    cov = (x.T @ x) / max(n, 1)
    w, u = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w, u = w[order], u[:, order]
    # balanced allocation: next-largest eigenvalue goes to the open
    # bucket with the smallest accumulated log-product
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for i in range(d):
        open_b = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda t: (logs[t], t))
        buckets[b].append(i)
        logs[b] += float(np.log(max(w[i], 1e-12)))
    perm = [i for b in buckets for i in b]
    rot = u[:, perm].T  # rows are eigenvectors: x' = R @ x
    ksub = 1 << nbits
    for _ in range(iters):
        xr = x @ rot.T
        books = np.stack(
            [
                lloyd_kmeans(xr[:, j * dsub : (j + 1) * dsub], ksub, kmeans_iters, seed + j)
                for j in range(m)
            ]
        )
        recon = _pq_encode_decode(xr, books)
        # min_Ω ‖XΩ − recon‖, ΩᵀΩ=I ⇒ Ω = UVᵀ for XᵀY = USVᵀ; R = Ωᵀ
        us, _s, vt = np.linalg.svd(x.T @ recon)
        rot = (us @ vt).T
    return rot


def train_pq(
    vectors: DataFrame,
    vec_col: str = "vector",
    m: int = 8,
    nbits: int = 8,
    centroids: np.ndarray | None = None,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    sample: np.ndarray | None = None,
    opq: bool = False,
    opq_iters: int = 4,
) -> PQModel:
    """Per-subvector codebooks from a seeded uniform sample.

    ``m`` must divide the dimension (reference caps m at dims//64 for
    the same reason, embed_manager.py:209). With ``centroids`` the
    training sample is converted to residuals first (IVFPQ).
    ``sample`` short-circuits the collection (share one sample across
    IVF + PQ training). ``opq=True`` learns an orthonormal rotation of
    the (residual) space first (``learn_opq_rotation``) and trains the
    codebooks in the rotated space — lower quantization error when
    dimensions are correlated or variance is unevenly spread (real
    embedding models, PCA'd features), identical plan shapes
    everywhere downstream."""
    if sample is None:
        sample = sample_vectors(vectors, vec_col, sample_size, seed)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    if centroids is not None:
        sample = sample - centroids[_assign_nearest(sample, centroids)]
    rotation = None
    if opq:
        rotation = learn_opq_rotation(sample, m, nbits, opq_iters, seed=seed)
        sample = sample @ rotation.T
    dsub = dim // m
    ksub = 1 << nbits
    books = np.stack(
        [
            lloyd_kmeans(sample[:, j * dsub : (j + 1) * dsub], ksub, iters, seed + j)
            for j in range(m)
        ]
    )
    return PQModel(books, centroids, rotation)


def encode_pq(
    vectors: DataFrame,
    model: PQModel,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """(id[, cluster_id], pq_code): one vectorized Arrow pass.

    Residual mode derives ``cluster_id`` inside the same pass (no
    separate assignment job). Output drops the full vector — the point
    is that downstream search scans codes, not floats; keep the
    original table around for the refine step."""
    books = model.codebooks
    cents = model.centroids
    rot = model.rotation
    m, dsub = model.m, model.dsub
    fields = [T.StructField(id_col, vectors.schema[id_col].dataType)]
    if cents is not None:
        fields.append(T.StructField("cluster_id", T.IntegerType()))
    fields.append(T.StructField("pq_code", T.ArrayType(T.ShortType())))
    schema = T.StructType(fields)
    src = vectors.select(id_col, vec_col)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col]
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out = {id_col: ids}
            if cents is not None:
                assign = _assign_nearest(x, cents)
                out["cluster_id"] = assign.astype(np.int32)
                x = x - cents[assign]
            if rot is not None:
                x = x @ rot.T
            codes = np.empty((len(x), m), dtype=np.int16)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = _assign_nearest(sub, books[j]).astype(np.int16)
            out["pq_code"] = list(codes)
            yield pd.DataFrame(out)

    return src.mapInPandas(enc, schema=schema)


def _adc_lut(model: PQModel, query: np.ndarray, metric: str) -> list[list[float]]:
    """(m, ksub) lookup table: distance/similarity contribution of each
    sub-centroid to the query's matching subvector.

    Residual-mode callers must pass the right ``query`` per metric:
    L2 wants the query RESIDUAL (q − c), since ‖q−(c+r)‖² =
    ‖(q−c)−r‖² decomposes over subvectors of q−c; IP wants the RAW
    query, since q·(c+r) = q·c + Σⱼ q⁽ʲ⁾·rⱼ — the q·c term is a
    per-cell constant added OUTSIDE the LUT (pq_topk's ``_bias``).
    Building the IP LUT from q−c instead scores (q−c)·r = q·r − c·r:
    the missing q·c bias breaks ranking ACROSS probed cells and the
    spurious −c·r term perturbs it within a cell — on clustered
    corpora (where q·c dominates) recall collapses to ≈0. FAISS's
    IndexIVFPQ applies the same decomposition for METRIC_INNER_PRODUCT."""
    m, dsub = model.m, model.dsub
    lut = []
    for j in range(m):
        qs = query[j * dsub : (j + 1) * dsub]
        if metric == "ip":
            lut.append((model.codebooks[j] @ qs).tolist())
        else:  # l2
            lut.append((((model.codebooks[j] - qs) ** 2).sum(axis=1)).tolist())
    return lut


def pq_topk(
    encoded: DataFrame,
    model: PQModel,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 8,
    metric: str = "ip",
    id_col: str = "id",
    vectors: DataFrame | None = None,
    vec_col: str = "vector",
    refine_factor: int = 4,
) -> DataFrame:
    """ADC top-k over PQ codes; optional exact refine.

    ``metric='ip'`` returns highest inner product (cosine if both sides
    are L2-normalized); ``'l2'`` lowest squared distance. With
    ``vectors`` given, the ADC top ``k*refine_factor`` candidates are
    re-scored exactly (one broadcast-semi-joined scan of the full
    vectors) — the FAISS-style re-rank that makes PQ recall near-exact.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    asc = metric != "ip"
    # OPQ: codes live in the rotated space, so the LUT query rotates
    # symmetrically — IP's q·c bias stays in the ORIGINAL space
    # (q·x = q·c + (Rq)·R(x−c) for orthonormal R)
    rot = model.rotation

    def _lut_query(vec: np.ndarray) -> np.ndarray:
        return rot @ vec if rot is not None else vec

    if model.centroids is not None:
        probes = nearest_clusters(query_vec, model.centroids, nprobe)
        # metric-specific decomposition (see _adc_lut): L2 tables take
        # the query residual; IP tables take the raw query plus a
        # per-cell q·c bias column carried on the broadcast LUT row
        luts = [
            (
                int(c),
                _adc_lut(
                    model,
                    _lut_query(q if metric == "ip" else q - model.centroids[c]),
                    metric,
                ),
                float(q @ model.centroids[c]) if metric == "ip" else 0.0,
            )
            for c in probes
        ]
        spark = encoded.sparkSession
        lut_df = F.broadcast(
            spark.createDataFrame(
                luts, "cluster_id int, _lut array<array<double>>, _bias double"
            )
        )
        # inner join = the nprobe pruning filter AND the LUT lookup
        scored_src = encoded.join(lut_df, "cluster_id")
        lut_col = F.col("_lut")
        bias_col = F.col("_bias")
    else:
        lut_col = F.lit(_adc_lut(model, _lut_query(q), metric))
        bias_col = F.lit(0.0)
        scored_src = encoded
    # r9: unrolled over the m subquantizers (model.m is pinned) — the
    # zip_with/aggregate HOF pair was interpreted per element; same
    # left-fold order from the bias, so ADC scores are bit-identical
    code = F.col("pq_code")
    score = bias_col
    for i in range(1, int(model.m) + 1):
        score = score + F.element_at(
            F.element_at(lut_col, i), F.element_at(code, i).cast("int") + 1
        )
    scored = scored_src.select(
        F.col(id_col).alias("id"), F.round(score, 6).alias("adc_score")
    )
    ordered = scored.orderBy(
        F.asc("adc_score") if asc else F.desc("adc_score"), F.asc("id")
    )
    if vectors is None:
        return ordered.limit(k)
    cands = F.broadcast(ordered.limit(k * refine_factor).select("id"))
    from customkb_spark.operators.topk import brute_force_topk

    exact_src = vectors.join(cands, vectors[id_col] == cands["id"]).select(
        vectors[id_col].alias(id_col), vec_col
    )
    return brute_force_topk(exact_src, query_vec, k, id_col, vec_col, metric)
