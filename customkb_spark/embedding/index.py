"""IVF-style ANN index — the one genuinely custom engine component
(SURVEY.md §4, "needs a custom Spark component").

Mirrors FAISS IndexIVFFlat semantics (reference embed_manager.py:163-213,
nprobe search query/search.py:223-231) as a derived-table + pruned-scan
pattern:

  build:  sample vectors → k-means centroids (small, driver/NumPy —
          same as FAISS training on a ≤10k sample) → assign every
          vector its nearest centroid id with a JVM-side argmin
          expression → vectors table carries ``cluster_id``.
          At 100 TB: write the vectors table PARTITIONED BY cluster_id
          so probes become partition pruning, not filters.

  search: query → nprobe nearest centroids (driver, tiny) →
          scan only those clusters → exact top-k within.

Recall/speed trades exactly like IVFFlat: nprobe=nlist ⇒ exact.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import vector as V
from customkb_spark.operators.topk import brute_force_topk


def sample_vectors(
    vectors: DataFrame, vec_col: str, sample_size: int, seed: int
) -> np.ndarray:
    """Seeded *uniform* Bernoulli sample collected to the driver —
    ``limit(n)`` would take the first partitions only, which on an
    ingest-ordered corpus trains on one corner of the distribution and
    silently degrades recall at scale."""
    proj = vectors.select(vec_col)
    n_rows = proj.count()
    if n_rows > sample_size:
        # oversample 20% so the Bernoulli draw rarely undershoots,
        # then trim deterministically
        fraction = min(1.0, 1.2 * sample_size / n_rows)
        proj = proj.sample(fraction=fraction, seed=seed).limit(sample_size)
    return np.array([r[0] for r in proj.collect()], dtype=np.float64)


def lloyd_kmeans(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Plain Lloyd's on an in-memory sample (driver-side, same as FAISS
    training on a ≤10k sample, embed_manager.py:694-715)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), k, replace=False)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def train_centroids(
    vectors: DataFrame,
    vec_col: str = "vector",
    nlist: int = 16,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Lloyd's k-means on a seeded uniform driver-side sample.
    ``sample`` short-circuits the collection — callers training several
    artifacts from the same corpus (IVF + PQ) collect once."""
    if sample is None:
        sample = sample_vectors(vectors, vec_col, sample_size, seed)
    return lloyd_kmeans(sample, nlist, iters, seed)


def assign_clusters(
    vectors: DataFrame, centroids: np.ndarray, vec_col: str = "vector"
) -> DataFrame:
    """Add ``cluster_id`` = argmin L2 distance to centroid — a pure
    column expression (array of distances → array_position of min), so
    assignment runs JVM-side with no Python in the loop."""
    dists = F.array(
        *[
            V.l2_distance(F.col(vec_col), F.lit(c.tolist()).cast("array<double>"))
            for c in centroids
        ]
    )
    return vectors.withColumn(
        "cluster_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def nearest_clusters(query_vec: list[float], centroids: np.ndarray, nprobe: int) -> list[int]:
    q = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - q) ** 2).sum(axis=1)
    return [int(i) for i in d2.argsort()[:nprobe]]


def ivf_search_batch(
    indexed_vectors: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "id",
    vec_col: str = "vector",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    metric: str = "cosine",
) -> DataFrame:
    """IVF-pruned top-k for a whole query SET in one pass — the scale
    path for batch retrieval (operators/topk.knn_join is the exact
    brute-force twin that scores Q×N pairs; this scores only each
    query's ``nprobe`` probed clusters).

    Plan: probe pairs (qid, cluster_id) are computed driver-side from
    the tiny centroid table and BROADCAST; the corpus joins them on
    cluster_id (pruned scan — with the table partitioned by cluster_id
    this is partition pruning), then joins the broadcast query vectors,
    scores JVM-side, and windows top-k per query. The corpus is never
    shuffled; the only shuffle is the per-query window over candidate
    rows (≤ Q × probed-cluster sizes).
    """
    from pyspark.sql import Window

    from customkb_spark.operators.topk import _metric_score

    qrows = queries.select(query_id_col, query_vec_col).collect()
    probes = [
        (row[0], c)
        for row in qrows
        for c in nearest_clusters([float(x) for x in row[1]], centroids, nprobe)
    ]
    spark = indexed_vectors.sparkSession
    # qid field type mirrors the caller's query-id column — hardcoding
    # long breaks string/int-typed query ids at createDataFrame or,
    # worse, mismatches the join (ADVICE r2)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    probe_df = spark.createDataFrame(
        probes, f"{query_id_col} {qid_type}, cluster_id int"
    )
    cand = indexed_vectors.join(F.broadcast(probe_df), "cluster_id").join(
        F.broadcast(queries.select(query_id_col, query_vec_col)), query_id_col
    )
    score = _metric_score(F.col(vec_col), F.col(query_vec_col), metric)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("id"))
    return (
        cand.select(
            F.col(query_id_col),
            F.col(id_col).alias("id"),
            F.round(score, 6).alias("score"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def ivf_search(
    indexed_vectors: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "id",
    vec_col: str = "vector",
    metric: str = "cosine",
) -> DataFrame:
    """Probe the ``nprobe`` nearest clusters, exact top-k within them.

    The cluster filter is a pushed-down predicate; with the table
    partitioned by cluster_id it prunes files before the scan.
    """
    probes = nearest_clusters(query_vec, centroids, nprobe)
    pruned = indexed_vectors.filter(F.col("cluster_id").isin(probes))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col, metric)
