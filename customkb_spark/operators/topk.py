"""Vector top-k search — exact brute force and k-NN join.

Exact path (the correctness oracle, reference FAISS IndexFlat behavior,
query/search.py:242-267): score every vector against the query with a
JVM-side dot product and TakeOrderedAndProject the top k. Catalyst
compiles ``orderBy(desc).limit(k)`` to a per-partition top-k heap +
driver merge — no full sort, no shuffle of the losers. At 100 TB the
scan is embarrassingly parallel and the reduction is k×partitions rows.

Batch path (`knn_join`): a query *set* is broadcast and scored against
all vectors in one pass — one scan regardless of query count, then a
per-query window top-k. This is the shape that beats per-query loops by
orders of magnitude on a cluster.

Ties are broken by id ascending so results are deterministic and
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from customkb_spark.functions import vector as V


def _metric_score(vec, qvec, metric: str, dims: int | None = None):
    """Column-vs-column similarity under the shared metric contract
    (higher = closer for every metric, l2 via l2_to_similarity).

    ``dims`` (the fixed embedding width, when the caller knows it)
    switches the fold to the UNROLLED codegen-able form — bit-identical
    scores, ~10-50× faster per pair (functions/vector.py docstring)."""
    if metric == "cosine":
        return V.cosine(vec, qvec, dims)
    if metric == "ip":
        return V.dot(vec, qvec, dims)
    if metric == "l2":
        return V.l2_to_similarity(V.l2_distance(vec, qvec, dims))
    raise ValueError(f"unknown metric {metric}")


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "vector",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k for a single query vector.

    Returns (id, score) with score rounded to 6 dp (float32 inputs are
    upcast to double; rounding removes summation-order noise).
    """
    q = F.lit(query_vec).cast("array<double>")
    # dims comes free from the query vector — every brute-force scan
    # (and the ANN refine paths that call this) gets the unrolled
    # whole-stage-codegen score instead of the interpreted HOF fold
    score = _metric_score(F.col(vec_col), q, metric, dims=len(query_vec))
    return (
        vectors.select(F.col(id_col).alias("id"), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    id_col: str = "id",
    vec_col: str = "vector",
    metric: str = "cosine",
    dims: int | None = None,
) -> DataFrame:
    """Top-k neighbors for every query row (broadcast k-NN join).

    Plan shape: BroadcastNestedLoopJoin(queries) → project(score) →
    window top-k partitioned by query. The vectors side is never
    shuffled; for Q queries the shuffle is only Q×k result rows.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qvec")
        )
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vector"))
    score = _metric_score(F.col("vector"), F.col("qvec"), metric, dims)
    scored = v.crossJoin(q).select(
        "qid", "id", F.round(score, 6).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "score", "rank")
    )
