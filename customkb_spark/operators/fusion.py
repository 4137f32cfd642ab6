"""Hybrid-search result fusion — RRF and weighted score merge.

Reference semantics (query/search.py:311-439):
- RRF: rank each result list independently (1-based, score desc), then
  rrf(d) = Σ_ranker 1/(k + rank_d) with k = 60. Documents missing from
  a ranker contribute nothing for it.
- Weighted: max-normalize each score set, then w_v·v + w_b·b
  (defaults 0.7/0.3); a missing side scores 0.

Spark shape: per-ranker row_number window → full-outer join on id →
coalesce. The inputs are top-k lists (tiny), so the joins broadcast;
at scale this stage is O(k), independent of corpus size.

Ties are broken by id ascending everywhere for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# hard ceiling on single-query ranker inputs: the single-partition rank
# window below is only safe because its input is bounded; this enforces
# the bound instead of trusting callers (mirrors bm25_max_results=1000)
FUSION_INPUT_BOUND = 1000


def _bounded(df: DataFrame, bound: int) -> DataFrame:
    """TakeOrdered pre-bound: even an unbounded (table-sized) ranker
    input reaches the rank window as ≤ ``bound`` rows. Planwise this is
    TakeOrderedAndProject — per-partition top-k then a merge of k-row
    partials — NOT a global sort, so enforcing the bound costs one scan
    of the input and never a single-partition shuffle of it."""
    return df.orderBy(F.desc("score"), F.asc("id")).limit(bound)


def _ranked(df: DataFrame, side: str, bound: int = FUSION_INPUT_BOUND) -> DataFrame:
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return _bounded(df, bound).select(
        "id",
        F.col("score").alias(f"{side}_score"),
        F.row_number().over(w).alias(f"{side}_rank"),
    )


def rrf_fuse(vec: DataFrame, kw: DataFrame, k: int = 60, top_k: int = 50) -> DataFrame:
    """Reciprocal-rank fusion of (id, score) result sets."""
    v, b = _ranked(vec, "vec"), _ranked(kw, "bm25")
    contrib_v = F.when(
        F.col("vec_rank").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("vec_rank"))
    ).otherwise(0.0)
    contrib_b = F.when(
        F.col("bm25_rank").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("bm25_rank"))
    ).otherwise(0.0)
    return (
        v.join(b, "id", "full_outer")
        .select("id", F.round(contrib_v + contrib_b, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )


def _max_normed(df: DataFrame, out: str, by_qid: bool = False) -> DataFrame:
    """score / max(score), max via a window — no driver round-trip.

    Single-query inputs are pre-bounded (``_bounded``) so the
    single-partition window sees ≤ FUSION_INPUT_BOUND rows; the batch
    window partitions by qid. The reference's ``max or 1.0``
    zero/empty guard is preserved."""
    if not by_qid:
        df = _bounded(df, FUSION_INPUT_BOUND)
    w = Window.partitionBy("qid") if by_qid else Window.partitionBy()
    m = F.max("score").over(w)
    safe_m = F.when(m.isNull() | (m == 0.0), F.lit(1.0)).otherwise(m)
    keys = ["qid", "id"] if by_qid else ["id"]
    return df.select(*keys, (F.col("score") / safe_m).alias(out))


def weighted_fuse(
    vec: DataFrame,
    kw: DataFrame,
    vector_weight: float = 0.7,
    top_k: int = 50,
) -> DataFrame:
    """Max-normalized weighted fusion (reference search.py:350-411)."""
    bm25_weight = 1.0 - vector_weight
    v = _max_normed(vec, "v_norm")
    b = _max_normed(kw, "b_norm")
    fused = (
        F.lit(vector_weight) * F.coalesce(F.col("v_norm"), F.lit(0.0))
        + F.lit(bm25_weight) * F.coalesce(F.col("b_norm"), F.lit(0.0))
    )
    return (
        v.join(b, "id", "full_outer")
        .select("id", F.round(fused, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(top_k)
    )


def weighted_fuse_batch(
    vec: DataFrame,
    kw: DataFrame,
    vector_weight: float = 0.7,
    top_k: int = 50,
) -> DataFrame:
    """Per-query weighted fusion over (qid, id, score) sets — the batch
    twin: per-qid max-normalization windows, full-outer on (qid, id)."""
    bm25_weight = 1.0 - vector_weight
    v = _max_normed(vec, "v_norm", by_qid=True)
    b = _max_normed(kw, "b_norm", by_qid=True)
    fused = (
        F.lit(vector_weight) * F.coalesce(F.col("v_norm"), F.lit(0.0))
        + F.lit(bm25_weight) * F.coalesce(F.col("b_norm"), F.lit(0.0))
    )
    merged = v.join(b, ["qid", "id"], "full_outer").select(
        "qid", "id", F.round(fused, 6).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def _ranked_batch(df: DataFrame, side: str) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return df.select(
        "qid",
        "id",
        F.col("score").alias(f"{side}_score"),
        F.row_number().over(w).alias(f"{side}_rank"),
    )


def rrf_fuse_batch(
    vec: DataFrame, kw: DataFrame, k: int = 60, top_k: int = 50
) -> DataFrame:
    """Per-query RRF over (qid, id, score) result sets — the batch twin
    of rrf_fuse; ranks and the final top-k are windows partitioned by
    qid, so Q queries fuse in one pass with a Q×k-row shuffle."""
    v, b = _ranked_batch(vec, "vec"), _ranked_batch(kw, "bm25")
    contrib_v = F.when(
        F.col("vec_rank").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("vec_rank"))
    ).otherwise(0.0)
    contrib_b = F.when(
        F.col("bm25_rank").isNotNull(), F.lit(1.0) / (F.lit(float(k)) + F.col("bm25_rank"))
    ).otherwise(0.0)
    fused = v.join(b, ["qid", "id"], "full_outer").select(
        "qid", "id", F.round(contrib_v + contrib_b, 6).alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        fused.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )
