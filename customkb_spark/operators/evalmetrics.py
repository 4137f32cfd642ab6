"""Retrieval-quality evaluation metrics (recall@k, precision@k, MRR,
nDCG@k, AP@k) over a retrieval run.

The reference evaluates its vector index with exactly these numbers
(reference docs/vector-db-evaluation.md's recall tables; this repo's
BASELINE.md clustered-recall tables are the same shape) — this module
makes the computation a first-class distributed operator so any
retrieval surface (exact kNN, IVF/PQ/SQ tiers, BM25, fusion) can be
scored against a relevance set at corpus scale.

Inputs are two plain tables, so the operator composes with everything:

- ``hits``:  one row per retrieved item — ``(qid, id, rank)`` with
  rank 1-based within its query (the contract every top-k operator in
  this package already emits);
- ``qrels``: one row per relevant item — ``(qid, id)``. Binary
  relevance (the graded-DCG extension is a one-line gain change,
  deliberately left out so the DuckDB oracle mirrors textually).

Scale shape: one (qid, id)-keyed left join of the rank-bounded hits
against qrels (both sides pre-shrunk: hits ≤ Q×k rows, qrels is the
relevance set — broadcast when small, co-partitioned otherwise; AQE
decides, no hint), one per-qid window over ≤ k rows for the running
relevant count (bounded by k, never corpus-sized), one partial-agg
groupBy(qid), and an n_rel groupBy on qrels. Nothing touches a corpus:
evaluating a run over 10⁶ queries × k=100 is a 10⁸-row job whatever
the corpus size behind it.

Metric definitions (per query, binary relevance, cutoff k):

- ``recall_k``    = |retrieved ∩ relevant| / |relevant|
- ``precision_k`` = |retrieved ∩ relevant| / k
- ``mrr``         = 1 / rank of the first relevant hit (0 if none)
- ``ndcg_k``      = DCG / IDCG with DCG = Σ 1/log2(rank+1) over
  relevant hits and IDCG = Σ_{i=1..min(k,|relevant|)} 1/log2(i+1)
- ``ap_k``        = Σ_{relevant hits} (relevant_so_far(rank)/rank)
  / min(|relevant|, k)  (the TREC AP@k convention)

Queries present in ``qrels`` but absent from ``hits`` (retrieval came
back empty) score 0 everywhere; queries in ``hits`` with no relevance
judgments get NULL metrics (excluded from macro averages, the
trec_eval convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def retrieval_metrics(
    hits: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics; see module docstring for definitions.
    Returns ``(qid_col, n_rel, n_hit_rel, recall_k, precision_k, mrr,
    ndcg_k, ap_k)``, metrics rounded to 6 dp."""
    h = hits.filter(F.col(rank_col) <= k).select(qid_col, id_col, rank_col)
    r = qrels.select(qid_col, id_col).withColumn("_rel", F.lit(1))
    j = h.join(r, [qid_col, id_col], "left").withColumn(
        "_rel", F.coalesce(F.col("_rel"), F.lit(0))
    )
    w = (
        Window.partitionBy(qid_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = j.withColumn("_cumrel", F.sum("_rel").over(w))
    per = j.groupBy(qid_col).agg(
        F.sum("_rel").cast("long").alias("n_hit_rel"),
        F.min(F.when(F.col("_rel") == 1, F.col(rank_col))).alias("_first"),
        F.sum(
            F.when(F.col("_rel") == 1, 1.0 / F.log2(F.col(rank_col) + 1))
        ).alias("_dcg"),
        F.sum(
            F.when(F.col("_rel") == 1, F.col("_cumrel") / F.col(rank_col))
        ).alias("_psum"),
    )
    n_rel = qrels.groupBy(qid_col).agg(F.count("*").cast("long").alias("n_rel"))
    out = per.join(n_rel, qid_col, "full")
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_rel"))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    judged = F.col("n_rel").isNotNull()
    return out.select(
        qid_col,
        F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
        F.coalesce("n_hit_rel", F.lit(0)).alias("n_hit_rel"),
        F.when(
            judged,
            F.round(F.coalesce("n_hit_rel", F.lit(0)) / F.col("n_rel"), 6),
        ).alias("recall_k"),
        F.when(
            judged, F.round(F.coalesce("n_hit_rel", F.lit(0)) / F.lit(k), 6)
        ).alias("precision_k"),
        F.when(
            judged, F.round(F.coalesce(1.0 / F.col("_first"), F.lit(0.0)), 6)
        ).alias("mrr"),
        F.when(
            judged, F.round(F.coalesce(F.col("_dcg") / idcg, F.lit(0.0)), 6)
        ).alias("ndcg_k"),
        F.when(
            judged,
            F.round(
                F.coalesce(
                    F.col("_psum") / F.least(F.col("n_rel"), F.lit(k)),
                    F.lit(0.0),
                ),
                6,
            ),
        ).alias("ap_k"),
    )


def macro_average(metrics: DataFrame) -> DataFrame:
    """Mean of each metric over the JUDGED queries (NULL metrics —
    unjudged queries — drop out of avg() by SQL semantics). One scalar
    row; the partial-agg twin of trec_eval's 'all' line."""
    return metrics.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("recall_k"), 6).alias("recall_k"),
        F.round(F.avg("precision_k"), 6).alias("precision_k"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("ndcg_k"), 6).alias("ndcg_k"),
        F.round(F.avg("ap_k"), 6).alias("ap_k"),
    )
