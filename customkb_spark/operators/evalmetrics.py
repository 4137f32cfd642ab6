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
- ``qrels``: one row per relevant item — ``(qid, id)``, optionally
  with a graded-relevance column (``gain_col``). Without grades every
  qrels row is relevant with gain 1 (binary); with grades a row is
  relevant iff its grade > 0 and contributes gain 2^grade − 1 to
  DCG/IDCG (the trec_eval / Burges et al. exponential-gain
  convention). Binary metrics (recall/precision/MRR/AP) always use
  the grade > 0 indicator, so graded and binary inputs agree on them.

Scale shape: one (qid, id)-keyed left join of the rank-bounded hits
against qrels (both sides pre-shrunk: hits ≤ Q×k rows, qrels is the
relevance set — broadcast when small, co-partitioned otherwise; AQE
decides, no hint), one per-qid window over ≤ k rows for the running
relevant count (bounded by k, never corpus-sized), one partial-agg
groupBy(qid), and an n_rel groupBy on qrels (whose per-qid gain list,
in the graded path, is capped at the judged-relevant count — a
relevance set, never a corpus). Nothing touches a corpus: evaluating
a run over 10⁶ queries × k=100 is a 10⁸-row job whatever the corpus
size behind it.

Metric definitions (per query, cutoff k, rel = grade > 0):

- ``recall_k``    = |retrieved ∩ relevant| / |relevant|
- ``precision_k`` = |retrieved ∩ relevant| / k
- ``mrr``         = 1 / rank of the first relevant hit (0 if none)
- ``ndcg_k``      = DCG / IDCG with DCG = Σ gain/log2(rank+1) over
  relevant hits and IDCG the same sum over the top-min(k,|relevant|)
  gains in descending order (for binary inputs gain ≡ 1 and this is
  Σ_{i=1..min(k,|relevant|)} 1/log2(i+1))
- ``ap_k``        = Σ_{relevant hits} (relevant_so_far(rank)/rank)
  / min(|relevant|, k)  (the TREC AP@k convention)

Queries present in ``qrels`` but absent from ``hits`` (retrieval came
back empty) score 0 everywhere. Queries with NO positive relevance
judgment — absent from qrels, or judged with all grades 0 — are
DROPPED from the output, matching trec_eval (which skips topics with
num_rel = 0) and this repo's DuckDB oracle twin, which builds off the
judged-qid set. ``macro_average`` therefore averages over exactly the
rows it counts.
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
    gain_col: str | None = None,
) -> DataFrame:
    """Per-query IR metrics; see module docstring for definitions.
    Returns ``(qid_col, n_rel, n_hit_rel, recall_k, precision_k, mrr,
    ndcg_k, ap_k)``, metrics rounded to 6 dp, one row per qid with at
    least one positive judgment (unjudged qids are dropped — the
    trec_eval convention). Pass ``gain_col`` naming an integer grade
    column in ``qrels`` for graded-relevance nDCG (gain = 2^grade − 1;
    grade 0 rows are judged-non-relevant and count for nothing)."""
    h = hits.filter(F.col(rank_col) <= k).select(qid_col, id_col, rank_col)
    if gain_col is None:
        r = qrels.select(qid_col, id_col, F.lit(1).alias("_g"))
    else:
        r = qrels.select(
            qid_col, id_col, F.col(gain_col).cast("int").alias("_g")
        )
    rel = r.filter(F.col("_g") > 0)
    j = h.join(rel, [qid_col, id_col], "left").withColumn(
        "_rel", F.coalesce((F.col("_g") > 0).cast("int"), F.lit(0))
    )
    w = (
        Window.partitionBy(qid_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = j.withColumn("_cumrel", F.sum("_rel").over(w))
    # gain = 2^grade − 1 (exactly 1.0 for binary, so the binary DCG is
    # bit-identical to the pre-graded Σ 1/log2(rank+1) formulation the
    # DuckDB oracle mirrors)
    gain = F.pow(F.lit(2.0), F.col("_g").cast("double")) - 1.0
    per = j.groupBy(qid_col).agg(
        F.sum("_rel").cast("long").alias("n_hit_rel"),
        F.min(F.when(F.col("_rel") == 1, F.col(rank_col))).alias("_first"),
        F.sum(
            F.when(F.col("_rel") == 1, gain / F.log2(F.col(rank_col) + 1))
        ).alias("_dcg"),
        F.sum(
            F.when(F.col("_rel") == 1, F.col("_cumrel") / F.col(rank_col))
        ).alias("_psum"),
    )
    if gain_col is None:
        # all gains are 1: IDCG has the closed form Σ 1/log2(i+1) — no
        # per-qid gain list needed
        n_rel = rel.groupBy(qid_col).agg(
            F.count("*").cast("long").alias("n_rel")
        )
        idcg = F.aggregate(
            F.sequence(F.lit(1), F.least(F.lit(k), F.col("n_rel"))),
            F.lit(0.0),
            lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
        )
    else:
        # ideal ranking = judged gains sorted descending, cut at k;
        # the list is |relevant|-bounded (a relevance set, not a corpus)
        n_rel = rel.groupBy(qid_col).agg(
            F.count("*").cast("long").alias("n_rel"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.pow(F.lit(2.0), F.col("_g").cast("double"))
                            - 1.0
                        )
                    )
                ),
                1,
                k,
            ).alias("_gains"),
        )
        idcg = F.aggregate(
            F.transform(
                F.col("_gains"),
                lambda g, i: g / F.log2(i.cast("double") + 2),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    # judged qids drive the output (left join): empty-run queries score
    # 0, unjudged queries are dropped — both the oracle's shape
    out = n_rel.join(per, qid_col, "left")
    return out.select(
        qid_col,
        "n_rel",
        F.coalesce("n_hit_rel", F.lit(0)).alias("n_hit_rel"),
        F.round(
            F.coalesce("n_hit_rel", F.lit(0)) / F.col("n_rel"), 6
        ).alias("recall_k"),
        F.round(F.coalesce("n_hit_rel", F.lit(0)) / F.lit(k), 6).alias(
            "precision_k"
        ),
        F.round(F.coalesce(1.0 / F.col("_first"), F.lit(0.0)), 6).alias(
            "mrr"
        ),
        F.round(F.coalesce(F.col("_dcg") / idcg, F.lit(0.0)), 6).alias(
            "ndcg_k"
        ),
        F.round(
            F.coalesce(
                F.col("_psum") / F.least(F.col("n_rel"), F.lit(k)),
                F.lit(0.0),
            ),
            6,
        ).alias("ap_k"),
    )


def macro_average(metrics: DataFrame) -> DataFrame:
    """Mean of each metric over the JUDGED queries. ``n_queries``
    counts the rows that actually enter the averages (non-NULL
    recall_k — with retrieval_metrics' drop-unjudged contract that is
    every row, but counting the averaged column keeps the denominator
    honest for any caller-assembled input). One scalar row; the
    partial-agg twin of trec_eval's 'all' line."""
    return metrics.agg(
        F.count("recall_k").cast("long").alias("n_queries"),
        F.round(F.avg("recall_k"), 6).alias("recall_k"),
        F.round(F.avg("precision_k"), 6).alias("precision_k"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("ndcg_k"), 6).alias("ndcg_k"),
        F.round(F.avg("ap_k"), 6).alias("ap_k"),
    )
