"""Contrastive-pair mining over an embedding corpus — hard negatives,
hardest positives, and FaceNet-style triplet selection.

Training retrieval/embedding models at scale needs, for every anchor in
a training batch, the corpus items that are MOST similar while carrying
a different label (hard negatives), plus the anchor's most-distant
same-label item (hardest positive) to drive the triplet margin
(Schroff et al. 2015, FaceNet; Xiong et al. 2021, ANCE, mines the
negatives from an ANN index instead of the exact scan).

Scale shape (both mirror the existing retrieval paths — this module is
a composition, not a new engine):

- **Exact tier** (`hard_negatives`, `triplet_mine`): anchors are a
  training BATCH — bounded, thousands — so they broadcast; the corpus
  scans ONCE, map-side scored, and the label-mismatch filter runs
  BEFORE the per-anchor top-k window, so the windowed row count is the
  filtered candidate set, not anchors × corpus. The corpus itself never
  shuffles. This is the oracle tier (DuckDB-replayable) and the
  correctness twin of ``topk.knn_join``.
- **ANN tier** (`hard_negatives_ann`): the ANCE shape — route through
  ``embedding/index.ivf_search_batch``'s partition-pruned probes with
  an over-fetch factor (label filtering happens AFTER retrieval, so
  fetch ``k × overfetch`` to keep k cross-label survivors), then
  re-rank. Cost per anchor is the probed clusters, independent of
  corpus size; at 10^9 corpus rows the exact tier's full scan per
  batch is the thing you stop doing.

Reference parity anchor: the reference's retrieval surface ends at
top-k search (query/search.py:242-267); mining is an extension from the
build brief (training-data pipeline operators), built on the same
scoring contract (`topk._metric_score`, ties broken by id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from customkb_spark.functions import vector as V
from customkb_spark.operators.topk import _metric_score


def _norm(df: DataFrame, id_col: str, vec_col: str, label_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vector"),
        F.col(label_col).alias("label"),
    )


def _pair_score(c: DataFrame, a: DataFrame, metric: str):
    """(corpus, anchors, score) with cosine PRE-NORMED (r9): per-row
    norm attributes bound on each side before the join — bit-identical
    to the inline cosine (same arithmetic DAG), but norms evaluate per
    row (n + q folds) instead of per pair (3·n·q folds)."""
    if metric == "cosine":
        c = c.withColumn("_nv", V.norm(F.col("vector")))
        a = a.withColumn("_nq", V.norm(F.col("qvec")))
        score = V.dot(F.col("vector"), F.col("qvec")) / (
            F.col("_nv") * F.col("_nq")
        )
    else:
        score = _metric_score(F.col("vector"), F.col("qvec"), metric)
    return c, a, score


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k most-similar DIFFERENT-label corpus rows per anchor.

    Returns ``(qid, neg_id, neg_score, neg_rank)``; scores rounded to
    6 dp (float32 upcast noise), ties broken by id — deterministic and
    oracle-comparable. Anchors broadcast; one corpus scan; the
    cross-label filter runs before the ranking window.
    """
    a = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = _norm(corpus, id_col, vec_col, label_col)
    c, a, score = _pair_score(c, a, metric)
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("label") != F.col("qlabel"))
        .select("qid", F.col("id").alias("neg_id"), F.round(score, 6).alias("neg_score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("neg_score"), F.asc("neg_id"))
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("qid", "neg_id", "neg_score", "neg_rank")
    )


def hardest_positives(
    anchors: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """The LEAST-similar same-label corpus row per anchor (excluding the
    anchor itself) — FaceNet's argmax-distance positive. Returns
    ``(qid, pos_id, pos_score)``. Same broadcast/one-scan shape."""
    a = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = _norm(corpus, id_col, vec_col, label_col)
    c, a, score = _pair_score(c, a, metric)
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter((F.col("label") == F.col("qlabel")) & (F.col("id") != F.col("qid")))
        .select("qid", F.col("id").alias("pos_id"), F.round(score, 6).alias("pos_score"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("pos_score"), F.asc("pos_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


def triplet_mine(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    margin: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """Triplet candidates: each anchor's top-k hard negatives joined
    with its hardest positive, flagged with the FaceNet margin
    condition ``violates_margin = neg_score + margin > pos_score``
    (similarity space: a violating negative sits closer than
    ``pos_score − margin`` — exactly the triplets with nonzero loss;
    semi-hard = violating but still below the positive).

    Returns ``(qid, neg_id, neg_score, neg_rank, pos_id, pos_score,
    violates_margin, semi_hard)``. One corpus scan per leg; the join is
    anchors-sized.
    """
    negs = hard_negatives(anchors, corpus, k, id_col, vec_col, label_col, metric)
    pos = hardest_positives(anchors, corpus, id_col, vec_col, label_col, metric)
    return negs.join(pos, "qid").select(
        "qid",
        "neg_id",
        "neg_score",
        "neg_rank",
        "pos_id",
        "pos_score",
        (F.col("neg_score") + F.lit(margin) > F.col("pos_score")).alias(
            "violates_margin"
        ),
        (
            (F.col("neg_score") + F.lit(margin) > F.col("pos_score"))
            & (F.col("neg_score") < F.col("pos_score"))
        ).alias("semi_hard"),
    )


def hard_negatives_ann(
    indexed_vectors: DataFrame,
    centroids,
    anchors: DataFrame,
    labels: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """ANCE-shape hard-negative mining through the IVF index: retrieve
    ``k × overfetch`` approximate neighbors per anchor from the probed
    clusters only (corpus cost independent of corpus size), drop
    same-label hits, re-rank, keep k.

    ``indexed_vectors`` is the cluster-assigned corpus
    (``embedding/index.build_ivf_index`` layout: id, vector,
    cluster_id); ``labels`` maps id → label (joined AFTER retrieval —
    the candidate set is anchors × k × overfetch rows, so this join
    never touches the corpus). Recall caveat inherited from IVF: a
    negative outside the probed clusters is invisible — raise
    ``nprobe``/``overfetch`` for coverage, or use ``hard_negatives``
    when the corpus is scan-affordable.
    """
    from customkb_spark.embedding.index import ivf_search_batch

    a = anchors.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    hits = ivf_search_batch(
        indexed_vectors,
        centroids,
        a.select("qid", "qvec"),
        k=k * overfetch,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        metric=metric,
    )
    lab = labels.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("label")
    )
    cand = (
        hits.join(lab, "id")
        .join(F.broadcast(a.select("qid", "qlabel")), "qid")
        .filter(F.col("label") != F.col("qlabel"))
        .select("qid", F.col("id").alias("neg_id"), F.col("score").alias("neg_score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("neg_score"), F.asc("neg_id"))
    return (
        cand.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("qid", "neg_id", "neg_score", "neg_rank")
    )
