"""Model-based quality classification (fasttext-style) via pyspark.ml.

The curation suite's heuristic signals (Gopher fracs, surprisal,
quality_score) are fixed rules; production corpus pipelines also train
a LEARNED quality filter — a linear classifier over hashed
bag-of-words, scored against every raw document ("does this look like
the reference corpus?"; the GPT-3/LLaMA Wikipedia-reference-classifier
recipe, and the distributed twin of a fasttext supervised model:
hashed n-gram features + a linear head).

Spark-first shape: RegexTokenizer (same ``[a-z0-9]+`` contract as
``functions.text.tokens``) → HashingTF (hash-trick, fixed feature
space — no vocabulary shuffle, any corpus size) → LogisticRegression.
Training cost is bounded by LBFGS passes over the feature vectors
(each an aggregation, partial-combined map-side); scoring is one
JVM-side transform — no Python in either path. The fitted model is a
coefficient vector (``n_features`` doubles) broadcast to executors,
and persists/reloads through the standard ml Pipeline sidecar format
next to the KB's other artifacts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import text as X

_TOKENS_COL = "_qc_tokens"
_FEATURES_COL = "_qc_features"


def _pipeline(text_col: str, n_features: int, max_iter: float, reg_param: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col,
        outputCol=_TOKENS_COL,
        pattern=X.TOKEN_RE,
        gaps=False,
        toLowercase=True,
    )
    tf = HashingTF(
        inputCol=_TOKENS_COL, outputCol=_FEATURES_COL, numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol=_FEATURES_COL,
        labelCol="_qc_label",
        predictionCol="_qc_pred",
        probabilityCol="_qc_prob",
        rawPredictionCol="_qc_raw",
        maxIter=int(max_iter),
        regParam=reg_param,
        standardization=False,
    )
    return Pipeline(stages=[tok, tf, lr])


def train_quality_classifier(
    df: DataFrame,
    positive_pred: Column,
    text_col: str = "text",
    n_features: int = 1 << 18,
    max_iter: int = 25,
    reg_param: float = 1e-4,
):
    """Fit the reference-corpus classifier: rows matching
    ``positive_pred`` are the "looks good" class (e.g. the curated /
    wiki-like slice), everything else is the raw class. Returns a
    fitted ``PipelineModel`` — persist with ``model.write().save(path)``
    and reload with ``PipelineModel.load`` (works on any cluster, no
    pickling)."""
    # NULL predicate rows must land in the raw class, not feed
    # LogisticRegression a NULL label (opaque mid-job failure)
    labeled = df.withColumn(
        "_qc_label", F.coalesce(positive_pred, F.lit(False)).cast("double")
    )
    # Fit the stages by hand instead of Pipeline.fit: LBFGS re-evaluates
    # its input on EVERY iteration, so an uncached lineage re-tokenizes
    # and re-hashes the corpus max_iter times (the dominant cost —
    # measured ~2x train time at bench scale). Persist the featurized
    # frame once, fit on it, drop it. Caching the training set for an
    # iterative fit is corpus-sized but standard (MLlib itself warns
    # when an LR input is uncached); at production scale the classifier
    # trains on a bounded reference+raw sample, not the full corpus.
    from pyspark import StorageLevel
    from pyspark.ml import PipelineModel

    tok, tf, lr = _pipeline(text_col, n_features, max_iter, reg_param).getStages()
    feats = (
        tf.transform(tok.transform(labeled))
        .select("_qc_label", _FEATURES_COL)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_rows = feats.count()  # materializes the cache
        # right-size the iteration tasks: every LBFGS pass launches one
        # task per partition, so a small training set spread over many
        # partitions pays max_iter x partitions of pure task overhead
        # (500 rows x 32 partitions x 10 passes dominated bench train
        # time). ~50k rows per task amortizes launch cost; large inputs
        # keep their parallelism.
        cur = feats.rdd.getNumPartitions()
        target = max(1, min(cur, n_rows // 50_000 + 1))
        fit_input = feats.coalesce(target) if target < cur else feats
        lr_model = lr.fit(fit_input)
    finally:
        feats.unpersist()
    return PipelineModel([tok, tf, lr_model])


def score_quality(
    df: DataFrame, model, out_col: str = "quality_prob"
) -> DataFrame:
    """Score documents under a trained classifier: adds ``out_col`` =
    P(reference-like). One JVM transform chain over the scan — the
    hash-trick keeps it a pure per-row computation, so it composes with
    the other curation gates (filter on ``quality_prob >= tau``, or
    feed it to ``curation.weighted_sample`` as the selection weight —
    the GPT-3 recipe scores then samples by score)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    prob = vector_to_array(F.col("_qc_prob")).getItem(1).alias(out_col)
    # re-scoring a frame that already carries out_col must replace it,
    # not produce a duplicate column name (ambiguous downstream refs)
    keep = [c for c in df.columns if c != out_col]
    return scored.select(*keep, prob)
