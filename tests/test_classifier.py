"""Learned quality classifier (operators/classifier.py)."""

from pyspark.sql import functions as F

from customkb_spark.operators import classifier as QC

GOOD = [
    "the committee published a detailed report on regional water policy",
    "researchers measured the thermal conductivity of the alloy samples",
    "the library catalog lists first editions with provenance notes",
    "engineers reviewed the bridge inspection findings last spring",
    "the study compares translation quality across eight language pairs",
    "archivists digitized the manuscript collection over two years",
]
JUNK = [
    "click here buy now cheap cheap best price click click",
    "win win win free free casino bonus bonus now now now",
    "xxl sale sale sale discount discount buy buy buy",
    "lorem asdf qwerty zxcv asdf qwerty zxcv asdf",
    "subscribe like follow subscribe like follow subscribe",
    "aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb",
]


def _corpus(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, is_good: int")


def test_classifier_separates_held_out_docs(spark):
    df = _corpus(spark)
    model = QC.train_quality_classifier(
        df, F.col("is_good") == 1, n_features=1 << 12, max_iter=30
    )
    held_out = spark.createDataFrame(
        [
            (1, "the council reviewed the annual water quality report"),
            (2, "buy now cheap cheap free free click click now"),
        ],
        "doc_id: long, text: string",
    )
    scores = {r.doc_id: r.quality_prob for r in QC.score_quality(held_out, model).collect()}
    assert scores[1] > 0.5 > scores[2]


def test_score_quality_preserves_schema_and_is_jvm_side(spark):
    df = _corpus(spark)
    model = QC.train_quality_classifier(df, F.col("is_good") == 1, n_features=1 << 12)
    out = QC.score_quality(df.select("doc_id", "text"), model)
    assert out.columns == ["doc_id", "text", "quality_prob"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert out.filter((F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)).count() == 0


def test_classifier_save_load_roundtrip(spark, tmp_path):
    from pyspark.ml import PipelineModel

    df = _corpus(spark)
    model = QC.train_quality_classifier(df, F.col("is_good") == 1, n_features=1 << 12)
    path = str(tmp_path / "qc_model")
    model.write().save(path)
    loaded = PipelineModel.load(path)
    a = {r.doc_id: round(r.quality_prob, 9) for r in QC.score_quality(df, model).collect()}
    b = {r.doc_id: round(r.quality_prob, 9) for r in QC.score_quality(df, loaded).collect()}
    assert a == b


def test_null_label_rows_train_as_raw(spark):
    """NULL positive_pred must coalesce to the raw class, not crash
    LogisticRegression with a NULL label (ADVICE r3)."""
    rows = [(i, "good clean prose " * 5, "wiki") for i in range(10)]
    rows += [(100 + i, "zz qq " * 5, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    model = QC.train_quality_classifier(
        df, F.col("source") == "wiki", n_features=1 << 12, max_iter=5
    )
    scored = QC.score_quality(df, model)
    assert scored.count() == 20


def test_score_quality_rescoring_replaces_column(spark):
    """Re-scoring a frame that already carries quality_prob must
    replace the column, not duplicate it (ADVICE r3)."""
    rows = [(i, ("good text " if i % 2 else "bad zz ") * 5, i % 2 == 1) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_good boolean")
    model = QC.train_quality_classifier(df, F.col("is_good"), n_features=1 << 12, max_iter=5)
    once = QC.score_quality(df, model)
    twice = QC.score_quality(once, model)
    assert twice.columns.count("quality_prob") == 1
    # downstream reference stays unambiguous
    assert twice.filter(F.col("quality_prob") >= 0).count() == 10
