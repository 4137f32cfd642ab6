"""Rerank stage: head reorder + tail passthrough (T4), overlap scorer
determinism, F12 score→distance parity."""

import pytest
from pyspark.sql import functions as F

from customkb_spark.operators import rerank as R


def test_overlap_score_exact_match(spark):
    df = spark.createDataFrame([(1, "spark data"), (2, "unrelated words here")], ["id", "text"])
    out = {
        r["id"]: r["s"]
        for r in df.select("id", R.overlap_score(["spark", "data"], F.col("text")).alias("s")).collect()
    }
    assert out[1] == 1.0
    assert out[2] == 0.0


def test_rerank_head_reordered_tail_untouched(spark):
    # fused order: 1,2,3,4 (score desc); rerank top-2 by overlap with
    # "match" — doc 2 overlaps, doc 1 doesn't → head flips to 2,1
    hits = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)], ["id", "score"]
    )
    docs = spark.createDataFrame(
        [(1, "nothing relevant"), (2, "match"), (3, "match"), (4, "match")],
        ["doc_id", "text"],
    )
    out = R.rerank_hits(hits, docs, ["match"], rerank_top_k=2).collect()
    order = [r["id"] for r in out]
    assert order == [2, 1, 3, 4]
    # tail keeps original ranks and has no rerank score
    by_id = {r["id"]: r for r in out}
    assert by_id[3]["rerank_score"] is None and by_id[3]["final_rank"] == 3
    assert by_id[4]["final_rank"] == 4
    assert by_id[2]["rerank_score"] > by_id[1]["rerank_score"]


def test_score_distance_roundtrip(spark):
    df = spark.createDataFrame([(0.5,), (1.0,)], ["s"])
    out = df.select(
        R.distance_to_similarity(R.score_to_distance(F.col("s"))).alias("sim")
    ).collect()
    # 1/(1+1/(s+eps)-1) = s + eps ≈ s
    assert out[0]["sim"] == pytest.approx(0.5, abs=1e-5)
    assert out[1]["sim"] == pytest.approx(1.0, abs=1e-5)


def test_crossencoder_raises_without_model(spark):
    pairs = spark.createDataFrame([("q", "t")], ["query", "text"])
    scored = R.crossencoder_rerank(pairs)
    with pytest.raises(Exception, match="(?i)cross-encoder|NotImplemented"):
        scored.collect()


def test_rerank_never_drops_missing_text_hits(spark):
    from pyspark.sql import functions as F

    from customkb_spark.operators.rerank import rerank_hits

    hits = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (99, 0.7)], ["id", "score"]
    )
    docs = spark.createDataFrame(
        [(1, "spark query engine"), (2, "data table window")], ["doc_id", "text"]
    )  # id 99 missing from docs
    out = rerank_hits(hits, docs, ["spark"], rerank_top_k=3).collect()
    ids = {r["id"] for r in out}
    assert ids == {1, 2, 99}  # reorder only — never drop
    r99 = next(r for r in out if r["id"] == 99)
    assert r99["rerank_score"] == 0.0  # unscored → bottom of head
    assert r99["final_rank"] == 3
