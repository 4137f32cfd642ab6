"""format_references_batch == driver format_references per query;
rag_batch end-to-end distributed pipeline."""

import json

from pyspark.sql import functions as F

from customkb_spark.plans.formatters import format_references, format_references_batch


def _ctx(spark):
    rows = []
    for qid in (10, 20):
        # doc A: sids 1,2,4 (two sections); doc "b&<d>": sids 0,1
        rows += [
            (qid, "docA", 1, f"q{qid} a-one"),
            (qid, "docA", 2, f"q{qid} a-two"),
            (qid, "docA", 4, f"q{qid} a-four"),
            (qid, "b&<d>", 0, f"q{qid} b <zero> & more"),
            (qid, "b&<d>", 1, f"q{qid} b one"),
            (qid, "docA", 2, f"q{qid} a-two"),  # duplicate row
        ]
    return spark.createDataFrame(rows, "qid: long, sourcedoc: string, sid: long, text: string")


def test_batch_formatting_matches_driver(spark):
    ctx = _ctx(spark)
    for fmt in ("plain", "markdown", "xml"):
        batch = {
            r["qid"]: r["reference_string"]
            for r in format_references_batch(ctx, fmt).collect()
        }
        for qid in (10, 20):
            single = format_references(ctx.filter(F.col("qid") == qid).drop("qid"), fmt)
            assert batch[qid] == single, f"{fmt} mismatch for qid {qid}"


def test_batch_json_parse_equal(spark):
    ctx = _ctx(spark)
    batch = {
        r["qid"]: r["reference_string"]
        for r in format_references_batch(ctx, "json").collect()
    }
    for qid in (10, 20):
        single = format_references(ctx.filter(F.col("qid") == qid).drop("qid"), "json")
        assert json.loads(batch[qid]) == json.loads(single)


def test_rag_batch_end_to_end(spark, embeddings):
    from customkb_spark.config import KBConfig
    from customkb_spark.embedding import embedder as EMB
    from customkb_spark.plans import hybrid as HY

    chunks = spark.createDataFrame(
        [
            (i, f"/d/{i % 4}.md", i // 4, f"spark data document {i} window query " * 2,
             f"spark data document {i} window query " * 2)
            for i in range(16)
        ],
        ["id", "sourcedoc", "sid", "originaltext", "embedtext"],
    )
    vecs = EMB.embed_texts(chunks, "id", "embedtext", "stub-hash-embed", 16)
    index = HY.HybridIndex.build(chunks, vecs)
    queries = spark.createDataFrame(
        [(1, "spark data"), (2, "window query")], ["qid", "query_text"]
    )
    cfg = KBConfig(vector_dimensions=16, query_top_k=4)
    out = HY.rag_batch(index, queries, cfg, fmt="markdown").collect()
    assert {r["qid"] for r in out} == {1, 2}
    for r in out:
        assert r["reference_string"].startswith("### ")
        assert isinstance(r["answer"], str) and r["answer"]
    # the whole plan is distributed: no collect anywhere in the path —
    # assert the result schema carries all stages' columns
    assert sorted(out[0].asDict().keys()) == ["answer", "qid", "query_text", "reference_string"]
