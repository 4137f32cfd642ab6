"""End-to-end hybrid pipeline, formatters, streaming increment, entry
contract consistency."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from customkb_spark.config import KBConfig
from customkb_spark.embedding.embedder import embed_texts
from customkb_spark.ingest.pipeline import documents_to_chunks
from customkb_spark.plans import hybrid as HY
from customkb_spark.plans.formatters import format_references, group_consecutive_sections
from customkb_spark.streaming.incremental import incremental_ingest, stream_documents


def _index(spark, documents):
    chunks = documents_to_chunks(documents, chunk_size=200).cache()
    vectors = embed_texts(chunks, "id", "embedtext")
    return HY.HybridIndex.build(chunks, vectors)


def test_hybrid_query_end_to_end(spark, documents):
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=5)
    out = HY.query(idx, "spark data query table", cfg)
    rows = out.collect()
    assert len(rows) > 0
    assert {"sourcedoc", "hit_sid", "sid", "text"} <= set(out.columns)


def test_hybrid_weighted_path(spark, documents):
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=5, hybrid_fusion_method="weighted")
    assert HY.hybrid_search(idx, "spark data table", cfg=cfg).count() > 0


def test_formatters_group_consecutive(spark):
    rows = [("d", 0, 0, "a"), ("d", 0, 1, "b"), ("d", 0, 5, "c")]
    ctx = spark.createDataFrame(rows, ["sourcedoc", "hit_sid", "sid", "text"])
    grouped = group_consecutive_sections(ctx).collect()
    assert len(grouped) == 2  # [0,1] and [5]
    for fmt in ("plain", "xml", "json", "markdown"):
        s = format_references(ctx, fmt)
        assert "a" in s and "c" in s


def test_streaming_ingest_matches_batch(spark, documents, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    documents.limit(10).write.parquet(src)
    stream = stream_documents(spark, src, documents.schema)
    q = incremental_ingest(stream, out, ckpt, chunk_size=200)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    expected = documents_to_chunks(
        spark.read.parquet(src), chunk_size=200
    )
    assert got.count() == expected.count()
    assert set(got.columns) == set(expected.columns)


def test_entry_contract():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_batch_query_matches_single_path(spark, documents):
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=5)
    texts = ["spark data query table", "window sort merge"]
    queries = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["qid", "query_text"]
    )
    batch = HY.hybrid_search_batch(idx, queries, cfg)
    got = {
        qid: {r["id"] for r in rows}
        for qid, rows in (
            (q, [x for x in batch.collect() if x["qid"] == q]) for q in (0, 1)
        )
    }
    for qid, text in enumerate(texts):
        single = {r["id"] for r in HY.hybrid_search(idx, text, cfg=cfg).collect()}
        assert got[qid] == single


def test_query_batch_context_rows(spark, documents):
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=3)
    queries = spark.createDataFrame(
        [(0, "spark data query"), (1, "window sort")], ["qid", "query_text"]
    )
    out = HY.query_batch(idx, queries, cfg)
    rows = out.collect()
    assert {r["qid"] for r in rows} == {0, 1}
    assert {"qid", "sourcedoc", "hit_sid", "sid", "text"} <= set(out.columns)


def test_weighted_batch_matches_single(spark, documents):
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=5, hybrid_fusion_method="weighted")
    queries = spark.createDataFrame(
        [(0, "spark data query table"), (1, "window sort merge")],
        ["qid", "query_text"],
    )
    batch = HY.hybrid_search_batch(idx, queries, cfg).collect()
    for qid, text in [(0, "spark data query table"), (1, "window sort merge")]:
        single = {
            (r["id"], r["score"]) for r in HY.hybrid_search(idx, text, cfg=cfg).collect()
        }
        got = {(r["id"], r["score"]) for r in batch if r["qid"] == qid}
        assert got == single


def test_hybrid_query_with_reranking(spark, documents):
    idx = _index(spark, documents)
    base = KBConfig(query_top_k=5)
    rr = KBConfig(query_top_k=5, enable_reranking=True, reranking_top_k=3)
    out_base = HY.query(idx, "spark data query table", base)
    out_rr = HY.query(idx, "spark data query table", rr)
    # reranking changes ordering/selection but still returns context
    assert out_rr.count() > 0
    assert set(out_rr.columns) == set(out_base.columns)


def test_batch_drops_invalid_query_rows(spark, documents):
    """Single-query parity for invalid input: hybrid_search RAISES on
    empty/oversized queries, so the batch path must DROP those rows
    (absent qids are the batch analogue of the error) — not embed an
    unbounded payload or score an empty string (code-review r4)."""
    idx = _index(spark, documents)
    cfg = KBConfig(query_top_k=3)
    queries = spark.createDataFrame(
        [
            (0, "spark data query table"),  # valid
            (1, "\x01\x02\x03"),            # strips to empty
            (2, "word " * 3000),            # 15k chars, over the 10k cap
        ],
        ["qid", "query_text"],
    )
    got = {r["qid"] for r in HY.hybrid_search_batch(idx, queries, cfg).collect()}
    assert got == {0}


def test_batch_retrieval_honors_ivf_tier(spark, documents):
    """r6: hybrid_search_batch must use the built index tier like the
    single-query path does — IVF tier: identical hits AND scores to
    single-query retrieval (same nearest_clusters probes, exact cosine
    within); and the corpus-scan twin (knn_join) must NOT appear in the
    plan (the probe join on cluster_id must)."""
    chunks = documents_to_chunks(documents, chunk_size=200).cache()
    vectors = embed_texts(chunks, "id", "embedtext")
    cfg = KBConfig(query_top_k=5, ann_index="ivf", vector_dimensions=64)
    idx = HY.HybridIndex.build(chunks, vectors, cfg=cfg)
    assert idx.vindex is not None and idx.vindex.kind == "ivf"
    texts = ["spark data query table", "window sort merge"]
    queries = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["qid", "query_text"]
    )
    batch = HY.hybrid_search_batch(idx, queries, cfg)
    plan = batch._jdf.queryExecution().optimizedPlan().toString()
    assert "cluster_id" in plan  # pruned probe join, not a full scan
    rows = batch.collect()
    for qid, text in enumerate(texts):
        single = {
            (r["id"], r["score"])
            for r in HY.hybrid_search(idx, text, cfg=cfg).collect()
        }
        got = {(r["id"], r["score"]) for r in rows if r["qid"] == qid}
        assert got == single


def test_batch_retrieval_ivfpq_full_probe_equals_exact(spark, documents):
    """IVFPQ tier in batch = pruned-EXACT within the probed cells (no
    ADC ranking noise). With nprobe covering every cell the result must
    equal brute-force knn over the whole corpus."""
    from customkb_spark.operators.topk import knn_join

    chunks = documents_to_chunks(documents, chunk_size=200).cache()
    vectors = embed_texts(chunks, "id", "embedtext")
    cfg = KBConfig(
        query_top_k=5, ann_index="ivfpq", vector_dimensions=64,
        faiss_nprobe=10_000,  # > nlist → every cell probed
    )
    idx = HY.HybridIndex.build(chunks, vectors, cfg=cfg)
    assert idx.vindex is not None and idx.vindex.kind == "ivfpq"
    queries = spark.createDataFrame(
        [(0, "spark data query table")], ["qid", "query_text"]
    )
    got = {
        (r["id"], r["score"])
        for r in HY.hybrid_search_batch(
            idx, queries, KBConfig(query_top_k=5, enable_hybrid_search=False,
                                   faiss_nprobe=10_000)
        ).collect()
    }
    qv = embed_texts(queries, "qid", "query_text").select(
        F.col("id").alias("qid"), F.col("vector").alias("qvec")
    )
    exact = {
        (r["id"], r["score"])
        for r in knn_join(qv, idx.vectors, 5, "qid", "qvec", "id", "vector").collect()
    }
    assert got == exact


def test_batch_retrieval_ivfsq_full_probe_equals_exact(spark, documents):
    """The SQ8 tier routes through the same pruned-exact batch shape as
    ivfpq: full probe == brute-force knn."""
    from customkb_spark.operators.topk import knn_join

    chunks = documents_to_chunks(documents, chunk_size=200).cache()
    vectors = embed_texts(chunks, "id", "embedtext")
    cfg = KBConfig(query_top_k=5, ann_index="ivfsq", vector_dimensions=64,
                   faiss_nprobe=10_000)
    idx = HY.HybridIndex.build(chunks, vectors, cfg=cfg)
    assert idx.vindex is not None and idx.vindex.kind == "ivfsq"
    queries = spark.createDataFrame(
        [(0, "spark data query table")], ["qid", "query_text"]
    )
    got = {
        (r["id"], r["score"])
        for r in HY.hybrid_search_batch(
            idx, queries, KBConfig(query_top_k=5, enable_hybrid_search=False,
                                   faiss_nprobe=10_000)
        ).collect()
    }
    qv = embed_texts(queries, "qid", "query_text").select(
        F.col("id").alias("qid"), F.col("vector").alias("qvec")
    )
    exact = {
        (r["id"], r["score"])
        for r in knn_join(qv, idx.vectors, 5, "qid", "qvec", "id", "vector").collect()
    }
    assert got == exact
