"""Operator-level invariants, mirroring the reference's unit-test
strategy (SURVEY.md §5): RRF formula, BM25 formula with unique-token
tf, context-range clamping, top-k ordering, run grouping."""

import math

import numpy as np
from pyspark.sql import functions as F

from customkb_spark.operators import bm25 as B
from customkb_spark.operators import fusion as FU
from customkb_spark.operators import sessionize as S
from customkb_spark.operators import topk as TK
from customkb_spark.operators import windows as W
from customkb_spark.operators.range_join import context_range_join


def test_brute_force_topk_matches_numpy(spark, embeddings):
    rows = embeddings.orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    expected = [rows[i]["vec_id"] for i in np.argsort(-sims)[:5]]
    got = [
        r["id"]
        for r in TK.brute_force_topk(embeddings, q.tolist(), 5, "vec_id", "embedding").collect()
    ]
    assert got == expected


def test_knn_join_rank1_is_self(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = TK.knn_join(queries, embeddings, 3, "qid", "qvec", "vec_id", "embedding")
    r1 = {r["qid"]: r["id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert r1 == {0: 0, 1: 1, 2: 2}  # self-similarity = 1.0


def test_bm25_formula_hand_check(spark):
    # 3 docs; query term 'xx' appears in doc1 and doc2 (dedup → tf=1);
    # tokens are 2 chars because the F3 set drops single non-digit chars
    docs = spark.createDataFrame(
        [(1, "xx yy zz"), (2, "xx xx ww"), (3, "ww yy")], ["id", "text"]
    )
    postings = B.build_postings(docs, "id", "text")
    n, avgdl = B.corpus_stats(docs, "text")
    stats = B.build_term_stats(postings, n)
    out = {r["id"]: r["score"] for r in B.bm25_score(postings, stats, ["xx"], avgdl).collect()}
    # manual: df(xx)=2, N=3 → idf = ln((3-2+0.5)/(2+0.5)+1); dl: doc1=3, doc2=2; avgdl=(3+2+2)/3
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    for doc_id, dl in [(1, 3), (2, 2)]:
        exp = idf * 2.2 / (1.0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert abs(out[doc_id] - exp) < 1e-5
    assert 3 not in out


def test_bm25_inline_stats_matches_stats_path(spark, documents):
    """term_stats=None derives each query term's df from the matched
    postings window — scores must be IDENTICAL to the materialized
    term_stats path (same df values by construction)."""
    postings = B.build_postings(documents, "doc_id", "text")
    n, avgdl = B.corpus_stats(documents, "text")
    stats = B.build_term_stats(postings, n)
    terms = ["data", "query", "merge"]
    a = {r["id"]: r["score"] for r in B.bm25_score(postings, stats, terms, avgdl, limit=50).collect()}
    b = {
        r["id"]: r["score"]
        for r in B.bm25_score(postings, None, terms, avgdl, limit=50, corpus_size=n).collect()
    }
    assert a == b and a

    qt = spark.createDataFrame([(0, t) for t in terms] + [(1, "data")], ["qid", "term"])
    a2 = {(r["qid"], r["id"]): r["score"] for r in B.bm25_score_batch(postings, stats, qt, avgdl).collect()}
    b2 = {
        (r["qid"], r["id"]): r["score"]
        for r in B.bm25_score_batch(postings, None, qt, avgdl, corpus_size=n).collect()
    }
    assert a2 == b2 and a2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        B.bm25_score(postings, None, terms, avgdl)


def test_rrf_formula(spark):
    vec = spark.createDataFrame([(1, 0.9), (2, 0.8)], ["id", "score"])
    kw = spark.createDataFrame([(2, 5.0), (3, 4.0)], ["id", "score"])
    out = {r["id"]: r["score"] for r in FU.rrf_fuse(vec, kw, 60, 10).collect()}
    assert abs(out[2] - (1 / 62 + 1 / 61)) < 1e-5  # rank 2 vec + rank 1 kw
    assert abs(out[1] - 1 / 61) < 1e-5
    assert abs(out[3] - 1 / 62) < 1e-5


def test_weighted_fusion_normalizes(spark):
    vec = spark.createDataFrame([(1, 0.5), (2, 0.25)], ["id", "score"])
    kw = spark.createDataFrame([(1, 10.0)], ["id", "score"])
    out = {r["id"]: r["score"] for r in FU.weighted_fuse(vec, kw, 0.7, 10).collect()}
    assert abs(out[1] - (0.7 * 1.0 + 0.3 * 1.0)) < 1e-5
    assert abs(out[2] - 0.7 * 0.5) < 1e-5


def test_context_range_clamps_at_zero(spark):
    chunks = spark.createDataFrame(
        [("d", i, f"c{i}") for i in range(10)], ["sourcedoc", "sid", "originaltext"]
    )
    hits = spark.createDataFrame([("d", 1, 0.9)], ["sourcedoc", "sid", "score"])
    out = context_range_join(hits, chunks, scope=4)
    sids = [r["sid"] for r in out.collect()]
    assert sids == [0, 1, 2, 3]  # lo clamped to 0, hi = 1+2


def test_context_range_shrinks_low_similarity(spark):
    chunks = spark.createDataFrame(
        [("d", i, f"c{i}") for i in range(10)], ["sourcedoc", "sid", "originaltext"]
    )
    hits = spark.createDataFrame([("d", 5, 0.1)], ["sourcedoc", "sid", "score"])
    out = context_range_join(hits, chunks, scope=4, similarity_threshold=0.6)
    sids = [r["sid"] for r in out.collect()]
    assert sids == [4, 5, 6]  # half-scope 2 shrunk to 1


def test_consecutive_runs(spark):
    df = spark.createDataFrame(
        [("u", 1, "a"), ("u", 2, "a"), ("u", 3, "b"), ("u", 4, "a")],
        ["user", "t", "v"],
    )
    out = W.consecutive_runs(df, "user", "t", "v").orderBy("run_id").collect()
    assert [(r["v"], r["run_len"]) for r in out] == [("a", 2), ("b", 1), ("a", 1)]


def test_sessionize_gap(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1),
        (1, base + datetime.timedelta(minutes=10), 2),
        (1, base + datetime.timedelta(minutes=50), 3),  # 40min gap → new session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = S.sessionize(df, gap_minutes=30, tiebreak_col="event_id").collect()
    assert sorted(r["n_events"] for r in out) == [1, 2]


def test_positional_sample(spark):
    chunks = spark.createDataFrame(
        [("d", i) for i in range(5)], ["sourcedoc", "sid"]
    )
    out = W.positional_sample(chunks)
    got = {r["position"]: r["sid"] for r in out.collect()}
    assert got == {"top": 0, "middle": 2, "bottom": 4}


def test_bm25_needs_rebuild(spark):
    from customkb_spark.operators import bm25 as B

    df = spark.createDataFrame(
        [(i, i % 3 == 0) for i in range(30)], ["id", "keyphrase_processed"]
    )
    assert B.needs_rebuild(df, threshold=5)  # 20 pending > 5
    assert not B.needs_rebuild(df, threshold=25)


def test_query_log_roundtrip(spark, tmp_path):
    from customkb_spark.plans import querylog as QL

    path = str(tmp_path / "qlog")
    QL.log_query(spark, path, "kb1", "what is spark", 0.12, 5)
    QL.log_query(spark, path, "kb1", "minhash dedup", 0.34, 3)
    log = QL.read_query_log(spark, path)
    assert log.count() == 2
    stats = QL.query_stats(log).collect()
    assert stats[0]["n_queries"] == 2
    assert abs(stats[0]["avg_elapsed_s"] - 0.23) < 1e-6


def test_funnel_cascade_order_matters(spark):
    import datetime as dt

    from customkb_spark.operators.sessionize import funnel

    b = dt.datetime(2024, 1, 1)
    m = lambda k: b + dt.timedelta(minutes=k)
    rows = [
        # user 1: full ordered funnel
        (1, m(0), "view"), (1, m(1), "click"), (1, m(2), "purchase"),
        # user 2: purchase BEFORE click → only 2 steps count
        (2, m(0), "view"), (2, m(1), "purchase"), (2, m(2), "click"),
        # user 3: starts mid-funnel → 0 steps (no 'view')
        (3, m(0), "click"), (3, m(1), "purchase"),
        # user 4: view only
        (4, m(0), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: (r["steps_completed"], r["furthest_step"])
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert out[1] == (3, "purchase")
    assert out[2] == (2, "click")
    assert out[3] == (0, None)
    assert out[4] == (1, "view")


def test_fusion_enforces_input_bound(spark):
    """VERDICT r1 #10: an unbounded (table-sized) ranker input must be
    TakeOrdered-bounded BEFORE the single-partition rank window — the
    window may never see more than FUSION_INPUT_BOUND rows."""
    from customkb_spark.operators import fusion as FU

    big = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 997 / 997.0).alias("score")
    )
    for fuse in (FU.rrf_fuse, FU.weighted_fuse):
        plan = fuse(big, big, top_k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
    # values still correct: equivalent to fusing the top-bound slices
    top = big.orderBy(F.desc("score"), F.asc("id")).limit(FU.FUSION_INPUT_BOUND)
    got = [tuple(r) for r in FU.rrf_fuse(big, big, top_k=5).collect()]
    want = [tuple(r) for r in FU.rrf_fuse(top, top, top_k=5).collect()]
    assert got == want


def test_retention_cohorts(spark):
    import datetime as dt

    from customkb_spark.operators.sessionize import retention_cohorts

    w0 = dt.datetime(2024, 1, 1, 10)   # Monday
    w1 = w0 + dt.timedelta(weeks=1)
    w2 = w0 + dt.timedelta(weeks=2)
    events = spark.createDataFrame(
        [
            (1, w0), (1, w1),          # cohort w0, active w0+w1
            (2, w0), (2, w2),          # cohort w0, active w0+w2
            (3, w1),                   # cohort w1, active w1 only
        ],
        ["user_id", "ts"],
    )
    rows = {
        (r.cohort.isoformat(), r.periods_since): r.active_users
        for r in retention_cohorts(events).collect()
    }
    assert rows[("2024-01-01", 0)] == 2      # both w0 users in week 0
    assert rows[("2024-01-01", 1)] == 1      # user 1 returned week 1
    assert rows[("2024-01-01", 2)] == 1      # user 2 returned week 2
    assert rows[("2024-01-08", 0)] == 1      # w1 cohort
    assert len(rows) == 4


def test_approx_sketches_within_bounds(spark, sf_dir):
    """The 100 TB tier: approx_count_distinct (HLL++) and
    approx_percentile must land within their documented error of the
    exact answers — pinning the accuracy story the scale docs promise."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact_users = ev.select("user_id").distinct().count()
    approx_users = ev.agg(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx_users - exact_users) / exact_users <= 0.06  # 3x rsd

    row = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx"),
    ).collect()[0]
    spread = ev.agg(F.max("value") - F.min("value")).collect()[0][0]
    assert abs(row.approx - row.exact) <= 0.01 * spread
