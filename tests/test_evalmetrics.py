"""IR evaluation metrics — hand-computed fixture, pure-python
randomized reference, and the judged/unjudged/empty-run edges."""

import math
import random

import pytest
from pyspark.sql import functions as F

from customkb_spark.operators.evalmetrics import macro_average, retrieval_metrics


def _py_metrics(run, rels, k):
    """Reference implementation over plain dicts: run[qid] = ordered id
    list, rels[qid] = relevant id set."""
    out = {}
    for qid in set(run) | set(rels):
        if qid not in rels:
            continue  # unjudged: dropped (trec_eval convention)
        R = rels[qid]
        ids = run.get(qid, [])[:k]
        hit_rel = [i + 1 for i, d in enumerate(ids) if d in R]
        dcg = sum(1.0 / math.log2(r + 1) for r in hit_rel)
        idcg = sum(1.0 / math.log2(i + 1) for i in range(1, min(k, len(R)) + 1))
        cum = 0
        psum = 0.0
        for i, d in enumerate(ids):
            if d in R:
                cum += 1
                psum += cum / (i + 1)
        out[qid] = {
            "recall_k": len(hit_rel) / len(R),
            "precision_k": len(hit_rel) / k,
            "mrr": 1.0 / hit_rel[0] if hit_rel else 0.0,
            "ndcg_k": dcg / idcg if idcg else 0.0,
            "ap_k": psum / min(len(R), k),
        }
    return out


def _dfs(spark, run, rels):
    hits = spark.createDataFrame(
        [(q, d, i + 1) for q, ids in run.items() for i, d in enumerate(ids)],
        "qid long, id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(q, d) for q, R in rels.items() for d in sorted(R)],
        "qid long, id long",
    )
    return hits, qrels


def test_hand_computed_fixture(spark):
    run = {1: [9, 1, 8, 3, 7]}
    rels = {1: {1, 2, 3}}
    hits, qrels = _dfs(spark, run, rels)
    row = retrieval_metrics(hits, qrels, k=5).collect()[0]
    assert row["n_rel"] == 3 and row["n_hit_rel"] == 2
    assert row["recall_k"] == round(2 / 3, 6)
    assert row["precision_k"] == 0.4
    assert row["mrr"] == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg_k"] == round(dcg / idcg, 6)
    assert row["ap_k"] == round((1 / 2 + 2 / 4) / 3, 6)


def test_randomized_matches_python_reference(spark):
    rng = random.Random(11)
    run = {
        q: rng.sample(range(50), k=10) for q in range(12)
    }
    rels = {
        q: set(rng.sample(range(50), k=rng.randint(1, 20)))
        for q in range(10)  # queries 10, 11 unjudged
    }
    hits, qrels = _dfs(spark, run, rels)
    got = {r["qid"]: r for r in retrieval_metrics(hits, qrels, k=10).collect()}
    want = _py_metrics(run, rels, 10)
    assert set(got) == set(want)  # unjudged queries 10, 11 dropped
    for q, m in want.items():
        for key, v in m.items():
            assert got[q][key] == pytest.approx(round(v, 6), abs=2e-6), (q, key)


def test_relevant_query_with_empty_run_scores_zero(spark):
    hits, qrels = _dfs(spark, {1: [5, 6]}, {1: {5}, 2: {7, 8}})
    got = {r["qid"]: r for r in retrieval_metrics(hits, qrels, k=5).collect()}
    assert got[2]["recall_k"] == 0.0 and got[2]["mrr"] == 0.0
    assert got[2]["ndcg_k"] == 0.0 and got[2]["n_rel"] == 2
    assert got[1]["recall_k"] == 1.0


def test_cli_eval_verb(spark, tmp_path, capsys):
    import json as _json

    from customkb_spark import cli

    hits, qrels = _dfs(spark, {1: [1, 7], 2: [9, 2]}, {1: {1}, 2: {2}})
    rp, qp = str(tmp_path / "run"), str(tmp_path / "qrels")
    hits.write.parquet(rp)
    qrels.write.parquet(qp)
    out = str(tmp_path / "per")
    assert cli.main(["eval", rp, qp, "--k", "2", "--out", out]) == 0
    macro = _json.loads(capsys.readouterr().out)
    # q1: hit at rank 1 (mrr 1.0); q2: hit at rank 2 (mrr 0.5)
    assert macro["n_queries"] == 2 and macro["mrr"] == 0.75
    assert spark.read.parquet(out).count() == 2


def test_metrics_score_hybrid_retrieval_end_to_end(spark):
    """Integration: hybrid_search_batch hits → retrieval_metrics. The
    planted relevant chunk contains the query's exact rare terms, so it
    must surface and MRR/recall reflect it — evaluation composes with
    the engine's own retrieval surface, not just synthetic runs."""
    from pyspark.sql import Window

    from customkb_spark.embedding.embedder import embed_texts
    from customkb_spark.plans.hybrid import HybridIndex, hybrid_search_batch

    rows = [
        (1, "zygomatic arch anatomy overview", "a.md"),
        (2, "unrelated cooking recipe with butter", "b.md"),
        (3, "zygomatic arch fracture treatment notes", "a.md"),
        (4, "spark shuffle partitions tuning guide", "c.md"),
    ]
    chunks = spark.createDataFrame(
        rows, "id long, originaltext string, sourcedoc string"
    ).withColumn("embedtext", F.col("originaltext"))
    vectors = embed_texts(chunks)
    idx = HybridIndex.build(chunks, vectors)
    queries = spark.createDataFrame(
        [(100, "zygomatic arch")], "qid long, query_text string"
    )
    hits = hybrid_search_batch(idx, queries)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    run = hits.withColumn("rank", F.row_number().over(w)).select(
        "qid", "id", "rank"
    )
    qrels = spark.createDataFrame([(100, 1), (100, 3)], "qid long, id long")
    m = retrieval_metrics(run, qrels, k=4).collect()[0]
    assert m["n_rel"] == 2 and m["n_hit_rel"] == 2
    assert m["recall_k"] == 1.0 and m["mrr"] == 1.0


def test_macro_average_skips_unjudged(spark):
    """Unjudged qids are dropped from the per-query output (trec_eval;
    ADVICE r6), so n_queries IS the denominator of every reported mean."""
    run = {1: [1], 2: [9]}
    rels = {1: {1}}
    hits, qrels = _dfs(spark, run, rels)
    m = retrieval_metrics(hits, qrels, k=1)
    assert [r["qid"] for r in m.collect()] == [1]
    row = macro_average(m).collect()[0]
    assert row["n_queries"] == 1
    # only the judged query contributes: perfect scores
    assert row["recall_k"] == 1.0 and row["mrr"] == 1.0


def _graded_dfs(spark, run, grels):
    hits = spark.createDataFrame(
        [(q, d, i + 1) for q, ids in run.items() for i, d in enumerate(ids)],
        "qid long, id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(q, d, g) for q, R in grels.items() for d, g in sorted(R.items())],
        "qid long, id long, rel int",
    )
    return hits, qrels


def test_graded_ndcg_hand_computed(spark):
    """gain_col path: gains 2^rel − 1, ideal ranking = gains desc."""
    run = {1: [9, 1, 8, 3, 7]}
    grels = {1: {1: 3, 2: 2, 3: 1, 8: 0}}  # id 8 judged non-relevant
    hits, qrels = _graded_dfs(spark, run, grels)
    row = retrieval_metrics(hits, qrels, k=5, gain_col="rel").collect()[0]
    # grade-0 judgment is non-relevant: n_rel counts positives only
    assert row["n_rel"] == 3 and row["n_hit_rel"] == 2
    dcg = 7 / math.log2(3) + 1 / math.log2(5)  # id1 (g3) rank2, id3 (g1) rank4
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert row["ndcg_k"] == pytest.approx(round(dcg / idcg, 6), abs=2e-6)
    # binary metrics unchanged by grades (rel = grade > 0)
    assert row["recall_k"] == round(2 / 3, 6)
    assert row["mrr"] == 0.5
    assert row["ap_k"] == round((1 / 2 + 2 / 4) / 3, 6)


def test_graded_all_ones_equals_binary(spark):
    """grade ≡ 1 must reproduce the binary path exactly (same gains,
    same fold order) — pins the two IDCG formulations together."""
    rng = random.Random(7)
    run = {q: rng.sample(range(40), k=8) for q in range(8)}
    rels = {q: set(rng.sample(range(40), k=rng.randint(1, 12))) for q in range(8)}
    hits, qrels = _dfs(spark, run, rels)
    binary = {r["qid"]: r.asDict() for r in retrieval_metrics(hits, qrels, k=8).collect()}
    g_hits, g_qrels = _graded_dfs(spark, run, {q: {d: 1 for d in R} for q, R in rels.items()})
    graded = {
        r["qid"]: r.asDict()
        for r in retrieval_metrics(g_hits, g_qrels, k=8, gain_col="rel").collect()
    }
    assert binary == graded


def test_graded_zero_relevant_query_dropped(spark):
    """A qid judged only with grade 0 has num_rel = 0 → dropped, like
    trec_eval and the DuckDB oracle twin (ADVICE r6)."""
    run = {1: [1], 2: [2]}
    grels = {1: {1: 2}, 2: {2: 0}}
    hits, qrels = _graded_dfs(spark, run, grels)
    rows = retrieval_metrics(hits, qrels, k=1, gain_col="rel").collect()
    assert [r["qid"] for r in rows] == [1]
