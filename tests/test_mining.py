"""Contrastive mining — brute-force reference equality, label
exclusion, triplet margin semantics, and the ANN tier's agreement with
the exact tier at full probe."""

import math

import pytest
from pyspark.sql import functions as F

from customkb_spark.operators import mining as M


@pytest.fixture(scope="module")
def tiny(spark):
    # 3 labels, vectors engineered so cross-label similarities are
    # unambiguous (no score ties across ids)
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.1, 0.95, 0.0], 1),
        (4, [0.0, 0.0, 1.0], 2),
        (5, [0.2, 0.1, 0.9], 2),
        (6, [0.7, 0.6, 0.1], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def _expected_negs(rows, k):
    out = {}
    for qid, qv, ql in rows:
        cands = [
            (round(_cos(v, qv), 6), i)
            for i, v, l in rows
            if l != ql
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = [(i, s, r + 1) for r, (s, i) in enumerate(cands[:k])]
    return out


def test_hard_negatives_match_python_reference(spark, tiny):
    rows = [(r.vec_id, r.embedding, r.label) for r in tiny.collect()]
    got = M.hard_negatives(tiny, tiny, k=3).collect()
    want = _expected_negs(rows, 3)
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.neg_id, r.neg_score, r.neg_rank))
    for q, lst in by_q.items():
        lst.sort(key=lambda t: t[2])
        assert [
            (i, round(s, 6), rk) for i, s, rk in lst
        ] == want[q], (q, lst, want[q])


def test_negatives_never_share_label(spark, tiny):
    got = M.hard_negatives(tiny, tiny, k=5)
    labels = {r.vec_id: r.label for r in tiny.collect()}
    for r in got.collect():
        assert labels[r.qid] != labels[r.neg_id]


def test_hardest_positive_excludes_self_and_minimizes(spark, tiny):
    rows = [(r.vec_id, r.embedding, r.label) for r in tiny.collect()]
    got = {r.qid: (r.pos_id, r.pos_score) for r in
           M.hardest_positives(tiny, tiny).collect()}
    for qid, qv, ql in rows:
        sames = [(round(_cos(v, qv), 6), i) for i, v, l in rows
                 if l == ql and i != qid]
        if not sames:
            assert qid not in got
            continue
        want_score, want_id = min(sames, key=lambda t: (t[0], t[1]))
        assert got[qid] == (want_id, want_score), (qid, got[qid])


def test_triplet_margin_flags(spark, tiny):
    out = M.triplet_mine(tiny, tiny, k=2, margin=0.05).collect()
    assert out
    for r in out:
        assert r.violates_margin == (r.neg_score + 0.05 > r.pos_score)
        assert r.semi_hard == (r.violates_margin and r.neg_score < r.pos_score)
    # anchor 6 (label 1, sitting between the label-0 pair) must have a
    # margin-violating negative — its nearest cross-label neighbor is
    # closer than its far positive
    v6 = [r for r in out if r.qid == 6]
    assert v6 and any(r.violates_margin for r in v6)


def test_ann_tier_matches_exact_at_full_probe(spark, embeddings):
    from customkb_spark.embedding.index import assign_clusters, train_centroids

    emb = embeddings.select("vec_id", "embedding", "label")
    anchors = emb.filter(F.col("vec_id") < 8)
    exact = M.hard_negatives(anchors, emb, k=5)
    cents = train_centroids(emb, "embedding", nlist=4)
    indexed = assign_clusters(emb.select("vec_id", "embedding"), cents, "embedding")
    ann = M.hard_negatives_ann(
        indexed,
        cents,
        anchors,
        emb.select("vec_id", "label"),
        k=5,
        nprobe=4,  # == nlist: every cluster probed → exact
        overfetch=len(emb.collect()),  # no cross-label starvation
    )
    g = {(r.qid, r.neg_id) for r in ann.collect()}
    e = {(r.qid, r.neg_id) for r in exact.collect()}
    assert g == e


def test_exact_tier_plan_jvm_only(spark, tiny):
    plan = (
        M.triplet_mine(tiny, tiny, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # anchors broadcast, corpus scans
