"""Unigram-LM tokenizer (Kudo 2018) — Viterbi vs exhaustive
enumeration, EM likelihood monotonicity, coverage/recomposition,
pruning guarantees, determinism, and the shared-encode-path contract
with bpe_apply."""

import itertools
import math

from pyspark.sql import functions as F

from customkb_spark.operators import bpe as B
from customkb_spark.operators import unigram as U


def _exhaustive_best_score(word, logp, max_len):
    # max segmentation score over all cut-point subsets
    n = len(word)
    best = None
    for mask in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, m in enumerate(mask) if m] + [n]
        pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len or p not in logp for p in pieces):
            continue
        score = sum(logp[p] for p in pieces)
        if best is None or score > best:
            best = score
    return best


def test_viterbi_matches_exhaustive():
    logp = {
        "s": -3.0, "p": -3.1, "a": -2.9, "r": -3.2, "k": -3.3,
        "sp": -2.0, "ar": -2.5, "spark": -1.0, "park": -1.5, "spa": -4.0,
        "rk": -2.2,
    }
    for w in ["spark", "park", "spar", "a", "asparkpark"]:
        got = U.viterbi_segment(w, logp, max_piece_len=8)
        want = _exhaustive_best_score(w, logp, 8)
        assert "".join(got) == w
        assert abs(sum(logp[p] for p in got) - want) < 1e-9, (w, got, want)


def test_viterbi_prefers_fewer_pieces_on_score_tie():
    logp = {"ab": -2.0, "a": -1.0, "b": -1.0}
    # 'a'+'b' scores -2.0 == 'ab' — the single piece must win the tie
    assert U.viterbi_segment("ab", logp, 4) == ["ab"]


def test_em_loglik_nondecreasing():
    wc = [("spark", 40), ("sparkly", 7), ("park", 25), ("parks", 9),
          ("table", 30), ("tables", 12), ("stable", 8)]
    _, trace = U.learn_unigram(wc, vocab_size=24, em_iters=3)
    assert trace and all(run for run in trace)
    # WITHIN each EM run the corpus log-likelihood must not decrease
    # (across runs a prune may legitimately drop it)
    for run in trace:
        for a, b in zip(run, run[1:]):
            assert b >= a - 1e-9, trace
        assert all(t != float("-inf") for t in run)


def test_prune_keeps_chars_and_hits_target():
    wc = [("abcabc", 10), ("bcabca", 6), ("cababc", 4), ("aabbcc", 3)]
    logp, _ = U.learn_unigram(wc, vocab_size=6, seed_factor=8)
    chars = {p for p in logp if len(p) == 1}
    assert chars == {"a", "b", "c"}
    assert len(logp) <= max(6, len(chars))


def test_frequent_substring_survives_and_is_used():
    wc = [("preprocessing", 50), ("preprocess", 30), ("processing", 20),
          ("process", 40), ("pre", 15)]
    logp, _ = U.learn_unigram(wc, vocab_size=30, seed_factor=4)
    assert any(len(p) >= 4 for p in logp)
    seg = U.viterbi_segment("preprocess", logp)
    assert len(seg) < len("preprocess")  # compression happened
    assert "".join(seg) == "preprocess"


def test_learn_deterministic():
    wc = [("alpha", 9), ("alphabet", 4), ("beta", 9), ("betas", 2),
          ("gamma", 5)]
    a, _ = U.learn_unigram(wc, vocab_size=16)
    b, _ = U.learn_unigram(wc, vocab_size=16)
    assert a == b


def test_train_and_encode_roundtrip(spark, documents):
    pieces, seg = U.unigram_train(documents, vocab_size=60)
    rows = seg.collect()
    assert rows, "empty segmentation table"
    for r in rows:
        joined = "".join(r["subwords"])
        assert joined == r["word"] + B.END_OF_WORD
        assert all(s for s in r["subwords"])
    # piece probabilities are a (log-)distribution over the kept pieces
    ps = [math.exp(r["logp"]) for r in pieces.collect()]
    assert 0.5 <= sum(ps) <= 1.5

    enc = B.bpe_apply(documents, seg)
    got = enc.orderBy("doc_id").limit(5).collect()
    raw = {r["doc_id"]: r for r in documents.limit(5).collect()}
    for r in got:
        assert r["n_subwords"] >= r["n_words"]
        # recomposition: stripping markers+spaces recovers the words
        txt = r["subword_text"].replace(B.END_OF_WORD, "").replace(" ", "")
        src = raw.get(r["doc_id"])
        if src is not None:
            import re

            want = "".join(re.findall(r"[a-z0-9]+", src["text"].lower()))
            assert txt == want


def test_unigram_compresses_vs_char_fallback(spark, documents):
    _, seg = U.unigram_train(documents, vocab_size=60)
    enc = B.bpe_apply(documents, seg)
    empty_seg = seg.limit(0)
    chars_enc = B.bpe_apply(documents, empty_seg)
    a = enc.agg(F.sum("n_subwords")).first()[0]
    b = chars_enc.agg(F.sum("n_subwords")).first()[0]
    assert a < b, "learned pieces must beat character segmentation"


def test_encode_plan_has_no_python(spark, documents):
    _, seg = U.unigram_train(documents, vocab_size=40)
    plan = B.bpe_apply(documents, seg)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
