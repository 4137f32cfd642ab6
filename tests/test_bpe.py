"""BPE trainer/encoder — equivalence vs a naive full-recount reference
(different algorithm shape than the incremental implementation) plus
encoding invariants and the OOV fallback."""

import pytest

from customkb_spark.operators import bpe as B


def _naive_bpe(word_counts, num_merges, eow="</w>"):
    # textbook Sennrich: full pair recount every iteration
    seqs = {w: tuple(w) + (eow,) for w, _ in word_counts if w}
    freqs = {w: c for w, c in word_counts if w}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, seq in seqs.items():
            for p in zip(seq, seq[1:]):
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = best[0] + best[1]
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


def test_incremental_matches_naive_recount():
    wc = [
        ("low", 5), ("lower", 2), ("lowest", 1),
        ("new", 4), ("newer", 3), ("newest", 1),
        ("wide", 2), ("wider", 2), ("widest", 1),
        ("a", 9), ("ab", 1), ("abc", 1),
    ]
    for n in (1, 5, 12, 40):
        fast = B.learn_bpe_merges(wc, n)
        slow = _naive_bpe(wc, n)
        assert fast[0] == slow[0], f"merge sequence diverges at n={n}"
        assert fast[1] == slow[1], f"segmentations diverge at n={n}"


def test_learn_bpe_deterministic_and_exhausts():
    wc = [("aa", 1), ("bb", 1)]  # symmetric counts: lexicographic ties
    m1, _ = B.learn_bpe_merges(wc, 100)
    m2, _ = B.learn_bpe_merges(wc, 100)
    assert m1 == m2
    # merges stop when no pairs remain (each word fully merged)
    assert len(m1) < 100


def test_segmentation_recomposes_words():
    wc = [("spark", 3), ("sparkle", 2), ("sparse", 1)]
    _, seqs = B.learn_bpe_merges(wc, 6)
    for w, seq in seqs.items():
        assert "".join(seq).replace("</w>", "") == w


def test_bpe_train_apply_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low"),
            (2, "new newer newest new"),
            (3, "wider wide wide low"),
        ],
        ["doc_id", "text"],
    )
    merges, seg = B.bpe_train(docs, num_merges=10)
    assert merges.count() == 10
    out = {r.doc_id: r for r in B.bpe_apply(docs, seg).collect()}
    assert out[1].n_words == 5
    # subword_text recomposes the document modulo the end markers
    flat = out[1].subword_text.replace("</w>", "").replace(" ", "")
    assert flat == "lowlowerlowestlowlow".replace(" ", "")
    # frequent whole words became single tokens
    assert "low</w>" in out[1].subword_text


def test_bpe_apply_oov_char_fallback_is_jvm_only(spark):
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    _, seg = B.bpe_train(docs, num_merges=0)
    oov = spark.createDataFrame([(9, "zzz abc")], ["doc_id", "text"])
    out = B.bpe_apply(oov, seg).collect()[0]
    assert out.subword_text.startswith("z z z </w>")
    plan = (
        B.bpe_apply(oov, seg)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # encode path is entirely JVM-side


def test_bpe_fertility_per_slice(spark):
    docs = spark.createDataFrame(
        [
            (1, "aaa aaa aaa aaa", "easy"),   # one frequent word: low fertility
            (2, "aaa aaa", "easy"),
            (3, "qx wv zj", "hard"),          # rare words stay characters
        ],
        ["doc_id", "text", "source"],
    )
    _, seg = B.bpe_train(docs, num_merges=4)
    out = {r.source: r for r in B.bpe_fertility(docs, seg).collect()}
    assert out["easy"].total_words == 6
    # frequent 'aaa' merged to a single token: fertility 1.0
    assert out["easy"].fertility == 1.0
    # rare 2-char words: 2 chars + </w> = 3 subwords per word
    assert out["hard"].fertility > out["easy"].fertility
    # chars_per_subword recovers word chars exactly (no separators)
    assert out["easy"].chars_per_subword == 3.0
