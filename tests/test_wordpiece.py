"""WordPiece tokenizer — training (likelihood-scored merges), MaxMatch
encode, and the shared-contract roundtrip through bpe_apply."""

import random

from pyspark.sql import functions as F

from customkb_spark.operators.bpe import bpe_apply, bpe_fertility
from customkb_spark.operators.wordpiece import (
    CONT,
    learn_wordpiece,
    maxmatch_segment,
    word_symbols,
    wordpiece_train,
)

# the HF LLM-course WordPiece walkthrough corpus (public example):
# scores make (##g, ##s) the unambiguous first merge
HF_WORDS = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]


def naive_learn(word_counts, vocab_size):
    """Full-recount reference: rebuild symbol+pair counts from the
    segmentations every iteration, argmax n/(ca*cb) by integer
    cross-multiplication, lexicographic tie-break —
    the spec learn_wordpiece implements incrementally."""
    seqs = {w: word_symbols(w) for w, _ in word_counts if w}
    freqs = {w: int(c) for w, c in word_counts if w}
    sym = {}
    for w, seq in seqs.items():
        for s in seq:
            sym[s] = sym.get(s, 0) + freqs[w]
    vocab = sorted(sym)
    while len(vocab) < vocab_size:
        sym, pairs = {}, {}
        for w, seq in seqs.items():
            c = freqs[w]
            for s in seq:
                sym[s] = sym.get(s, 0) + c
            for p in zip(seq, seq[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_p, best_n, best_d = None, 0, 0
        for p, n in pairs.items():
            d = sym[p[0]] * sym[p[1]]
            if (
                best_p is None
                or n * best_d > best_n * d
                or (n * best_d == best_n * d and p < best_p)
            ):
                best_p, best_n, best_d = p, n, d
        new = best_p[0] + (
            best_p[1][len(CONT):] if best_p[1].startswith(CONT) else best_p[1]
        )
        if new not in vocab:  # distinct pairs can collide on one string
            vocab.append(new)
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and (seq[i], seq[i + 1]) == best_p
                ):
                    out.append(new)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return vocab, seqs


def test_hf_course_first_merge_is_gs():
    vocab, seqs = learn_wordpiece(HF_WORDS, vocab_size=8)
    # alphabet: b, h, p, ##g, ##n, ##s, ##u -> 7 symbols; merge #1
    # scores: all (x, ##u) and (##u, x) pairs tie at 1/36; (##g, ##s)
    # scores 5/(20*5) = 1/20 and wins
    assert vocab[7] == "##gs"
    # after that merge hugs carries the merged tail
    assert seqs["hugs"][-1] == "##gs"


def test_incremental_matches_naive_recount():
    rng = random.Random(7)
    alpha = "abcdef"
    for trial in range(6):
        words = sorted(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
                for _ in range(40)
            }
        )
        wc = [(w, rng.randint(1, 9)) for w in words]
        for size in (15, 25, 40):
            v1, s1 = learn_wordpiece(wc, size)
            v2, s2 = naive_learn(wc, size)
            assert v1 == v2, f"vocab diverged trial={trial} size={size}"
            assert s1 == s2


def test_vocab_never_holds_duplicate_pieces():
    """ADVICE r6: two distinct pairs can merge to the same string
    (('a','##bc') and ('ab','##c') both yield 'abc'); the learner must
    never double-spend the vocab budget on a collided piece. Property
    over random corpora + the HF fixture at every budget."""
    rng = random.Random(13)
    cases = [HF_WORDS]
    alpha = "abc"  # tiny alphabet maximizes collision pressure
    for _ in range(8):
        words = sorted(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(25)
            }
        )
        cases.append([(w, rng.randint(1, 9)) for w in words])
    for wc in cases:
        for size in (8, 20, 60):
            vocab, _ = learn_wordpiece(wc, size)
            assert len(vocab) == len(set(vocab)), (wc, size)


def test_learn_deterministic():
    a = learn_wordpiece(HF_WORDS, 12)
    b = learn_wordpiece(list(reversed(HF_WORDS)), 12)
    assert a == b


def test_maxmatch_longest_first():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "##n"}
    assert maxmatch_segment("unable", vocab) == ["un", "##able"]
    # a whole-word piece beats any split
    assert maxmatch_segment("unable", vocab | {"unable"}) == ["unable"]
    # unseen character -> None (the [UNK] case)
    assert maxmatch_segment("unablé", vocab) is None


def test_contract_recomposes_words(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(w for w, _ in HF_WORDS)) for i in range(3)],
        "doc_id long, text string",
    )
    _, seg = wordpiece_train(docs, vocab_size=12)
    for r in seg.collect():
        assert "".join(r["subwords"]) == r["word"] + "</w>"
        assert not any(p.startswith(CONT) for p in r["subwords"])


def test_train_apply_roundtrip_shared_path(spark):
    docs = spark.createDataFrame(
        [
            (1, "hugging pugs hug pun fun", "a"),
            (2, "bun pun hugs hug hug", "a"),
            (3, "pun pun pug bun hugs", "b"),
        ],
        "doc_id long, text string, source string",
    )
    vocab_df, seg = wordpiece_train(docs, vocab_size=40)
    assert vocab_df.count() >= 10
    enc = bpe_apply(docs, seg)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert rows[2]["n_words"] == 5
    # subword stream recomposes to the document's words + markers
    flat = rows[2]["subword_text"].replace("</w>", "").replace(" ", "")
    assert flat == "bunpunhugshughug"
    # the corpus encode plan stays JVM-only (shared-path guarantee)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEvalPython" not in plan
    fert = bpe_fertility(docs, seg, by=("source",))
    out = {r["source"]: r for r in fert.collect()}
    assert out["a"]["total_words"] == 10
    assert out["a"]["fertility"] >= 1.0
