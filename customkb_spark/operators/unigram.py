"""Distributed unigram-LM tokenizer training (SentencePiece's unigram
model, Kudo 2018, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates").

The second of the two subword-tokenizer families a training-data
pipeline ships (the other is BPE, ``operators/bpe.py``). Where BPE
grows a vocabulary bottom-up by greedy pair merging, the unigram model
starts from a LARGE seed vocabulary of candidate pieces, fits piece
probabilities by EM over all segmentations of each word, and prunes
low-utility pieces until the target size — so every surviving piece is
justified by corpus likelihood, not merge order.

Scale shape (identical to BPE's, deliberately):

- **Counting** is corpus-sized: one token explode + one partial-agg
  ``groupBy(word)`` shuffle — the ONLY pass over the full corpus.
- **Seeding / EM / pruning** operate on the ``max_vocab``-bounded
  word-count table (Heaps' law: vocabulary-sized, not corpus-sized) on
  the driver — the same bounded-collect discipline as k-means training
  samples and BPE merge learning. EM's forward-backward lattice is
  per-word O(len × max_piece_len); the loop is inherently sequential
  (round i+1's expected counts depend on round i's probabilities), so
  distributing it would be scheduler overhead on a vocabulary-sized
  table.
- **Application** reuses ``bpe.bpe_apply`` unchanged: training emits
  the final Viterbi segmentation of every vocabulary word, so encoding
  is a pure-JVM token explode → segmentation-table join → ordered
  per-doc reassembly with character fallback for OOV. ZERO Python on
  the corpus path; the encode plan is byte-identical to BPE's (only the
  joined table differs), so both tokenizers share one oracle replay
  shape.

Pruning here keeps all single characters (the lossless-coverage
guarantee) and drops the lowest-expected-count pieces per round — the
documented simplification of SentencePiece's exact likelihood-loss
prune; both shrink toward the pieces EM actually uses, and the
expected-count criterion is deterministic and order-stable. The
reference repo's scope ends at retrieval; this extends it with the
tokenizer-construction step of the training-data story (build brief),
reference parity anchor: the reference tokenizes with fixed external
vocabularies only (customkb `embed_manager.py` token counting).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from customkb_spark.functions import text as X
from customkb_spark.operators.bpe import END_OF_WORD

_NEG_INF = float("-inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == _NEG_INF:
        return b
    if b == _NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def seed_pieces(
    word_counts: list[tuple[str, int]],
    seed_size: int,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """Seed vocabulary: every substring (≤ ``max_piece_len``) of every
    vocabulary word, scored by occurrence-count × length (the
    SentencePiece seed heuristic — long frequent substrings carry the
    compression mass), capped to the top ``seed_size`` — PLUS all
    single characters, which are never pruned (coverage guarantee).
    Returns piece → initial log-probability (count-proportional).

    O(vocab · len · max_piece_len) substring occurrences over the
    bounded word table; deterministic (score ties break
    lexicographically).
    """
    counts: dict[str, int] = {}
    chars: set[str] = set()
    for w, c in word_counts:
        if not w:
            continue
        n = len(w)
        for i in range(n):
            chars.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1] * len(kv[0]), kv[0]),
    )[: max(0, seed_size - len(chars))]
    pieces = {p: float(c) for p, c in multi}
    for ch in sorted(chars):
        pieces[ch] = float(counts[ch])
    total = sum(pieces.values())
    return {p: math.log(v / total) for p, v in sorted(pieces.items())}


def _em_expected_counts(
    word_counts: list[tuple[str, int]],
    logp: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One E-step: forward-backward over each word's segmentation
    lattice. Returns (expected piece counts, corpus log-likelihood).
    Words with no full-coverage segmentation under the current pieces
    contribute nothing (cannot happen while single chars are kept)."""
    expected: dict[str, float] = {}
    ll = 0.0
    for w, c in word_counts:
        n = len(w)
        if n == 0:
            continue
        alpha = [_NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_piece_len), i):
                lp = logp.get(w[j:i])
                if lp is not None and alpha[j] != _NEG_INF:
                    alpha[i] = _logsumexp2(alpha[i], alpha[j] + lp)
        if alpha[n] == _NEG_INF:
            continue
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] != _NEG_INF:
                    beta[i] = _logsumexp2(beta[i], lp + beta[j])
        z = alpha[n]
        ll += c * z
        for i in range(n):
            if alpha[i] == _NEG_INF:
                continue
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                lp = logp.get(w[i:j])
                if lp is not None and beta[j] != _NEG_INF:
                    expected[w[i:j]] = expected.get(w[i:j], 0.0) + c * math.exp(
                        alpha[i] + lp + beta[j] - z
                    )
    return expected, ll


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = 8
) -> list[str]:
    """Max-probability segmentation of one word under the unigram LM.
    Ties break toward FEWER pieces, then lexicographically-earliest
    final piece (deterministic across runs/engines). Falls back to
    characters only if the lattice has a gap (impossible while the
    vocabulary keeps all chars seen in training; unseen chars at encode
    time take the JVM char fallback in ``bpe_apply`` instead)."""
    n = len(word)
    best = [(_NEG_INF, 0, "")] * (n + 1)
    best[0] = (0.0, 0, "")
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j][0] == _NEG_INF:
                continue
            cand = (best[j][0] + lp, best[j][1] - 1, word[j:i])
            if (cand[0], cand[1], _rev(cand[2])) > (
                best[i][0],
                best[i][1],
                _rev(best[i][2]),
            ):
                best[i] = cand
                back[i] = j
    if best[n][0] == _NEG_INF:
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _rev(s: str) -> tuple[int, ...]:
    # lexicographically-earliest piece should WIN ties → compare on the
    # negated code points so bigger tuple == earlier string
    return tuple(-ord(c) for c in s)


def learn_unigram(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> tuple[dict[str, float], list[list[float]]]:
    """Driver-side unigram-LM fitting over the bounded word-count
    table: seed → (EM × ``em_iters`` → prune to ``shrink``·current)
    until ≤ ``vocab_size`` → final EM. Single characters are never
    pruned. Returns ``(piece → logp, per-run corpus log-likelihood
    traces)`` — one inner list per EM run (pruning between runs may
    legitimately drop the likelihood; WITHIN a run EM must not), so
    tests can assert EM monotonicity exactly where it is guaranteed.
    """
    words = [(w, int(c)) for w, c in word_counts if w]
    logp = seed_pieces(words, seed_factor * vocab_size, max_piece_len)
    trace: list[list[float]] = []

    def em_rounds() -> None:
        nonlocal logp
        run: list[float] = []
        trace.append(run)
        for _ in range(em_iters):
            expected, ll = _em_expected_counts(words, logp, max_piece_len)
            run.append(ll)
            total = sum(expected.values())
            if total <= 0:
                return
            floor = math.log(1e-12)
            # ratio can underflow to 0.0 even when expected[p] > 0
            # (denormal count vs a large total) — floor those too
            logp = {
                p: max(
                    math.log(r) if (r := expected.get(p, 0.0) / total) > 0 else floor,
                    floor,
                )
                for p in logp
            }

    em_rounds()
    while len(logp) > vocab_size:
        keep_n = max(vocab_size, int(len(logp) * shrink))
        chars = {p for p in logp if len(p) == 1}
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        room = max(0, keep_n - len(chars))
        kept = {p for p, _ in multi[:room]} | chars
        if len(kept) == len(logp):
            break
        logp = {p: lp for p, lp in logp.items() if p in kept}
        em_rounds()
    return logp, trace


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1_000,
    max_vocab: int = 100_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    end_of_word: str = END_OF_WORD,
) -> tuple[DataFrame, DataFrame]:
    """Learn a unigram-LM subword vocabulary from a corpus. Returns
    ``(pieces_df(piece, logp), seg_df(word, subwords))`` — ``seg_df``
    is drop-in for ``bpe.bpe_apply``/``bpe.bpe_fertility``, so the
    corpus encode path (pure-JVM join + ordered reassembly + char
    fallback) is shared between both tokenizer families.

    Spark does the corpus-sized word count (ONE partial-agg shuffle);
    the driver seeds/EMs/prunes over the top ``max_vocab`` words — the
    bounded-collect discipline documented in ``bpe_train``. The word's
    Viterbi segmentation gets ``end_of_word`` appended to its final
    piece so segmentations concatenate to ``word + end_of_word``,
    matching BPE's recomposition contract (and the shared fertility
    char-recovery expression).
    """
    wc = (
        df.select(F.explode(X.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(max_vocab)
    )
    rows = [(r["word"], r["freq"]) for r in wc.collect()]
    logp, _ = learn_unigram(
        rows, vocab_size, max_piece_len, seed_factor, em_iters
    )
    segs = []
    for w, _c in sorted(rows):
        pieces = viterbi_segment(w, logp, max_piece_len)
        if end_of_word:
            pieces = pieces[:-1] + [pieces[-1] + end_of_word]
        segs.append((w, pieces))
    spark = df.sparkSession
    pieces_df = spark.createDataFrame(
        sorted((p, lp) for p, lp in logp.items()), "piece string, logp double"
    )
    seg_df = spark.createDataFrame(segs, "word string, subwords array<string>")
    return pieces_df, seg_df
