"""Distributed WordPiece tokenizer training and application.

WordPiece (Schuster & Nakajima 2012, "Japanese and Korean Voice
Search"; the BERT tokenizer, Devlin et al. 2019) is the third major
subword family next to greedy-merge BPE (``operators/bpe.py``) and the
unigram LM (``operators/unigram.py``). It differs from BPE in BOTH
phases:

- **training** merges the adjacent symbol pair with the highest
  LIKELIHOOD score ``count(ab) / (count(a) * count(b))`` — the pair
  whose merge most increases a unigram LM's corpus likelihood — rather
  than the raw pair frequency;
- **encoding** ignores the merge order entirely: each word is
  segmented greedy longest-match-first against the final vocabulary
  (the MaxMatch algorithm), with ``##`` marking continuation pieces.

Scale shape is identical to the sibling families, deliberately: Spark
does the corpus-sized word count (one token explode + one partial-agg
shuffle — the only pass that touches the full corpus), the driver
learns the vocabulary over the bounded ``max_vocab`` word table (the
k-means-sample discipline documented in ``bpe_train``), and corpus
encoding is ``bpe.bpe_apply``'s pure-JVM join against the emitted
``(word, subwords)`` segmentation table — all three tokenizer families
share ONE corpus encode path and one oracle replay shape. The emitted
contract strips the ``##`` markers and appends ``end_of_word`` to each
word's final piece so segmentations concatenate to
``word + end_of_word`` exactly like the other families (the marker
style is presentation; the algorithmic content — likelihood-scored
merges, MaxMatch encode — is what distinguishes WordPiece).

The reference repo's scope ends at retrieval; this extends it with the
tokenizer-construction step of the training-data story (build brief),
alongside bpe.py and unigram.py.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, functions as F

from customkb_spark.functions import text as X
from customkb_spark.operators.bpe import END_OF_WORD

CONT = "##"


def word_symbols(w: str) -> tuple[str, ...]:
    """BERT-style initial symbols: first char bare, continuations
    ``##``-prefixed — ``playing`` → ``(p, ##l, ##a, ##y, ##i, ##n,
    ##g)``."""
    return (w[0],) + tuple(CONT + c for c in w[1:])


def _merge_symbol(a: str, b: str) -> str:
    """Join an adjacent pair: the right side's ``##`` marker vanishes
    (it is word-internal by construction); the left side keeps its
    prefix, so merged symbols stay position-faithful."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def learn_wordpiece(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 1_000,
) -> tuple[list[str], dict[str, tuple[str, ...]]]:
    """Driver-side WordPiece vocabulary learning over a bounded
    word-count table. Returns ``(vocab, segmentations)`` — ``vocab``
    is the ordered piece list (initial alphabet sorted, then merges in
    learned order, the BERT vocab-file layout) and ``segmentations``
    maps every input word to its final ``##``-marked piece tuple.

    The selection score is exact: ``best = argmax count(ab) /
    (count(a)*count(b))`` compared by INTEGER cross-multiplication
    (``n1*d2 > n2*d1``), never a float ratio, so ties and near-ties are
    platform- and ordering-stable; exact ties break lexicographically
    on the pair, like ``learn_bpe_merges``. Pair/symbol counts are
    maintained incrementally via a pair→words index (only words
    containing the merged pair are re-scanned — O(affected·len) per
    merge, vs the textbook full recount's O(vocab·len));
    ``tests/test_wordpiece.py`` pins the incremental path to a naive
    full-recount reference on random corpora.

    Unlike BPE's fixed ``num_merges``, the budget is the FINAL
    ``vocab_size`` (alphabet + merges), matching how WordPiece vocabs
    are specified. Note the likelihood score deliberately favors pairs
    of RARE symbols (a singleton pair over singleton symbols scores
    1/1) — the well-known WordPiece contrast with BPE's
    frequency-greedy merges; the budget, not a count floor, bounds
    learning.
    """
    seqs: dict[str, tuple[str, ...]] = {}
    freqs: dict[str, int] = {}
    for w, c in word_counts:
        if not w:
            continue
        seqs[w] = word_symbols(w)
        freqs[w] = int(c)

    sym_counts: dict[str, int] = defaultdict(int)
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[str]] = defaultdict(set)
    for w, seq in seqs.items():
        c = freqs[w]
        for s in seq:
            sym_counts[s] += c
        for p in zip(seq, seq[1:]):
            pair_counts[p] += c
            pair_words[p].add(w)

    alphabet = sorted(sym_counts)
    vocab: list[str] = list(alphabet)
    vset: set[str] = set(vocab)
    while len(vocab) < vocab_size and pair_counts:
        # exact argmax of n/(ca*cb): integer cross-multiplied compare
        best_p: tuple[str, str] | None = None
        best_n = best_d = 0
        for p, n in pair_counts.items():
            d = sym_counts[p[0]] * sym_counts[p[1]]
            if (
                best_p is None
                or n * best_d > best_n * d
                or (n * best_d == best_n * d and p < best_p)
            ):
                best_p, best_n, best_d = p, n, d
        assert best_p is not None
        new_sym = _merge_symbol(*best_p)
        # distinct pairs can merge to the same string (('a','##bc') and
        # ('ab','##c') both yield '##abc'): apply the merge (so the
        # pair's bookkeeping drains) but never append a duplicate piece
        # — a double append would double-spend the vocab_size budget
        # and emit duplicate vocab rows with different piece_ids
        # (ADVICE r6; HF WordPiece skips the append the same way)
        if new_sym not in vset:
            vocab.append(new_sym)
            vset.add(new_sym)
        for w in list(pair_words.get(best_p, ())):
            seq, c = seqs[w], freqs[w]
            for s in seq:
                left = sym_counts[s] - c
                if left > 0:
                    sym_counts[s] = left
                else:
                    sym_counts.pop(s, None)
            for p in zip(seq, seq[1:]):
                left = pair_counts[p] - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    pair_counts.pop(p, None)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        pair_words.pop(p, None)
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best_p[0]
                    and seq[i + 1] == best_p[1]
                ):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq2 = tuple(out)
            seqs[w] = seq2
            for s in seq2:
                sym_counts[s] += c
            for p in zip(seq2, seq2[1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
        # the merged pair may legitimately survive in other words only
        # if those words were re-scanned above; any residual entry is
        # stale bookkeeping of the removed pair itself
        pair_counts.pop(best_p, None)
        pair_words.pop(best_p, None)
    return vocab, seqs


def maxmatch_segment(
    word: str, vocab: set[str] | dict
) -> list[str] | None:
    """WordPiece MaxMatch inference: repeatedly take the LONGEST vocab
    piece matching at the cursor (``##``-prefixed after the first).
    Returns ``None`` when some position matches nothing — the [UNK]
    case (impossible for words whose characters all appeared in
    training, since the alphabet is never pruned)."""
    n = len(word)
    pieces: list[str] = []
    i = 0
    while i < n:
        end = n
        hit: str | None = None
        while end > i:
            sub = word[i:end]
            if i > 0:
                sub = CONT + sub
            if sub in vocab:
                hit = sub
                break
            end -= 1
        if hit is None:
            return None
        pieces.append(hit)
        i = end
    return pieces


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1_000,
    max_vocab: int = 100_000,
    end_of_word: str = END_OF_WORD,
) -> tuple[DataFrame, DataFrame]:
    """Learn a WordPiece vocabulary from a corpus. Returns
    ``(vocab_df(piece_id, piece), seg_df(word, subwords))`` — ``seg_df``
    is drop-in for ``bpe.bpe_apply`` / ``bpe.bpe_fertility`` so all
    three tokenizer families share the pure-JVM corpus encode path
    (explode → segmentation join → ordered reassembly, zero Python on
    the corpus side).

    Spark does the corpus-sized word count (ONE partial-agg shuffle);
    the driver learns the vocabulary and MaxMatch-segments the bounded
    word table. Each segmentation is emitted in the shared contract —
    ``##`` markers stripped, ``end_of_word`` appended to the final
    piece — so pieces concatenate back to ``word + end_of_word`` and
    the fertility char-recovery expression holds. Words whose MaxMatch
    fails (unseen characters cannot occur here; kept for safety) are
    left OUT of ``seg_df`` and ride ``bpe_apply``'s JVM char-fallback,
    the same OOV path every family uses for tail words beyond
    ``max_vocab``.
    """
    wc = (
        df.select(F.explode(X.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(max_vocab)
    )
    rows = [(r["word"], r["freq"]) for r in wc.collect()]
    vocab, seqs = learn_wordpiece(rows, vocab_size)
    vset = set(vocab)
    segs: list[tuple[str, list[str]]] = []
    for w in sorted(seqs):
        pieces = maxmatch_segment(w, vset)
        if pieces is None:
            continue
        flat = [p[len(CONT):] if p.startswith(CONT) else p for p in pieces]
        if end_of_word:
            flat = flat[:-1] + [flat[-1] + end_of_word]
        segs.append((w, flat))
    spark = df.sparkSession
    vocab_df = spark.createDataFrame(
        list(enumerate(vocab)), "piece_id long, piece string"
    )
    seg_df = spark.createDataFrame(segs, "word string, subwords array<string>")
    return vocab_df, seg_df
