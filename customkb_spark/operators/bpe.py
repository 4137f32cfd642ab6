"""Distributed BPE tokenizer training and application.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair. A 100 TB
training-data pipeline needs exactly two pieces of it, and they have
very different scale shapes:

- **Counting** is corpus-sized: one token explode + one
  partial-aggregated ``groupBy(word)`` shuffle. This is the part Spark
  must do (and the only pass that ever touches the full corpus).
- **Merge learning** operates on the WORD-COUNT table, which is
  vocabulary-sized (Heaps' law: ~10^6 distinct words for web corpora,
  versus 10^12 corpus tokens) and capped here at ``max_vocab`` rows —
  the same bounded-collect discipline as the k-means training sample
  (``embedding/index.train_centroids``). The loop is inherently
  sequential (merge i+1's counts depend on merge i), so running it as
  10^4 Spark jobs would be pure scheduler overhead; the driver does it
  in memory with incremental pair-count maintenance.
- **Application** is corpus-sized again but needs NO Python: training
  already produced the final segmentation of every vocabulary word, so
  encoding is a token explode + a join against the segmentation table
  (broadcast-able at typical vocab sizes; AQE decides) + per-document
  reassembly. Out-of-vocabulary words fall back to character
  segmentation JVM-side.

The reference repo's scope ends at retrieval; this extends it with the
tokenizer-construction step of the training-data story (build brief).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, functions as F

from customkb_spark.functions import text as X

END_OF_WORD = "</w>"


def learn_bpe_merges(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    end_of_word: str = END_OF_WORD,
) -> tuple[list[tuple[str, str]], dict[str, tuple[str, ...]]]:
    """Driver-side Sennrich merge learning over a bounded word-count
    table. Returns ``(merges, segmentations)`` where ``merges`` is the
    ordered list of merged symbol pairs and ``segmentations`` maps every
    input word to its final subword tuple.

    Deterministic: ties on pair frequency break lexicographically, so
    the same counts always yield the same merge sequence (retry- and
    engine-stable, like every sampler in this package). Pair counts are
    maintained INCREMENTALLY (only words containing the merged pair are
    re-scanned via a pair→words index) — the textbook full recount is
    O(vocab · len) per merge; this is O(affected · len).
    """
    seqs: dict[str, tuple[str, ...]] = {}
    freqs: dict[str, int] = {}
    for w, c in word_counts:
        if not w:
            continue
        seqs[w] = tuple(w) + ((end_of_word,) if end_of_word else ())
        freqs[w] = int(c)

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[str]] = defaultdict(set)
    for w, seq in seqs.items():
        c = freqs[w]
        for p in zip(seq, seq[1:]):
            pair_counts[p] += c
            pair_words[p].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_sym = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            seq, c = seqs[w], freqs[w]
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
                if i + 1 < len(seq) and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq2 = tuple(out)
            seqs[w] = seq2
            for p in zip(seq2, seq2[1:]):
                pair_counts[p] += c
                pair_words[p].add(w)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges, seqs


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab: int = 100_000,
    end_of_word: str = END_OF_WORD,
) -> tuple[DataFrame, DataFrame]:
    """Learn BPE merges from a corpus. Returns
    ``(merges_df(rank, left, right), seg_df(word, subwords))``.

    Spark does the corpus-sized part (token explode + partial-agg word
    count, ONE shuffle); the driver learns merges over the top
    ``max_vocab`` words by (freq desc, word) — a bounded, documented
    collect (vocabulary-sized, the k-means-sample discipline; at web
    scale cap to the frequency head, which is where all the merge mass
    lives anyway). The returned ``seg_df`` holds the final segmentation
    of every vocabulary word — ``bpe_apply`` encodes the corpus with a
    join, never re-running merges per token.
    """
    wc = (
        df.select(F.explode(X.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(max_vocab)
    )
    rows = [(r["word"], r["freq"]) for r in wc.collect()]
    merges, seqs = learn_bpe_merges(rows, num_merges, end_of_word)
    spark = df.sparkSession
    merges_df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    )
    seg_df = spark.createDataFrame(
        sorted((w, list(s)) for w, s in seqs.items()),
        "word string, subwords array<string>",
    )
    return merges_df, seg_df


def bpe_fertility(
    df: DataFrame,
    seg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: tuple[str, ...] = ("source",),
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Tokenizer fertility / compression report per corpus slice — the
    quality metric tokenizer work actually tracks (subwords per word;
    characters per subword). High fertility on a language or domain
    slice means the learned vocabulary serves it poorly (the
    multilingual-tokenizer failure mode).

    Returns ``*by, n_docs, total_words, total_subwords, fertility,
    chars_per_subword``. Built on ``bpe_apply``'s output: word
    characters are recovered from the subword stream itself
    (subwords concatenate back to their words), so the corpus is not
    re-tokenized. One join to fetch the slice columns + one
    partial-agg shuffle on the (tiny) slice key space.
    """
    enc = bpe_apply(df, seg, text_col, id_col, end_of_word)
    chars = F.length(
        F.replace(
            F.replace(F.col("subword_text"), F.lit(end_of_word), F.lit("")),
            F.lit(" "),
            F.lit(""),
        )
    )
    sliced = enc.join(df.select(id_col, *by), id_col).select(
        *by,
        F.col("n_words"),
        F.col("n_subwords"),
        chars.cast("long").alias("_chars"),
    )
    return (
        sliced.groupBy(*by)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_subwords").cast("long").alias("total_subwords"),
            F.sum("_chars").alias("_tc"),
        )
        .select(
            *by,
            "n_docs",
            "total_words",
            "total_subwords",
            F.round(F.col("total_subwords") / F.greatest("total_words", F.lit(1)), 6).alias(
                "fertility"
            ),
            F.round(F.col("_tc") / F.greatest("total_subwords", F.lit(1)), 6).alias(
                "chars_per_subword"
            ),
        )
    )


def bpe_apply(
    df: DataFrame,
    seg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Encode documents with a learned segmentation table. Returns
    ``id_col, n_words, n_subwords, subword_text`` (the full subword
    sequence, space-joined, in token order).

    Plan: token posexplode → left join ``seg`` on the word (vocab-sized
    table; AQE broadcasts it when small — no forced hint, the citations
    lesson) → per-document reassembly via ``sort_array(collect_list)``
    (bounded by the document's own length). Out-of-vocabulary words
    segment to characters + the end marker, entirely JVM-side, so the
    hot path has ZERO Python.
    """
    toked = df.select(
        F.col(id_col), F.posexplode(X.tokens(text_col)).alias("_pos", "word")
    )
    # character fallback: split('ab', '') -> [a, b]; guard empties
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    fallback = (
        F.concat(chars, F.array(F.lit(end_of_word)))
        if end_of_word
        else chars
    )
    joined = toked.join(seg, "word", "left").select(
        id_col,
        "_pos",
        F.coalesce(F.col("subwords"), fallback).alias("_subs"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_subs"))),
                    lambda s: s["_subs"],
                )
            ).alias("_seq"),
        )
        .select(
            id_col,
            "n_words",
            F.size("_seq").cast("long").alias("n_subwords"),
            F.array_join("_seq", " ").alias("subword_text"),
        )
    )
