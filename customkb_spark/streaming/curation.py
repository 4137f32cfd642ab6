"""Streaming corpus curation — the quality/PII/decontamination gates
as a continuous pipeline.

A production training-data flow curates documents AS THEY ARRIVE
(crawl → filter → store), not in periodic batch sweeps. Everything in
the batch curation suite that is per-row column algebra (quality
score, language gate, Gopher signals, PII scrub, decontamination
against a bounded benchmark set) lifts to Structured Streaming
UNCHANGED — the same expressions run per micro-batch with ZERO state:
no watermark, no shuffle, one output row per surviving input row, the
shape that keeps up with an unbounded crawl. Only the corpus-global
signals (span dedup, vocabulary, surprisal) genuinely need
batch/stateful passes, and exact dedup has its own watermark-bounded
streaming form (streaming/dedup.py).

The twin-ness is the tested contract: for any input, the streaming
pipeline under an availableNow trigger produces exactly the batch
operators' output (tests/test_streaming_curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import text as X
from customkb_spark.operators import curation as CU


def curate_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_ngrams: list[str] | None = None,
    bloom=None,
    ngram_n: int = 8,
    min_quality: float = 0.0,
    language: str | None = None,
    gopher: bool = True,
    dsir_model: dict[str, float] | None = None,
    quality_model=None,
    citations: bool = False,
    web_clean: bool = False,
    semantic_bench=None,
    semantic_bench_ids=None,
    semantic_threshold: float = 0.9,
    embedding_col: str = "embedding",
) -> DataFrame:
    """The stateless curation gate over a (streaming or batch) frame:

    - stages the token array once (curation.ngrams_from_tokens CSE
      rationale);
    - adds ``language`` (JVM heuristic), ``quality``, the Gopher
      signal columns + ``gopher_pass`` (paper thresholds);
    - PII-scrubs the text into ``text_redacted`` + per-kind counts;
    - with ``benchmark_ngrams`` (a driver-side list — eval suites are
      bounded by construction, GPT-3 appx C scale is ~10^5 n-grams;
      it ships to executors as one broadcast literal array), flags
      ``contaminated`` per row via array_intersect — no stream-stream
      join, no state; with ``bloom`` (a ``curation.NgramBloom`` built
      once per benchmark release) the flag comes from the fixed-size
      bitmap broadcast instead — the 10^8-gram tier, equally stateless
      (no false negatives, fpp-bounded over-flagging);
    - with ``dsir_model`` (a trained ``curation.dsir_train`` dict),
      adds ``log_weight`` via the stateless ``dsir_apply`` scorer;
    - with ``quality_model`` (a fitted
      ``classifier.train_quality_classifier`` PipelineModel), adds
      ``quality_prob`` — the learned filter is a broadcast coefficient
      vector, also stateless;
    - optionally filters to ``language`` / ``min_quality``;
    - with ``web_clean``, adds the web-extraction batteries' page
      verdicts (``c4_keep``, ``rw_keep``, ``rw_removed_char_frac``) —
      the same shared expressions as ``curation.c4_page_filters`` /
      ``refinedweb_line_corrections`` (keep flags only; the
      text-rewriting applies stay batch operators).
    """
    toked = docs_stream.withColumn("_toks", X.tokens(text_col))
    out = toked.withColumn(
        "language", X.detect_language_heuristic(text_col, toks=F.col("_toks"))
    ).withColumn("quality", X.quality_score(text_col, toks=F.col("_toks")))
    for name, col in X.readability_scores(text_col, toks=F.col("_toks")).items():
        out = out.withColumn(name, col)
    if gopher:
        for name, col in CU.gopher_signal_columns(text_col, toks=F.col("_toks")).items():
            out = out.withColumn(name, col)
        out = out.withColumn("gopher_pass", CU.gopher_pass_from_signals())
    out = CU.pii_scrub(out, text_col, out_col="text_redacted")
    if benchmark_ngrams is not None:
        bench = F.array(*[F.lit(g) for g in sorted(set(benchmark_ngrams))])
        grams = CU.ngrams_from_tokens("_toks", ngram_n)
        out = out.withColumn(
            "contaminated", F.size(F.array_intersect(grams, bench)) > 0
        )
    elif bloom is not None:
        out = out.withColumn(
            "contaminated",
            _bloom_any_hit(out.sparkSession, bloom, "_toks", ngram_n),
        )
    if dsir_model is not None:
        out = CU.dsir_apply(out, dsir_model, text_col=text_col).withColumnRenamed(
            "n_tokens", "dsir_n_tokens"
        )
    if quality_model is not None:
        from customkb_spark.operators.classifier import score_quality

        # the ml transform only ADDS columns, so it applies in place
        # (the staged token array survives for the final drop)
        out = score_quality(out, quality_model)
    if web_clean:
        # the web-extraction line batteries are row-local column
        # algebra (the same shared expressions as the batch operators)
        # so they ride the stateless gate; staged kept-line arrays are
        # materialized once and dropped at the end
        out = (
            out.withColumn("_c4_kept", CU.c4_kept_lines(text_col))
            .withColumn("_rw_kept", CU.refinedweb_kept_lines(text_col))
            .withColumn(
                "_rw_lines",
                F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
            )
        )
        out = out.withColumn(
            "c4_keep", CU.c4_page_verdict(text_col, F.col("_c4_kept"))
        )
        out = (
            out.withColumn(
                "rw_removed_char_frac",
                CU.refinedweb_removed_frac(F.col("_rw_lines"), F.col("_rw_kept")),
            )
            .withColumn(
                "rw_keep",
                F.col("rw_removed_char_frac")
                <= CU.REFINEDWEB_MAX_REMOVED_FRAC,
            )
            .drop("_c4_kept", "_rw_kept", "_rw_lines")
        )
    if citations:
        # the citations regex tier is pure per-row column algebra —
        # stateless, so bibliographic metadata rides the same gate
        # (no join: a stream-stream join would need state)
        from customkb_spark.operators.citations import citation_columns

        for name, col in citation_columns(text_col).items():
            out = out.withColumn(name, col)
    if semantic_bench is not None:
        # semantic decontamination rides the stateless gate as one
        # Arrow-batched matmul against the BROADCAST benchmark matrix:
        # rows must carry ``embedding_col``. The batch operator
        # (curation.decontaminate_semantic) cell-scopes because it
        # amortizes a standing corpus; a stream row is seen once, and
        # the bench side is bounded by construction (same argument as
        # the n-gram literal array above), so the exact row × bench
        # product is the cheaper AND recall-lossless shape here.
        sem_cols = _semantic_bench_columns(
            out.sparkSession, semantic_bench, semantic_bench_ids, embedding_col
        )
        out = (
            out.withColumn("_sem", sem_cols)
            .withColumn("bench_best_sim", F.col("_sem.sim"))
            .withColumn("best_bench_id", F.col("_sem.bid"))
            .withColumn(
                "semantic_contaminated",
                F.col("_sem.sim") >= F.lit(semantic_threshold),
            )
            .drop("_sem")
        )
    if language is not None:
        out = out.filter(F.col("language") == language)
    if min_quality > 0.0:
        out = out.filter(F.col("quality") >= min_quality)
    return out.drop("_toks")


def _semantic_bench_columns(spark, bench, bench_ids, embedding_col: str):
    """Struct column ``(sim, bid)``: max cosine of the row's embedding
    against the benchmark matrix, plus the argmax bench id — one
    ``(batch × |bench|)`` numpy matmul per Arrow batch. The L2-normed
    bench matrix ships as a Spark broadcast (fetched once per
    executor); ties resolve to the LARGEST bench id, matching the
    batch operator's struct-max convention."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    B = np.ascontiguousarray(np.asarray(bench, dtype=np.float64))
    if B.size == 0:
        # empty benchmark (e.g. a release with no items yet): every row
        # is trivially clean — constant struct, no UDF needed
        return F.struct(
            F.lit(-1.0).alias("sim"), F.lit(-1).cast("long").alias("bid")
        )
    B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
    ids = np.asarray(
        bench_ids if bench_ids is not None else np.arange(len(B)), dtype=np.int64
    )
    # pre-sort by id so that among equal sims argmax picks the largest
    # id via the reversed scan below
    order = np.argsort(ids)
    B, ids = B[order], ids[order]
    bc = spark.sparkContext.broadcast((B, ids))

    @pandas_udf("struct<sim: double, bid: long>")
    def _sem(vs):
        Bm, bi = bc.value
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if not len(X):
            return pd.DataFrame({"sim": [], "bid": []})
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = np.round(X @ Bm.T, 6)
        # reversed argmax = last (largest-id) maximum
        j = (S.shape[1] - 1) - np.argmax(S[:, ::-1], axis=1)
        return pd.DataFrame(
            {"sim": S[np.arange(len(X)), j], "bid": bi[j]}
        )

    return _sem(F.col(embedding_col))


def _bloom_any_hit(spark, bloom, toks_col: str, n: int):
    """Boolean column: does ANY word n-gram of the staged token array
    hit the benchmark bloom filter? Gram strings and both xxhash64
    seeds stay JVM-side (transform over the gram array); one Arrow-
    batched pandas UDF does the numpy bit tests and a per-row any() —
    stateless, so it composes onto append streams."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from customkb_spark.operators.curation import (
        _BLOOM_SEED2,
        _bloom_positions,
        ngrams_from_tokens,
    )

    bc = spark.sparkContext.broadcast(
        (bloom.bitmap.tobytes(), bloom.m_bits, bloom.k)
    )
    grams = ngrams_from_tokens(toks_col, n)
    h1s = F.transform(grams, lambda g: F.xxhash64(g))
    h2s = F.transform(grams, lambda g: F.xxhash64(g, F.lit(_BLOOM_SEED2)))

    # no annotations: stringified hints break pandas_udf inference
    @pandas_udf("boolean")
    def any_hit(a1, a2):
        bm_bytes, m, k = bc.value
        bm = np.frombuffer(bm_bytes, dtype=np.uint8)
        lens = np.fromiter((len(x) for x in a1), dtype=np.int64, count=len(a1))
        if lens.sum() == 0:
            return pd.Series([False] * len(a1))
        flat1 = pd.Series(np.concatenate([np.asarray(x, dtype=np.int64) for x in a1 if len(x)]))
        flat2 = pd.Series(np.concatenate([np.asarray(x, dtype=np.int64) for x in a2 if len(x)]))
        hit = np.ones(len(flat1), dtype=bool)
        for pos in _bloom_positions(flat1, flat2, k, m):
            bit = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                   >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            hit &= bit.astype(bool)
        out, off = [], 0
        for ln in lens:
            out.append(bool(hit[off:off + ln].any()) if ln else False)
            off += ln
        return pd.Series(out)

    return any_hit(h1s, h2s)


def streaming_token_budget(
    docs_stream: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming token-budget admission gate — the arrival-order twin
    of ``curation.token_budget_sample``. Documents are admitted per
    stratum while the stratum's RUNNING token total (over everything
    seen, admitted or not — the same cumulative-prefix rule as the
    batch operator) stays within its budget; strata absent from
    ``budgets`` are dropped.

    Custom stateful operator via ``applyInPandasWithState``: state per
    stratum is ONE long (tokens seen so far) — O(strata) state total,
    no timeout (a budget never expires). Token counting happens
    JVM-side before the grouping, so Python only sums longs; within a
    micro-batch, rows are visited in the BATCH OPERATOR'S hash order
    (the same seeded md5 key) — deterministic under replay AND exactly
    ``token_budget_sample`` when micro-batches arrive in hash order
    (the equivalence test); across batches, arrival order wins (a
    stream cannot reorder the future). Under any order the budget
    invariant holds.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    counted = docs_stream.withColumn(
        "_n_tokens", F.size(X.tokens(text_col)).cast("long")
    ).withColumn(
        "_hk",
        F.md5(
            F.concat_ws(
                ":",
                F.col(strata_col),
                F.col(id_col).cast("string"),
                F.lit("tbudget-v1"),
            )
        ),
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, docs_stream.schema[id_col].dataType),
            T.StructField(strata_col, docs_stream.schema[strata_col].dataType),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("cum_tokens", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("cum", T.LongType())])

    def handle(key, pdfs, state):
        stratum = key[0]
        budget = budgets.get(stratum)
        if budget is None:
            return  # unbudgeted stratum: dropped, no state kept
        rows = pd.concat([p[["_hk", id_col, "_n_tokens"]] for p in pdfs])
        if rows.empty:
            return
        rows = rows.sort_values(["_hk", id_col])[[id_col, "_n_tokens"]]
        cum = state.get[0] if state.exists else 0
        out_ids, out_n, out_cum = [], [], []
        for _id, n in rows.itertuples(index=False):
            cum += int(n)
            if cum <= budget:
                out_ids.append(_id)
                out_n.append(int(n))
                out_cum.append(cum)
        state.update((cum,))
        if out_ids:
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    strata_col: [stratum] * len(out_ids),
                    "n_tokens": out_n,
                    "cum_tokens": out_cum,
                }
            )

    return (
        counted.select(strata_col, id_col, "_n_tokens", "_hk")
        .groupBy(strata_col)
        .applyInPandasWithState(
            handle,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
