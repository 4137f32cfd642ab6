"""Streaming twin of the batch curation pipeline
(``plans/pipeline.curate_pipeline``) — the whole web-clean → dedup
chain → Gopher → decontamination → token-budget flow as ONE entry
point over an arriving corpus.

Composition model (the chained-gates shape
``tests/test_streaming_dedup.py`` locks, promoted to a first-class
runner): each STATEFUL gate reads the previous gate's standing parquet
output as a file-source stream and maintains its own standing output +
checkpoint; each run of :func:`streaming_curate_pipeline` drains the
current source content through every enabled gate with an
``availableNow`` trigger. Crucially, stage boundaries exist only where
STATE forces them:

- ``clean``   — language gate, C4 page/line battery, RefinedWeb line
  corrections, PII scrub: all row-local column algebra (the SAME
  shared expressions as the batch operators), fused into one stateless
  pass — no standing state beyond the sink itself;
- ``line`` / ``exact`` / ``substr`` / ``minhash`` / ``semantic`` — the
  existing streaming dedup gates (streaming/dedup.py), unchanged:
  corpus-global duplicate geometry genuinely needs standing state;
- ``quality`` — Gopher accept rule + n-gram decontamination, again
  stateless: the benchmark side is bounded by construction (eval
  suites are ~10^5 n-grams), so contamination is an
  ``array_intersect`` against a broadcast literal — the batch
  operator's join+count collapses to the same boolean per row;
- ``budget``  — ``streaming_token_budget`` (O(strata) state).

Streaming == batch (tests/test_streaming_pipeline.py): with ids
ascending in arrival order, frozen shared centroids, and strata
confined to single waves, the final corpus equals
``curate_pipeline`` on the concatenated corpus — including the text
rewrites. The known greedy-vs-batch caveats are the dedup gates' own
(documented there); the row-local stages are exact by shared
expression.

Because the quality gate is row-local, it commutes with the semantic
gate's id-level verdicts — the runner streams it from the minhash
output and the final assembly intersects the id sets, which is
algebraically identical to the batch pipeline's
semantic → gopher → decontaminate order.

``quality_token_budget`` (best-quality-first selection) is
intentionally NOT lifted: it is defined by a corpus-global quality
ORDERING, which a stream cannot know before the corpus ends — the
arrival-order admission twin is the per-stratum ``budget`` gate.
Requesting it raises.

Scale: every stage is the batch operator's plan per micro-batch; the
standing-state probes are partition-pruned (kp / cluster_id) so
per-batch cost tracks batch size, not corpus size. Reference parity:
the reference has no streaming surface at all (SURVEY.md §2.11) — this
is the Spark-native extension of its batch verify→clean→index flow.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customkb_spark.functions import text as X
from customkb_spark.operators import curation as CU
from customkb_spark.plans.pipeline import PipelineConfig
from customkb_spark.streaming import dedup as SD
from customkb_spark.streaming.curation import streaming_token_budget


@dataclass
class StageRun:
    """One executed gate: its standing docs dir + drain wall seconds."""

    stage: str
    path: str
    seconds: float


def _read_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a standing parquet dir (schema from a
    static read — the chained-gates pattern)."""
    return spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)


def _dir_source(source_path: str, work_dir: str) -> str:
    """Spark's file-stream source only lists DIRECTORIES (its batch
    relations pin ``basePath`` to the stream path, so a bare parquet
    file fails partition inference). Directory sources — the shape any
    real corpus has — pass through; a single-file source is staged as a
    symlink inside the work dir once (copy fallback for filesystems
    without symlinks)."""
    if os.path.isdir(source_path):
        return source_path
    d = os.path.join(work_dir, "_source")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(source_path))
    if not os.path.exists(link):
        try:
            os.symlink(os.path.abspath(source_path), link)
        except OSError:
            import shutil

            shutil.copy2(source_path, link)
    elif not os.path.islink(link):
        # copy fallback: refresh when the caller overwrote the source
        # file between drains (ADVICE r7 — a stale copy silently made
        # later drains process nothing new; copy2 preserves mtime so
        # the stat pair detects any rewrite). NOTE: overwriting one
        # file in place is still at-most-once per (size, mtime) under
        # Spark's file-source dedup-by-path — growing corpora should
        # ADD files/dirs; this refresh just stops the silent no-op.
        src_st, dst_st = os.stat(source_path), os.stat(link)
        if (src_st.st_size, src_st.st_mtime_ns) != (dst_st.st_size, dst_st.st_mtime_ns):
            import shutil

            shutil.copy2(source_path, link)
    return d


def streaming_curate_pipeline(
    spark: SparkSession,
    source_path: str,
    work_dir: str,
    cfg: PipelineConfig | None = None,
    embeddings: DataFrame | None = None,
    centroids=None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "source",
    watermark: str = "24 hours",  # legacy, unused since r8: every gate
    # keeps PERMANENT parquet state (the exact gate was the last
    # watermark consumer); kept so existing callers don't break
    await_secs: int = 600,
) -> list[StageRun]:
    """Drain the CURRENT content of ``source_path`` through the enabled
    gates, in the batch pipeline's stage order. Call once per arriving
    wave; standing outputs and checkpoints under ``work_dir`` persist
    across calls (and across process restarts), so later waves dedup
    against everything already processed.

    ``embeddings`` is a STATIC (id, vector) frame keyed by the original
    document ids — the semantic gate's input is a stream-static join,
    the same contract as the batch pipeline's ``embeddings`` argument.
    ``centroids`` are the frozen semantic cells (train once with
    ``embedding.index.train_centroids``; pass the SAME artifact to the
    batch pipeline for twin-exact behavior — retraining mid-stream
    would change cell scoping under the gate).

    ``benchmark`` enables n-gram decontamination; its distinct word
    n-grams are collected ONCE per run (bounded by construction — the
    batch operator broadcasts the same set) into a literal array.

    Returns the executed :class:`StageRun` list, in order. Use
    :func:`streaming_pipeline_final` for the final corpus and
    :func:`streaming_pipeline_report` for the attrition card.
    """
    cfg = cfg or PipelineConfig()
    if cfg.quality_token_budget:
        raise ValueError(
            "quality_token_budget is a corpus-global ordering — batch only; "
            "the streaming admission twin is token_budgets (per-stratum)"
        )
    runs: list[StageRun] = []

    def gate(name: str):
        def deco(fn):
            t0 = time.time()
            fn(os.path.join(work_dir, name), os.path.join(work_dir, f"ck_{name}"))
            runs.append(
                StageRun(name, os.path.join(work_dir, name), round(time.time() - t0, 3))
            )

        return deco

    cur_path, cur_text, cur_id = _dir_source(source_path, work_dir), text_col, id_col

    # ---- clean: every enabled row-local stage fused into one pass
    if cfg.lang_filter or cfg.c4_clean or cfg.refinedweb_clean or cfg.pii_scrub:

        @gate("clean")
        def _clean(out_dir, ck):
            s = _read_stream(spark, cur_path)
            if cfg.lang_filter:
                s = s.filter(
                    X.detect_language_heuristic(cur_text) == cfg.lang_filter
                )
            if cfg.c4_clean:
                s = s.withColumn(
                    "_kept", CU.c4_kept_lines(cur_text, cfg.c4_min_words_per_line)
                )
                s = (
                    s.filter(
                        CU.c4_page_verdict(
                            cur_text, F.col("_kept"), cfg.c4_min_sentences
                        )
                    )
                    .withColumn(cur_text, F.array_join("_kept", "\n"))
                    .drop("_kept")
                )
            if cfg.refinedweb_clean:
                s = s.withColumn("_kept", CU.refinedweb_kept_lines(cur_text))
                s = s.withColumn(
                    "_lines",
                    F.transform(F.split(F.col(cur_text), "\n"), lambda l: F.trim(l)),
                )
                frac = CU.refinedweb_removed_frac(F.col("_lines"), F.col("_kept"))
                s = (
                    s.filter(frac <= CU.REFINEDWEB_MAX_REMOVED_FRAC)
                    .withColumn(cur_text, F.array_join("_kept", "\n"))
                    .drop("_kept", "_lines")
                )
            if cfg.pii_scrub:
                s = CU.pii_scrub(s, cur_text, out_col="_redacted")
                s = s.drop(
                    cur_text, *[f"n_{kind}" for kind in CU.PII_ORDER]
                ).withColumnRenamed("_redacted", cur_text)
            q = (
                s.writeStream.format("parquet")
                .option("path", os.path.join(out_dir, "docs"))
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "clean", "docs")

    # ---- line dedup (stateful: standing line-hash table)
    if cfg.line_dedup:

        @gate("line")
        def _line(out_dir, ck):
            SD.streaming_line_dedup(
                _read_stream(spark, cur_path), out_dir, ck,
                id_col=cur_id, text_col=cur_text,
            ).awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "line", "docs")
        cur_text = "clean_text"

    # ---- exact dedup (first-arrival per content hash, PERMANENT
    # standing state — ADVICE r7: the watermarked
    # dropDuplicatesWithinWatermark form re-admitted exact copies of
    # docs older than the watermark, decaying the CLI's "dedup against
    # everything already processed" guarantee; the standing-parquet
    # gate matches the line/substring gates' cross-drain semantics)
    if cfg.exact_dedup:

        @gate("exact")
        def _exact(out_dir, ck):
            s = _read_stream(spark, cur_path)
            # the batch line stage drops docs line-dedup emptied; the
            # streaming line gate finalizes them with empty text, so the
            # drop happens on the NEXT stage's input (same survivors)
            s = s.select(cur_id, cur_text).filter(F.length(cur_text) > 0)
            SD.streaming_exact_dedup(
                s, out_dir, ck, id_col=cur_id, text_col=cur_text
            ).awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "exact", "docs")

    # ---- exact-substring dedup (standing window-hash table)
    if cfg.substring_dedup:

        @gate("substr")
        def _substr(out_dir, ck):
            SD.streaming_substring_dedup(
                _read_stream(spark, cur_path), out_dir, ck,
                id_col=cur_id, text_col=cur_text, k=cfg.substring_k,
            ).awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "substr", "docs")

    # ---- minhash near-dup admission (standing LSH buckets)
    if cfg.minhash_dedup:

        @gate("minhash")
        def _minhash(out_dir, ck):
            SD.streaming_minhash_dedup(
                _read_stream(spark, cur_path), out_dir, ck,
                id_col=cur_id, text_col=cur_text,
                num_hashes=cfg.minhash_num_hashes, bands=cfg.minhash_bands,
                shingle_n=cfg.minhash_shingle_n, threshold=cfg.minhash_threshold,
            ).awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "minhash", "docs")
        # the minhash gate normalizes its standing docs to (id, text)
        cur_id, cur_text = "id", "text"

    # ---- semantic dedup (standing kept-embedding table, frozen cells)
    if cfg.semantic_dedup and embeddings is not None:
        if centroids is None:
            raise ValueError(
                "semantic_dedup on a stream needs frozen centroids "
                "(embedding.index.train_centroids) — the gate cannot "
                "retrain per micro-batch"
            )
        emb_static = embeddings.select(
            F.col(embeddings.columns[0]).alias(cur_id),
            F.col(embeddings.columns[1]).alias("embedding"),
        )

        @gate("semantic")
        def _semantic(out_dir, ck):
            s = (
                _read_stream(spark, cur_path)
                .join(emb_static, cur_id)  # stream-static
                .select(F.col(cur_id).alias("vec_id"), "embedding")
            )
            SD.streaming_semantic_dedup(
                s, out_dir, ck, centroids, threshold=cfg.semantic_threshold
            ).awaitTermination(await_secs)

    # ---- quality: Gopher rule + n-gram decontamination (stateless)
    if cfg.gopher_filter or (cfg.decontaminate and benchmark is not None):

        bench_grams: list[str] | None = None
        if cfg.decontaminate and benchmark is not None:
            # bounded by construction — the batch operator broadcasts
            # the same distinct set; here it ships as a literal array
            bench_grams = sorted(
                r["ngram"]
                for r in benchmark.select(
                    F.explode(
                        CU.word_ngrams(text_col, cfg.decontaminate_n)
                    ).alias("ngram")
                )
                .distinct()
                .collect()
            )

        @gate("quality")
        def _quality(out_dir, ck):
            s = _read_stream(spark, cur_path).withColumn(
                "_toks", X.tokens(cur_text)
            )
            if cfg.gopher_filter:
                for name, col in CU.gopher_signal_columns(
                    cur_text, toks=F.col("_toks")
                ).items():
                    s = s.withColumn(name, col)
                s = s.filter(
                    CU.gopher_pass_from_signals(
                        min_words=cfg.gopher_min_words,
                        min_stop_hits=cfg.gopher_min_stop_hits,
                    )
                )
            if bench_grams is not None:
                grams = CU.ngrams_from_tokens("_toks", cfg.decontaminate_n)
                bench = F.array(*[F.lit(g) for g in bench_grams])
                contaminated = (
                    F.size(F.array_intersect(grams, bench)) > 0
                    if bench_grams
                    else F.lit(False)
                )
                s = s.filter(~contaminated)
            q = (
                s.drop("_toks")
                .writeStream.format("parquet")
                .option("path", os.path.join(out_dir, "docs"))
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(await_secs)

        cur_path = os.path.join(work_dir, "quality", "docs")

    # ---- token budget admission (O(strata) state)
    if cfg.token_budgets:
        # ride-along strata were stripped by the dedup gates; re-attach
        # from the immutable source table (stream-static join on id),
        # and — when the semantic gate ran — admit only its survivors
        # (it drained this wave already, so the static read is current)
        strata_static = spark.read.parquet(source_path).select(
            F.col(id_col).alias(cur_id), F.col(strata_col).alias("_strata")
        )
        sem_dir = os.path.join(work_dir, "semantic")

        @gate("budget")
        def _budget(out_dir, ck):
            s = _read_stream(spark, cur_path).select(cur_id, cur_text)
            if os.path.isdir(sem_dir):
                kept_ids = spark.read.parquet(sem_dir).select(
                    F.col("vec_id").alias(cur_id)
                )
                s = s.join(kept_ids, cur_id, "left_semi")
            s = s.join(strata_static, cur_id).withColumnRenamed(
                "_strata", strata_col
            )
            out = streaming_token_budget(
                s, cfg.token_budgets, strata_col=strata_col,
                text_col=cur_text, id_col=cur_id,
            )
            q = (
                out.writeStream.format("parquet")
                .option("path", os.path.join(out_dir, "admitted"))
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(await_secs)

    return runs


def _last_text_stage(work_dir: str) -> str | None:
    """Docs path of the LAST standing stage that carries document text
    (id/text column names vary per gate — resolved from the schema by
    the caller)."""
    for stage in ["quality", "minhash", "substr", "exact", "line", "clean"]:
        p = os.path.join(work_dir, stage, "docs")
        if os.path.isdir(p):
            return p
    return None


def streaming_pipeline_final(
    spark: SparkSession,
    source_path: str,
    work_dir: str,
    cfg: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assemble the final kept corpus from the standing stage outputs:
    last text-carrying stage ∩ semantic survivors ∩ budget admissions,
    texts as the gates rewrote them, ride-along columns re-attached
    from the source, then the batch pipeline's annotation steps
    (curriculum staging, split assignment) applied verbatim — they are
    deterministic per final corpus, so batch/stream parity of the
    corpus implies parity of the annotations."""
    cfg = cfg or PipelineConfig()
    docs_path = _last_text_stage(work_dir)
    if docs_path is None:
        raise ValueError(f"no standing stage outputs under {work_dir}")
    docs = spark.read.parquet(docs_path)
    tcol = "text" if "text" in docs.columns else "clean_text"
    icol = "id" if "id" in docs.columns else id_col
    out = docs.select(F.col(icol).alias(id_col), F.col(tcol).alias(text_col))
    out = out.filter(F.length(text_col) > 0)

    sem_dir = os.path.join(work_dir, "semantic")
    if os.path.isdir(sem_dir):
        out = out.join(
            spark.read.parquet(sem_dir).select(F.col("vec_id").alias(id_col)),
            id_col, "left_semi",
        )
    budget_dir = os.path.join(work_dir, "budget", "admitted")
    if os.path.isdir(budget_dir):
        adm = spark.read.parquet(budget_dir)
        bid = "id" if "id" in adm.columns else id_col
        out = out.join(
            adm.select(F.col(bid).alias(id_col)), id_col, "left_semi"
        )

    # re-attach ride-along columns (source, ts, …) from the immutable
    # source table — the batch pipeline preserved them through its
    # joins; the gates stripped them
    src = spark.read.parquet(source_path).drop(text_col)
    out = src.join(out, id_col)

    if cfg.curriculum_stages:
        from customkb_spark.operators.ranking import curriculum_stages

        out = curriculum_stages(
            out.withColumn("_q", F.round(X.quality_score(text_col), 6)),
            "_q", n_stages=cfg.curriculum_stages, id_col=id_col,
        ).drop("_q")
    if cfg.split_weights:
        from customkb_spark.operators.packing import assign_splits

        out = assign_splits(out, key_col=id_col, weights=cfg.split_weights)
    return out


def streaming_pipeline_report(
    spark: SparkSession,
    source_path: str,
    work_dir: str,
    runs: list[StageRun] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The attrition card from the standing stage outputs — the batch
    report's schema (stage_no, stage, docs_in/out, tokens_in/out,
    fracs, stage_seconds), computed by counting each stage's standing
    docs. ``stage_seconds`` come from the ``runs`` the last drain
    returned (0.0 for stages only present on disk)."""
    secs = {r.stage: r.seconds for r in (runs or [])}

    def stats(path: str, tcol: str) -> tuple[int, int]:
        df = spark.read.parquet(path)
        if tcol not in df.columns:
            tcol = "clean_text" if "clean_text" in df.columns else "text"
        row = df.filter(F.length(tcol) > 0).agg(
            F.count("*").alias("d"),
            F.coalesce(F.sum(F.size(X.tokens(tcol))), F.lit(0)).alias("t"),
        ).collect()[0]
        return int(row["d"]), int(row["t"])

    chain = ["clean", "line", "exact", "substr", "minhash", "semantic", "quality", "budget"]
    rows: list[tuple] = []
    d_in, t_in = stats(source_path, text_col)
    for stage in chain:
        base = os.path.join(work_dir, stage)
        if not os.path.isdir(base):
            continue
        if stage == "semantic":
            d_out = spark.read.parquet(base).count()
            t_out = t_in  # id-level verdicts; token accounting follows docs
        elif stage == "quality" and os.path.isdir(
            os.path.join(work_dir, "semantic")
        ):
            # the quality gate streams from the MINHASH output (it
            # commutes with semantic, which is intersected only at
            # final assembly) — but this card chains docs_in from the
            # semantic row, so count quality ∩ semantic survivors or
            # the chained attrition goes NEGATIVE whenever semantic
            # removed more docs than quality (ADVICE r7)
            df = spark.read.parquet(os.path.join(base, "docs"))
            tcol = text_col if text_col in df.columns else (
                "clean_text" if "clean_text" in df.columns else "text"
            )
            icol = id_col if id_col in df.columns else "id"
            sem = spark.read.parquet(os.path.join(work_dir, "semantic")).select(
                F.col("vec_id").alias(icol)
            )
            row = (
                df.join(sem, icol, "left_semi")
                .filter(F.length(tcol) > 0)
                .agg(
                    F.count("*").alias("d"),
                    F.coalesce(F.sum(F.size(X.tokens(tcol))), F.lit(0)).alias("t"),
                )
                .collect()[0]
            )
            d_out, t_out = int(row["d"]), int(row["t"])
        elif stage == "budget":
            adm = spark.read.parquet(os.path.join(base, "admitted"))
            r = adm.agg(
                F.count("*").alias("d"), F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t")
            ).collect()[0]
            d_out, t_out = int(r["d"]), int(r["t"])
        else:
            d_out, t_out = stats(os.path.join(base, "docs"), text_col)
        rows.append(
            (
                len(rows) + 1, stage, d_in, d_out, t_in, t_out,
                round(1 - d_out / d_in, 6) if d_in else 0.0,
                round(1 - t_out / t_in, 6) if t_in else 0.0,
                secs.get(stage, 0.0),
            )
        )
        d_in, t_in = d_out, t_out
    return spark.createDataFrame(
        rows,
        "stage_no long, stage string, docs_in long, docs_out long, "
        "tokens_in long, tokens_out long, "
        "doc_removed_frac double, token_removed_frac double, "
        "stage_seconds double",
    )
