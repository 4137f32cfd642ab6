"""End-to-end pretraining-data curation pipeline with a per-stage
attrition report.

Real pretraining runs publish a "data card": how many documents and
tokens each curation stage removed (C4 §2.2 reports per-rule counts;
RefinedWeb figure 2 is exactly this table; Gopher A1.1 likewise). This
module composes the package's existing batch operators in the
canonical order a web-scale pipeline runs them —

    language filter (CCNet's first gate)
    → web page/line cleaning (C4 → RefinedWeb) → PII scrub
    → corpus line dedup (CCNet)
    → exact dedup → exact-substring dedup (ExactSubstr)
    → MinHash-LSH near-dup → semantic dedup (SemDeDup)
    → quality filter (Gopher) → benchmark decontamination
    → token-budget mixing → train/val/test splits

— and measures each stage's attrition. Every stage is the SAME
operator the oracle gate verifies individually (this module adds
composition + accounting, no new semantics — the ordering is the one
the chained-streaming-gates equivalence test locks for the streaming
twins in ``tests/test_streaming_dedup.py``).

Scale notes:
- the per-stage doc/token stats are scalar aggregates (two longs per
  stage) — the bounded-collect discipline;
- ``checkpoint=True`` (default) localCheckpoints each stage's output:
  every stage's stats action and every later stage would otherwise
  recompute the whole upstream chain per action — an O(stages²) blowup
  at 10 stages. At 100 TB, pass ``materialize`` (a
  write-parquet-then-read hook; CLI ``--stage-dir``) instead — durable
  stage outputs and resumability, which real pipelines want anyway;
- attrition semantics: ``docs_in/out`` and ``tokens_in/out`` bracket
  each ENABLED stage; disabled stages don't appear in the report.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import text as X


@dataclass
class PipelineConfig:
    """Stage toggles + knobs, in execution order. Defaults run the
    text-only stages; embedding- and benchmark-dependent stages engage
    when their inputs are passed to :func:`curate_pipeline`."""

    lang_filter: str | None = None  # keep docs whose heuristic lang-ID matches
    c4_clean: bool = True
    c4_min_words_per_line: int = 5
    c4_min_sentences: int = 3
    pii_scrub: bool = False  # rewrite PII spans to <KIND> markers
    refinedweb_clean: bool = True
    line_dedup: bool = True
    exact_dedup: bool = True
    substring_dedup: bool = False
    substring_k: int = 50
    minhash_dedup: bool = True
    minhash_threshold: float = 0.5
    minhash_num_hashes: int = 16
    minhash_bands: int = 4
    minhash_shingle_n: int = 3
    semantic_dedup: bool = True  # engages only when embeddings given
    semantic_threshold: float = 0.95
    semantic_nlist: int = 16
    gopher_filter: bool = True
    gopher_min_words: int = 50
    gopher_min_stop_hits: int = 2
    decontaminate: bool = True  # engages only when benchmark given
    decontaminate_n: int = 8
    token_budgets: dict[str, int] | None = None
    quality_token_budget: int | None = None  # corpus-wide, best-first
    strata_col: str = "source"
    curriculum_stages: int | None = None  # adds a stage column, no attrition
    split_weights: dict[str, float] | None = None
    checkpoint: bool = True


def _replace_text(
    cur: DataFrame, stage_out: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Swap the text column for a stage's cleaned text, keeping every
    other input column (source, lang, …) — stages only ever see/emit
    (id, text), the rest of the row rides along."""
    return cur.drop(text_col).join(
        stage_out.select(id_col, F.col("clean_text").alias(text_col)), id_col
    )


def curate_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    embeddings: DataFrame | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: Callable[[str, DataFrame], DataFrame] | None = None,
    resume: Callable[[str], DataFrame | None] | None = None,
    centroids=None,
    stage_stats: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the enabled stages in canonical order. Returns
    ``(kept_docs, report)`` — ``kept_docs`` has the input schema (text
    rewritten by the cleaning stages, plus a ``split`` column when
    ``split_weights`` is set); ``report`` is one row per executed
    stage: ``(stage_no, stage, docs_in, docs_out, tokens_in,
    tokens_out, doc_removed_frac, token_removed_frac,
    stage_seconds)``.

    ``embeddings`` (id → vector, ids matching ``docs``) enables the
    SemDeDup stage; ``benchmark`` (a text corpus) enables n-gram
    decontamination. Embeddings are keyed by the ORIGINAL ids — the
    semantic stage therefore runs on whatever documents survive the
    text stages (embeddings of dropped docs are ignored via semi-join).

    ``materialize(stage_name, df) -> df`` replaces the localCheckpoint
    between stages when given — pass a write-parquet-then-read hook to
    get durable per-stage outputs and resumability (what a real 100 TB
    run wants; localCheckpoint is executor-local and dies with the
    job). The CLI's ``--stage-dir`` wires exactly that.

    ``centroids`` (optional) freezes the semantic-dedup cells to a
    pre-trained artifact instead of training on the stage's survivors —
    pass the SAME artifact to the streaming twin
    (``streaming.pipeline.streaming_curate_pipeline``) for exact
    batch/stream parity, or reuse a standing index's centroids so
    repeated pipeline runs dedup in a stable cell geometry.

    ``stage_stats`` (optional dict): receives per-stage mass
    instrumentation — currently the minhash stage's
    ``{"minhash_dedup": {max_bucket, candidate_pairs,
    verified_pairs}}`` (see ``minhash_lsh_duplicates``) so bench
    artifacts can attribute wall-time swings on the dominant shuffle
    to pair mass vs environment.

    ``resume(stage_name) -> df | None`` is consulted BEFORE each
    stage runs: a non-None return becomes the stage's output directly,
    skipping both the stage function and materialization. The
    before-fn ordering matters — several stages do eager driver-side
    work while building their result (connected-components label
    rounds, k-means training), so a skip decided after the fn call
    would have paid most of the stage's cost already. The CLI's
    ``--resume`` wires this to "stage parquet already exists".
    """
    from customkb_spark.operators import curation as CU
    from customkb_spark.operators import dedup as D

    cfg = cfg or PipelineConfig()
    spark = docs.sparkSession

    def stats(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("d"),
            F.coalesce(F.sum(F.size(X.tokens(text_col))), F.lit(0)).alias("t"),
        ).collect()[0]
        return int(row["d"]), int(row["t"])

    cur = docs
    report_rows: list[tuple] = []
    cur_stats = stats(cur)

    def run_stage(name: str, fn) -> None:
        nonlocal cur, cur_stats
        import time

        d_in, t_in = cur_stats
        t0 = time.time()
        out = resume(name) if resume is not None else None
        if out is None:
            out = fn(cur)
            if materialize is not None:
                out = materialize(name, out)
            elif cfg.checkpoint:
                out = out.localCheckpoint()
        d_out, t_out = stats(out)
        report_rows.append(
            (
                len(report_rows) + 1,
                name,
                d_in,
                d_out,
                t_in,
                t_out,
                round(1 - d_out / d_in, 6) if d_in else 0.0,
                round(1 - t_out / t_in, 6) if t_in else 0.0,
                # wall seconds incl. the materialization and the stats
                # action — the operational number a run log wants
                round(time.time() - t0, 3),
            )
        )
        cur, cur_stats = out, (d_out, t_out)

    if cfg.lang_filter:
        def _lf(df):
            return df.filter(
                X.detect_language_heuristic(text_col) == cfg.lang_filter
            )

        run_stage("lang_filter", _lf)

    if cfg.c4_clean:
        def _c4(df):
            out = CU.c4_page_filters(
                df,
                text_col,
                id_col,
                min_words_per_line=cfg.c4_min_words_per_line,
                min_sentences=cfg.c4_min_sentences,
            )
            return _replace_text(df, out.filter("keep"), id_col, text_col)

        run_stage("c4_clean", _c4)

    if cfg.refinedweb_clean:
        def _rw(df):
            out = CU.refinedweb_line_corrections(df, text_col, id_col)
            return _replace_text(df, out.filter("keep"), id_col, text_col)

        run_stage("refinedweb_clean", _rw)

    if cfg.pii_scrub:
        def _pii(df):
            out = CU.pii_scrub(df, text_col, out_col="_redacted")
            # drop exactly the count columns the scrubber added (the
            # input may legitimately carry its own n_* columns)
            return out.drop(
                text_col, *[f"n_{kind}" for kind in CU.PII_ORDER]
            ).withColumnRenamed("_redacted", text_col)

        run_stage("pii_scrub", _pii)

    if cfg.line_dedup:
        def _ld(df):
            out = CU.line_dedup(df, text_col, id_col)
            return _replace_text(
                df, out.filter(F.length("clean_text") > 0), id_col, text_col
            )

        run_stage("line_dedup", _ld)

    if cfg.exact_dedup:
        def _ed(df):
            groups = D.exact_duplicates(df, id_col, text_col)
            losers = groups.select(
                F.explode("dup_ids").alias("_lid"), "canonical_id"
            ).filter(F.col("_lid") != F.col("canonical_id"))
            return df.join(
                losers, df[id_col] == losers["_lid"], "left_anti"
            )

        run_stage("exact_dedup", _ed)

    if cfg.substring_dedup:
        def _sd(df):
            out = D.exact_substring_dedup(df, id_col, text_col, k=cfg.substring_k)
            cleaned = out.filter(F.length(text_col) > 0).select(
                id_col, F.col(text_col).alias("clean_text")
            )
            return _replace_text(df, cleaned, id_col, text_col)

        run_stage("substring_dedup", _sd)

    if cfg.minhash_dedup:
        def _mh(df):
            # pair-mass instrumentation rides along when the caller
            # asks (VERDICT r8 #2): candidate/verified pair counts +
            # max bucket land in stage_stats["minhash_dedup"]
            mh_stats: dict | None = None
            if stage_stats is not None:
                mh_stats = stage_stats.setdefault("minhash_dedup", {})
            pairs = D.minhash_lsh_duplicates(
                df,
                id_col,
                text_col,
                num_hashes=cfg.minhash_num_hashes,
                bands=cfg.minhash_bands,
                shingle_n=cfg.minhash_shingle_n,
                threshold=cfg.minhash_threshold,
                stats=mh_stats,
            )
            comp = D.connected_components(pairs)
            losers = comp.filter(F.col("id") != F.col("cluster_id"))
            return df.join(losers, df[id_col] == losers["id"], "left_anti")

        run_stage("minhash_dedup", _mh)

    if cfg.semantic_dedup and embeddings is not None:
        def _sem(df):
            from customkb_spark.embedding.index import train_centroids

            surv = embeddings.join(
                df.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "semi"
            )
            cents = (
                centroids
                if centroids is not None
                else train_centroids(surv, vec_col, nlist=cfg.semantic_nlist)
            )
            applied = D.semdedup_apply(
                surv, cents, vec_id_col, vec_col, threshold=cfg.semantic_threshold
            )
            # semdedup_apply normalizes the id column to "id"
            keep_ids = applied.filter("kept").select(F.col("id").alias(id_col))
            return df.join(keep_ids, id_col, "semi")

        run_stage("semantic_dedup", _sem)

    if cfg.gopher_filter:
        def _gq(df):
            sig = CU.gopher_quality_filter(
                df,
                text_col,
                id_col,
                min_words=cfg.gopher_min_words,
                min_stop_hits=cfg.gopher_min_stop_hits,
            )
            return df.join(
                sig.filter("gopher_pass").select(id_col), id_col, "semi"
            )

        run_stage("gopher_filter", _gq)

    if cfg.decontaminate and benchmark is not None:
        def _dc(df):
            rep = CU.decontaminate(
                df, benchmark, n=cfg.decontaminate_n, text_col=text_col, id_col=id_col
            )
            return df.join(
                rep.filter(~F.col("contaminated")).select(id_col), id_col, "semi"
            )

        run_stage("decontaminate", _dc)

    if cfg.token_budgets:
        def _tb(df):
            sel = CU.token_budget_sample(
                df, cfg.token_budgets, cfg.strata_col, text_col, id_col
            )
            return df.join(sel.select(id_col), id_col, "semi")

        run_stage("token_budget_mix", _tb)

    if cfg.quality_token_budget:
        def _qb(df):
            sel = CU.quality_budget_sample(
                df, cfg.quality_token_budget, text_col=text_col, id_col=id_col
            )
            return df.join(sel.select(id_col), id_col, "semi")

        run_stage("quality_budget", _qb)

    # annotation steps (no attrition, so outside the stage accounting)
    if cfg.curriculum_stages:
        from customkb_spark.functions import text as XT
        from customkb_spark.operators.ranking import curriculum_stages

        cur = curriculum_stages(
            cur.withColumn("_q", F.round(XT.quality_score(text_col), 6)),
            "_q",
            n_stages=cfg.curriculum_stages,
            id_col=id_col,
        ).drop("_q")

    if cfg.split_weights:
        from customkb_spark.operators.packing import assign_splits

        cur = assign_splits(cur, key_col=id_col, weights=cfg.split_weights)

    report = spark.createDataFrame(
        report_rows,
        "stage_no long, stage string, docs_in long, docs_out long, "
        "tokens_in long, tokens_out long, "
        "doc_removed_frac double, token_removed_frac double, "
        "stage_seconds double",
    )
    return cur, report
