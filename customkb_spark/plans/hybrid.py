"""End-to-end hybrid retrieval — the reference's `customkb query`
lifecycle (SURVEY.md §3.3) as one declarative pipeline:

  embed query (driver, one vector)
   → vector top-k  (exact or IVF-pruned scan)
   → BM25 top-k    (postings join)
   → RRF / weighted fusion (full-outer join + window ranks)
   → category semi-join filter
   → context range join (±scope around each hit, broadcast)
   → consecutive-sid grouping → formatter

Batch mode (`query_batch`) runs the same plan for a whole DataFrame of
queries at once — the shape that matters on a cluster: one corpus scan
serves every query via the broadcast k-NN join.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customkb_spark.config import KBConfig
from customkb_spark.embedding.embedder import get_provider
from customkb_spark.functions import text as X
from customkb_spark.operators import bm25 as B
from customkb_spark.operators import fusion as FU
from customkb_spark.operators.range_join import context_range_join
from customkb_spark.operators.topk import brute_force_topk


@dataclass
class HybridIndex:
    """Materialized derived tables for one knowledgebase."""

    chunks: DataFrame  # canonical chunks table (id, sid, sourcedoc, text…)
    vectors: DataFrame  # (id, vector)
    postings: DataFrame  # (id, dl, term)
    term_stats: DataFrame  # (term, df, idf)
    corpus_size: int
    avgdl: float
    vindex: object | None = None  # VectorIndexTier (embedding/auto.py)

    @classmethod
    def build(
        cls,
        chunks: DataFrame,
        vectors: DataFrame,
        text_col: str = "originaltext",
        cfg: KBConfig | None = None,
        vindex: object | None = None,
        postings: DataFrame | None = None,
        term_stats: DataFrame | None = None,
        corpus: tuple[int, float] | None = None,
    ) -> "HybridIndex":
        """With ``cfg`` the vector side gets the reference's index-tier
        auto-selection (flat/IVF/IVFPQ by corpus size,
        embed_manager.py:163-213) via embedding/auto.build_vector_index;
        without it, exact scan (flat) — the prior behavior. Prebuilt
        artifacts skip their builds: ``vindex`` (rehydrated by
        embedding/store.load_vector_index), ``postings``/``term_stats``/
        ``corpus`` = (n, avgdl) (persisted by KnowledgeBase.build_bm25 —
        the reference's NPZ BM25 index file, bm25_manager.py)."""
        if postings is None:
            postings = B.build_postings(
                chunks, "id", text_col,
                language=cfg.language if cfg is not None else "en",
            )
        n, avgdl = corpus if corpus is not None else B.corpus_stats(
            chunks, text_col, language=cfg.language if cfg is not None else "en"
        )
        stats = term_stats if term_stats is not None else B.build_term_stats(postings, n)
        if vindex is None and cfg is not None:
            from customkb_spark.embedding.auto import build_vector_index

            vindex = build_vector_index(vectors, cfg, n=n)
        # Hot derived tables are reused by every query → cache them.
        return cls(
            chunks, vectors.cache(), postings.cache(), stats.cache(), n, avgdl, vindex
        )


from contextlib import contextmanager


@contextmanager
def _no_aqe(spark):
    """Disable adaptive execution for one interactive collect.

    AQE re-optimizes per shuffle stage by materializing each as its own
    JOB — the right trade on a real multi-stage scan, pure scheduler
    overhead on the interactive path's k-row plans (measured at the
    kb100k point: the fused head collects in 2 jobs/2.0 s with AQE off
    vs 3 jobs/2.9 s with it on; the plans are fixed-shape and tiny, so
    AQE has nothing to re-plan). Session-scoped conf, restored in
    finally; the batch paths keep AQE — their shuffles are the case it
    exists for."""
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def query_terms(query_text: str, min_len: int = 2, language: str = "en") -> list[str]:
    """Query-side twin of the index tokenizer (text.bm25_token_set) —
    the query MUST tokenize identically to the postings index
    (including the language-gated stopword drop) or compound terms
    ('state-of-the-art', '3.14') would never match."""
    return [t for t in X.bm25_tokenize_py(query_text, language) if len(t) >= min_len]


def hybrid_search(
    index: HybridIndex,
    query_text: str,
    query_vec: list[float] | None = None,
    cfg: KBConfig | None = None,
    query_cache_path: str | None = None,
) -> DataFrame:
    """Fused (id, score) top-k for one query.

    With ``query_cache_path`` the query-embedding TTL cache (reference
    query/embedding.py:76-141) is probed before the provider call; a
    repeated query within the TTL never reaches the provider."""
    from customkb_spark.functions.security import sanitize_query_text

    # reference security_utils.sanitize_query_text at the query entry:
    # control chars never reach tokenization/the embedding provider,
    # oversized/empty queries raise before any job is planned
    query_text = sanitize_query_text(query_text)
    if not query_text:  # control-chars-only strips to nothing
        raise ValueError("Query text cannot be empty")
    cfg = cfg or KBConfig()
    if query_vec is None:
        spark = index.vectors.sparkSession
        if query_cache_path:
            from customkb_spark.embedding.query_cache import probe_query_embedding

            query_vec = probe_query_embedding(
                spark, query_cache_path, query_text,
                cfg.vector_model, cfg.query_cache_ttl_days,
            )
        if query_vec is None:
            provider = get_provider(cfg.vector_model, cfg.vector_dimensions)
            query_vec = provider.get_embeddings([query_text])[0].tolist()
            if query_cache_path:
                from customkb_spark.embedding.query_cache import save_query_embedding

                save_query_embedding(
                    spark, query_cache_path, query_text, cfg.vector_model, query_vec
                )
    qv = list(map(float, query_vec))
    if index.vindex is not None:
        vec_hits = index.vindex.topk(qv, cfg.query_top_k, cfg.faiss_nprobe)
    else:
        vec_hits = brute_force_topk(index.vectors, qv, cfg.query_top_k)
    q_terms = query_terms(query_text, cfg.bm25_min_token_length, cfg.language)
    kw_hits = B.bm25_score(
        index.postings,
        index.term_stats,
        q_terms,
        index.avgdl,
        cfg.bm25_k1,
        cfg.bm25_b,
        cfg.bm25_max_results,
    )
    if not cfg.enable_hybrid_search:
        return vec_hits
    if cfg.hybrid_fusion_method == "weighted":
        return FU.weighted_fuse(vec_hits, kw_hits, cfg.vector_weight, cfg.query_top_k)
    return FU.rrf_fuse(vec_hits, kw_hits, cfg.rrf_k, cfg.query_top_k)


def retrieve_context(
    index: HybridIndex,
    fused_hits: DataFrame,
    cfg: KBConfig | None = None,
    categories: list[str] | None = None,
) -> DataFrame:
    """Hits → context rows (category filter → range join → ordered)."""
    cfg = cfg or KBConfig()
    has_cat = "primary_category" in index.chunks.columns
    # context is scoped to the DOCUMENT the hit lives in: sids restart
    # per doc, so when several docs share one source path the sourcedoc
    # key alone would join every same-sid-range chunk of every doc in
    # the file (see context_range_join's key_cols note)
    keys = (
        ("sourcedoc", "doc_id")
        if "doc_id" in index.chunks.columns
        else ("sourcedoc",)
    )
    lookup_cols = ["id", *keys, "sid"] + (["primary_category"] if has_cat else [])
    hit_rows = fused_hits.join(index.chunks.select(*lookup_cols), "id")
    if categories and has_cat:
        hit_rows = hit_rows.filter(F.col("primary_category").isin(categories))
    elif categories:
        raise ValueError(
            "category filter requested but the chunks table has no "
            "primary_category column — run categorize/import first"
        )
    return context_range_join(
        hit_rows.select(*keys, "sid", "score"),
        index.chunks,
        cfg.query_context_scope,
        cfg.similarity_threshold,
        cfg.low_similarity_scope_factor,
        key_cols=keys,
    )


def retrieve_context_hits(
    index: HybridIndex,
    fused_rows: list,
    cfg: KBConfig | None = None,
    categories: list[str] | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Single-query context retrieval from COLLECTED fused hits — the
    interactive fast path (VERDICT r7 #3b).

    ``fused_rows``: the k fused (id, score) rows already on the driver
    — the reference's own shape (FAISS returns ids, SQLite fetches
    rows, query/search.py:567-606), and k ≤ query_top_k, so the
    collect is a constant, never corpus-sized.

    Why not :func:`retrieve_context`: with the hits as a PLAN SUBTREE,
    the final action decomposes into ~11 scheduler rounds (AQE stages +
    broadcast-exchange jobs for the id-lookup join and the bounds
    broadcast) — measured as the dominant share of a 13-job interactive
    query whose latency is round-scheduling, not data. With the hits as
    a driver-LOCAL relation, the id lookup is one pushed-filter scan of
    the cached chunks table and the window expansion broadcasts a
    LocalTableScan (no job), so hits → ordered context costs two
    scheduler rounds total. Semantics are identical (same keys, same
    shrink rule, same inner-join drop of ids absent from chunks); the
    batch path keeps the fully-plan-side :func:`query_batch` shape.

    ``ordered=False`` (VERDICT r8 #4) drops the final global sort: the
    interactive formatter re-orders the ≤ k·(scope+1) rows driver-side
    anyway, and the plan-side orderBy costs an extra exchange + AQE
    round per query for an ordering nothing consumes. Keep the default
    for any caller that hands the frame onward.
    """
    import math

    cfg = cfg or KBConfig()
    has_cat = "primary_category" in index.chunks.columns
    if categories and not has_cat:
        raise ValueError(
            "category filter requested but the chunks table has no "
            "primary_category column — run categorize/import first"
        )
    keys = (
        ("sourcedoc", "doc_id")
        if "doc_id" in index.chunks.columns
        else ("sourcedoc",)
    )
    out_cols = [*keys, "hit_sid", "sid", "text"]
    sid_t = index.chunks.schema["sid"].dataType
    # schema twin of retrieve_context's output, even when empty
    empty = index.chunks.filter(F.lit(False)).select(
        *keys,
        F.col("sid").alias("hit_sid"),
        "sid",
        F.col("originaltext").alias("text"),
    )
    if not fused_rows:
        return empty
    score_by_id = {r["id"]: r["score"] for r in fused_rows}
    lookup_cols = ["id", *keys, "sid"] + (["primary_category"] if has_cat else [])
    hit_rows = (
        index.chunks.filter(
            F.col("id").isin([r["id"] for r in fused_rows])
        )
        .select(*lookup_cols)
        .collect()
    )
    if categories:
        hit_rows = [r for r in hit_rows if r["primary_category"] in categories]
    if not hit_rows:
        return empty
    # python twin of operators.range_join.context_range
    half = cfg.query_context_scope // 2
    shrunk = max(int(math.ceil(half * cfg.low_similarity_scope_factor)), 1)
    bounds = []
    for r in hit_rows:
        score = score_by_id.get(r["id"])
        eff = (
            shrunk
            if score is not None and score < cfg.similarity_threshold
            else half
        )
        bounds.append(
            tuple(r[k] for k in keys) + (r["sid"], max(r["sid"] - eff, 0), r["sid"] + eff)
        )
    # LITERAL hit windows (VERDICT r8 #4): the ≤ k bounds are inlined
    # as an array-of-structs expression instead of a createDataFrame
    # relation. A python-list DataFrame is parallelize-backed, so
    # broadcasting it for the join costs a collect JOB plus a broadcast
    # exchange; a literal array costs neither — the window expansion
    # becomes ONE map-side scan of the chunks table (filter + explode),
    # no join round at all. Literal types are CAST to the chunks
    # table's own key/sid types (ADVICE r8 — the values come from
    # collected chunks rows, so they match by construction). A chunk
    # row overlapping several hit windows emits one context row per
    # (hit, chunk) pair via explode, exactly like the former inner
    # join; a NULL key never matches (join semantics preserved).
    key_ts = [index.chunks.schema[k].dataType for k in keys]
    hit_structs = F.array(*[
        F.struct(
            *[
                F.lit(b[i]).cast(key_ts[i]).alias(f"h_{k}")
                for i, k in enumerate(keys)
            ],
            F.lit(b[len(keys)]).cast(sid_t).alias("hit_sid"),
            F.lit(b[len(keys) + 1]).cast(sid_t).alias("lo"),
            F.lit(b[len(keys) + 2]).cast(sid_t).alias("hi"),
        )
        for b in bounds
    ])

    def _match(h):
        c = F.col("sid").between(h["lo"], h["hi"])
        for k in keys:
            c = (F.col(k) == h[f"h_{k}"]) & c
        return c

    # coarse pushdown prune: the per-row array filter is exact, but the
    # scan itself should only read row groups the hit documents and the
    # global sid envelope can touch
    sid_off = len(keys)
    lo_min = min(b[sid_off + 1] for b in bounds)
    hi_max = max(b[sid_off + 2] for b in bounds)
    docs = [b[0] for b in bounds if b[0] is not None]
    if not docs:
        return empty  # every hit has a NULL sourcedoc: nothing can match
    out = (
        index.chunks.filter(
            F.col("sourcedoc").isin(docs)
            & F.col("sid").between(F.lit(lo_min), F.lit(hi_max))
        )
        .withColumn("_hits", F.filter(hit_structs, _match))
        .filter(F.size("_hits") > 0)
        .select(
            *keys,
            F.explode("_hits").alias("_h"),
            "sid",
            F.col("originaltext").alias("text"),
        )
        .select(
            *keys,
            F.col("_h.hit_sid").alias("hit_sid"),
            "sid",
            "text",
        )
    )
    return out.orderBy(*out_cols[:-1]) if ordered else out


def hybrid_search_batch(
    index: HybridIndex,
    queries: DataFrame,
    cfg: KBConfig | None = None,
) -> DataFrame:
    """Fused (qid, id, score) for a whole queries DataFrame
    (qid, query_text) — ONE corpus scan per ranker serves every query.

    Query embedding runs through the batch embedder (mapInPandas);
    vector candidates come from the broadcast k-NN join; BM25 scores the
    exploded (qid, term) set against the postings table; fusion is a
    per-qid window. At any corpus size the per-query cost is a broadcast
    row, not a scan — the shape that replaces the reference's per-query
    process loop.
    """
    cfg = cfg or KBConfig()
    from customkb_spark.embedding.embedder import embed_texts
    from customkb_spark.functions.security import (
        MAX_QUERY_LENGTH,
        sanitize_query_col,
    )
    from customkb_spark.operators.topk import knn_join

    # column twin of the single-query sanitize gate: batch and single
    # retrieval must tokenize/embed identical text for the same query.
    # The single path RAISES on empty and oversized queries; rows can't
    # raise, so invalid rows are DROPPED — their qids are simply absent
    # from the result, the batch analogue of the error. (Without the
    # length filter an oversized row would ship an unbounded payload to
    # the embedding provider that the single path refuses.)
    # materialized ONCE (bounded by the query set, not the corpus):
    # the plan re-reads the queries frame in several BROADCAST subtrees
    # (probe pairs, candidate qvec join, BM25 term sets). When the
    # caller's frame is a Python-parallelized local relation
    # (createDataFrame), each broadcast thread re-runs its pickled-RDD
    # scan + the Python embed stage; with every executor slot already
    # held by the main stages those broadcast jobs starve and the query
    # deadlocks (observed at 100k corpus: 30 broadcast-subtree tasks +
    # 2 main-stage stragglers pinned all 32 slots indefinitely). A
    # localCheckpoint turns every downstream read into a JVM-local
    # block fetch — no Python anywhere in a broadcast thread.
    queries = (
        queries.withColumn("query_text", sanitize_query_col("query_text"))
        .filter(
            (F.length("query_text") > 0)
            & (F.length("query_text") <= MAX_QUERY_LENGTH)
        )
        .localCheckpoint()
    )

    # materialize the query embeddings ONCE: the plan consumes qvecs in
    # up to three subtrees (the driver probe collect, the broadcast
    # candidate join, fusion), so without the checkpoint the Python
    # embed stage re-runs per consumer — and the copy inside the
    # BROADCAST exchange thread can deadlock the job outright (observed
    # at 100k corpus: 30 broadcast-subtree tasks + the main stage's
    # stragglers held all 32 slots, none progressing, because every
    # slot was waiting on the same re-computed mapInPandas output).
    # Size is bounded by the query set, not the corpus.
    qvecs = (
        embed_texts(
            queries, "qid", "query_text", cfg.vector_model, cfg.vector_dimensions
        )
        .select(F.col("id").alias("qid"), F.col("vector").alias("qvec"))
        .localCheckpoint()
    )
    vindex = index.vindex
    if (
        vindex is not None
        and getattr(vindex, "kind", "flat") in ("ivf", "ivfpq", "ivfsq")
        and getattr(vindex, "indexed", None) is not None
    ):
        # honor the built index tier, like the single-query path does
        # (vindex.topk above): batch retrieval probes the same nprobe
        # cells per query through ivf_search_batch — the corpus is
        # never scanned in full. IVF: identical results to the single
        # path (same nearest_clusters probes, exact scoring within).
        # IVFPQ: the probed cells come from the PQ coarse quantizer and
        # scoring is EXACT against the raw vectors semi-joined through
        # the code table's cluster_id — same candidate cells as the
        # single path's ADC, but without ADC's within-cell ranking
        # noise (recall ≥ the single path's ADC+refine; a batch ADC
        # would save the raw-vector reads at the cost of that noise).
        from customkb_spark.embedding.index import ivf_search_batch

        if vindex.kind == "ivf":
            src, probe_q = vindex.indexed, qvecs
        else:
            from customkb_spark.functions.vector import l2_normalize

            src = vindex.vectors.join(
                vindex.indexed.select(vindex.id_col, "cluster_id"), vindex.id_col
            )
            # PQ/SQ centroids live in L2-normalized space — probe with
            # the normalized query (cosine scoring is norm-invariant,
            # so scores still equal raw-query cosine). Both code tiers
            # route through the same pruned-exact shape here.
            probe_q = qvecs.select(
                "qid", l2_normalize(F.col("qvec")).alias("qvec")
            )
        vec_hits = ivf_search_batch(
            src,
            vindex.centroids,
            probe_q,
            k=cfg.query_top_k,
            nprobe=min(cfg.faiss_nprobe, len(vindex.centroids)),
            id_col=vindex.id_col,
            vec_col=vindex.vec_col,
        ).select("qid", "id", "score")
    else:
        vec_hits = knn_join(
            qvecs, index.vectors, cfg.query_top_k, "qid", "qvec", "id", "vector"
        ).select("qid", "id", "score")

    # same tokenizer as the postings index (text.bm25_token_set);
    # explode_outer avoids the inferred not-empty filter re-evaluating
    # the tokenizer (see bm25.build_postings)
    terms = queries.select(
        "qid",
        F.explode_outer(
            X.bm25_token_set("query_text", language=cfg.language, ordered=False)
        ).alias("term"),
    ).filter(F.length("term") >= cfg.bm25_min_token_length)
    kw_hits = B.bm25_score_batch(
        index.postings,
        index.term_stats,
        terms,
        index.avgdl,
        cfg.bm25_k1,
        cfg.bm25_b,
        cfg.bm25_max_results,
    )
    if not cfg.enable_hybrid_search:
        return vec_hits
    if cfg.hybrid_fusion_method == "weighted":
        return FU.weighted_fuse_batch(
            vec_hits, kw_hits, cfg.vector_weight, cfg.query_top_k
        )
    return FU.rrf_fuse_batch(vec_hits, kw_hits, cfg.rrf_k, cfg.query_top_k)


def query_batch(
    index: HybridIndex,
    queries: DataFrame,
    cfg: KBConfig | None = None,
) -> DataFrame:
    """Batch retrieval end-to-end: (qid, query_text) → per-query context
    rows (qid, sourcedoc, hit_sid, sid, text). The context range join
    carries qid through, so one broadcast of all hits expands every
    query's windows in a single chunks scan."""
    cfg = cfg or KBConfig()
    fused = hybrid_search_batch(index, queries, cfg)
    # doc-scoped context keys — same rationale as retrieve_context
    keys = (
        ["sourcedoc", "doc_id"]
        if "doc_id" in index.chunks.columns
        else ["sourcedoc"]
    )
    hit_rows = fused.join(index.chunks.select("id", *keys, "sid"), "id")
    from customkb_spark.operators.range_join import context_range

    bounds = F.broadcast(
        context_range(
            hit_rows, cfg.query_context_scope, cfg.similarity_threshold,
            cfg.low_similarity_scope_factor,
        ).select(
            "qid",
            *[F.col(k).alias(f"h_{k}") for k in keys],
            F.col("sid").alias("hit_sid"),
            "lo",
            "hi",
        )
    )
    chunks = index.chunks
    cond = chunks["sid"].between(bounds["lo"], bounds["hi"])
    for k in keys:
        cond = (chunks[k] == bounds[f"h_{k}"]) & cond
    joined = chunks.join(bounds, cond)
    return joined.select(
        "qid", *keys, "hit_sid", "sid", F.col("originaltext").alias("text")
    ).orderBy("qid", *keys, "hit_sid", "sid")


def rag_batch(
    index: HybridIndex,
    queries: DataFrame,
    cfg: KBConfig | None = None,
    fmt: str = "plain",
    model: str = "stub-extractive",
) -> DataFrame:
    """Fully-distributed batch RAG: (qid, query_text) → retrieval →
    per-qid reference strings → provider answers, with NO driver-side
    per-query work — retrieval is one corpus scan per ranker
    (hybrid_search_batch), formatting is one shuffle
    (format_references_batch), answering is one mapInPandas
    (answer_batch). Returns (qid, query_text, reference_string,
    answer). Queries with no context rows answer from an empty
    reference (the reference's no-results path)."""
    from customkb_spark.plans.answer import answer_batch
    from customkb_spark.plans.formatters import format_references_batch

    ctx = query_batch(index, queries, cfg)
    refs = format_references_batch(ctx, fmt)
    pairs = queries.join(refs, "qid", "left").select(
        "qid",
        "query_text",
        F.coalesce(F.col("reference_string"), F.lit("")).alias("reference_string"),
    )
    return answer_batch(pairs, query_col="query_text")


def query(
    index: HybridIndex,
    query_text: str,
    cfg: KBConfig | None = None,
    query_vec: list[float] | None = None,
    categories: list[str] | None = None,
    query_cache_path: str | None = None,
    rerank_cache: DataFrame | None = None,
    rerank_cache_sink=None,
    ordered: bool = True,
) -> DataFrame:
    """Full pipeline: text in → ordered context rows out
    (the reference's --context-only semantics, processing.py:262-264).
    With cfg.enable_reranking the fused head is re-ordered by the
    rerank stage (M3/T4) before context retrieval; ``rerank_cache``
    (pair_key, rerank_score) short-circuits already-scored pairs and
    ``rerank_cache_sink(new_entries_df)`` receives the write-back rows
    (reference rerank_manager.py:48-119). ``ordered=False`` skips the
    plan-side context sort for consumers that re-order driver-side
    (KnowledgeBase.query's formatter — VERDICT r8 #4)."""
    fused = hybrid_search(index, query_text, query_vec, cfg, query_cache_path)
    cfg = cfg or KBConfig()
    if cfg.enable_reranking:
        from customkb_spark.operators.rerank import rerank_hits, rerank_hits_cached

        q_terms = query_terms(query_text, min_len=1, language=cfg.language)
        if rerank_cache is not None or rerank_cache_sink is not None:
            from customkb_spark.functions import cache_stats

            probe_stats: dict = {}
            reranked, new_entries = rerank_hits_cached(
                fused,
                index.chunks,
                query_text,
                q_terms,
                rerank_cache,
                cfg.reranking_top_k,
                id_col="id",
                text_col="originaltext",
                stats=probe_stats,
            )
            if probe_stats:
                cache_stats.record(cache_stats.RERANK_CACHE, **probe_stats)
            if rerank_cache_sink is not None:
                rerank_cache_sink(new_entries)
        else:
            reranked = rerank_hits(
                fused,
                index.chunks,
                q_terms,
                cfg.reranking_top_k,
                id_col="id",
                text_col="originaltext",
            )
        fused = (
            reranked.orderBy("final_rank")
            .limit(cfg.query_top_k)
            .select("id", "score")
        )
    # interactive fast path: the fused head is ≤ query_top_k rows —
    # collect it and retrieve context from the literal hit set (see
    # retrieve_context_hits; the batch path stays fully plan-side)
    with _no_aqe(index.chunks.sparkSession):
        fused_rows = fused.collect()
    return retrieve_context_hits(index, fused_rows, cfg, categories, ordered=ordered)
