"""KnowledgeBase facade — the reference's CLI lifecycle
(``customkb database|embed|query``, customkb.py:545-629) over Spark
tables.

A KB is a directory of parquet tables (the reference's
$VECTORDBS/<name>/ with SQLite+FAISS+NPZ sidecars, SURVEY.md §1.1):

    <kb_dir>/chunks/      the canonical chunk table (CHUNKS_SCHEMA subset)
    <kb_dir>/vectors/     (id, vector) — the FAISS-file equivalent
    <kb_dir>/ingest_log/  (file_path, …) — the file_metadata registry

Semantics preserved from the reference:
- ``database`` is incremental: already-ingested sources are skipped via
  a left-anti join on the ingest log (S4/U2); ``force`` re-ingests.
- ``embed`` embeds only rows without a vector (the ``embedded=0``
  pending set, embed_manager.py:586) — expressed as an anti-join
  against the vectors table instead of a mutable flag column, so the
  append-only tables need no MERGE.
- ``query`` builds the hybrid index from the tables and runs the full
  fused-retrieval pipeline; ``context_only`` mirrors the reference's
  --context-only flag, otherwise the (stubbed) LLM answers.

At 100 TB: write the chunks table BUCKETED by ``sourcedoc``
(plans/layout.py — bucketBy into the catalog, per-bucket sorted by
sid) so each document's chunks co-locate and every per-doc operator
(sid window, context range join, chunk stats, categorize sampling)
plans exchange-free; proven on the plan in
tests/test_plans.py::test_bucketed_groupby_no_exchange. The ingest
log stays tiny either way.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customkb_spark.config import KBConfig
from customkb_spark.embedding.embedder import embed_texts
from customkb_spark.ingest.pipeline import documents_to_chunks
from customkb_spark.plans import hybrid as HY
from customkb_spark.plans.answer import generate_answer
from customkb_spark.plans.formatters import format_references
from customkb_spark.plans.querylog import log_query


class KnowledgeBase:
    def __init__(self, spark: SparkSession, kb_dir: str, cfg: KBConfig | None = None):
        self.spark = spark
        self.kb_dir = kb_dir
        self.cfg = cfg or KBConfig()
        self._index: HY.HybridIndex | None = None

    # ---------------------------------------------------------- paths
    def _p(self, name: str) -> str:
        return os.path.join(self.kb_dir, name)

    def _exists(self, name: str) -> bool:
        return os.path.isdir(self._p(name))

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._p(name))

    # ------------------------------------------------------- database
    def database(self, docs: DataFrame, force: bool = False) -> int:
        """Ingest a documents DataFrame (doc_id, text, source[, lang]).

        Returns the number of NEW chunks written. Incremental by
        ``source`` path; ``force=True`` re-ingests everything (the
        reference deletes+reinserts per path, db_manager.py:613-615).
        """
        if not force and self._exists("ingest_log"):
            seen = self._read("ingest_log")
            docs = docs.join(
                seen.select(F.col("file_path").alias("source")), "source", "left_anti"
            )
        lang = "lang" if "lang" in docs.columns else None
        if lang is None and self.cfg.detect_language:
            # reference database --detect-language: per-doc heuristic
            # (language_detector.py) — a pure column expression here
            from customkb_spark.functions import text as X

            docs = docs.withColumn("lang", X.detect_language_heuristic("text"))
            lang = "lang"
        chunks = documents_to_chunks(
            docs, lang_col=lang, chunk_size=self.cfg.db_max_tokens
        )
        n = chunks.count()
        if n == 0:
            return 0
        if force and self._exists("chunks"):
            # reference semantics (db_manager.py:613-615): delete the
            # re-ingested paths' rows, keep everything else — an
            # anti-join rewrite here; replaceWhere/MERGE on a
            # source-partitioned lakehouse table at scale
            sources = docs.select("source").distinct()
            old = self._read("chunks")
            kept = old.join(
                sources.select(F.col("source").alias("sourcedoc")),
                "sourcedoc",
                "left_anti",
            )
            if self._exists("vectors"):
                # drop vectors of the replaced sources' old chunks: ids
                # are deterministic, so changed text under the same id
                # must re-embed (the reference resets embedded=0 on
                # reinsert)
                replaced_ids = old.join(
                    sources.select(F.col("source").alias("sourcedoc")), "sourcedoc"
                ).select("id")
                kept_vecs = (
                    self._read("vectors")
                    .join(replaced_ids, "id", "left_anti")
                    .localCheckpoint()
                )
                kept_vecs.write.mode("overwrite").parquet(self._p("vectors"))
            merged = kept.unionByName(chunks).localCheckpoint()
            merged.write.mode("overwrite").parquet(self._p("chunks"))
            old_log = (
                self._read("ingest_log")
                .join(
                    sources.select(F.col("source").alias("file_path")),
                    "file_path",
                    "left_anti",
                )
                if self._exists("ingest_log")
                else None
            )
            new_log = docs.select(
                F.col("source").alias("file_path"),
                F.current_timestamp().alias("ingested_at"),
            ).distinct()
            log = (
                old_log.unionByName(new_log).localCheckpoint()
                if old_log is not None
                else new_log
            )
            log.write.mode("overwrite").parquet(self._p("ingest_log"))
            # chunk ids are deterministic, so a force re-ingest can change
            # text/vectors IN PLACE under unchanged ids and row counts —
            # the persisted ANN/BM25 artifacts are unprovably stale; drop
            # them so the next query rebuilds (store.py's fingerprint
            # check is the backstop for out-of-band mutation)
            self._drop_persisted_indexes()
        else:
            chunks.write.mode("append").parquet(self._p("chunks"))
            log = docs.select(
                F.col("source").alias("file_path"),
                F.current_timestamp().alias("ingested_at"),
            ).distinct()
            log.write.mode("append").parquet(self._p("ingest_log"))
        self._invalidate()
        return n

    # ---------------------------------------------------------- embed
    def embed(self, use_cache: bool = True) -> int:
        """Embed chunks that have no vector yet (anti-join pending set).
        Returns the number of new vectors.

        With ``use_cache`` the J5 read-through cache table
        (<kb_dir>/emb_cache: cache_key, vector) is probed first —
        texts seen before (any chunk, any re-ingest) skip the provider
        entirely; misses are embedded and written back. This is the
        reference's two-tier embedding cache (embedding/cache.py:49-120)
        as one left join + one append."""
        from customkb_spark.embedding.cache import split_hits_misses, with_cache_key

        chunks = self._read("chunks")
        pending = chunks.filter(F.length("embedtext") > 0)
        if self._exists("vectors"):
            have = self._read("vectors").select("id")
            pending = pending.join(have, "id", "left_anti")

        if not use_cache:
            vectors = embed_texts(
                pending, "id", "embedtext",
                self.cfg.vector_model, self.cfg.vector_dimensions,
            )
        else:
            keyed = with_cache_key(
                pending.select("id", "embedtext"), F.col("embedtext"), self.cfg.vector_model
            )
            cache = (
                self._read("emb_cache")
                if self._exists("emb_cache")
                else self.spark.createDataFrame(
                    [], "cache_key string, vector array<float>"
                )
            )
            hits, misses = split_hits_misses(
                keyed, cache, expected_dims=self.cfg.vector_dimensions
            )
            # materialize once — the plan is consumed three times
            # (write-back, union, count); a real provider must not be
            # re-invoked per action
            new_vectors = embed_texts(
                misses, "id", "embedtext",
                self.cfg.vector_model, self.cfg.vector_dimensions,
            ).localCheckpoint()
            # write-back: one cache row per distinct missed text
            write_back = (
                misses.select("id", "cache_key")
                .join(new_vectors, "id")
                .select("cache_key", "vector")
                .dropDuplicates(["cache_key"])
            )
            if write_back.limit(1).count():
                write_back.write.mode("append").parquet(self._p("emb_cache"))
            vectors = hits.select("id", "vector").unionByName(new_vectors)
            # hit/miss counters (reference performance_analyzer cache
            # section): misses = freshly-embedded rows (checkpointed —
            # the count re-invokes no provider); hits = the remainder
            miss_n = new_vectors.count()

        n = vectors.count()
        if use_cache:
            from customkb_spark.functions import cache_stats

            cache_stats.record(
                cache_stats.EMBEDDING_CACHE, hits=n - miss_n, misses=miss_n
            )
        if n:
            vectors.write.mode("append").parquet(self._p("vectors"))
            self._invalidate()
        return n

    # ----------------------------------------------------------- bm25
    def build_bm25(self, force: bool = False) -> dict:
        """Materialize the BM25 index tables (postings, term_stats) to
        the KB dir — the reference's ``customkb bm25`` command, which
        tokenizes the corpus into a persisted NPZ index
        (bm25_manager.py). Skips the build when the persisted index
        already covers the current chunks (content-fingerprint freshness
        check, the verify-indexes analogue). Returns
        ``{n_chunks, avgdl, n_terms, rebuilt}``."""
        from customkb_spark.operators import bm25 as B25

        from customkb_spark.embedding.store import content_fingerprint, dir_fingerprint

        chunks = self._read("chunks")
        if not force and self._exists("bm25_meta"):
            meta = self._read("bm25_meta").collect()[0]
            # language is part of freshness: postings tokenized under a
            # different stopword gate are the wrong index for this cfg.
            # Unchanged chunks-dir listing proves content unchanged
            # without any corpus scan; otherwise fall to the content
            # fingerprint (force re-ingest can rewrite text under
            # unchanged ids and counts, ADVICE r2).
            src_fp = getattr(meta, "chunks_src_fp", None)
            if getattr(meta, "language", "en") == self.cfg.language and (
                (src_fp is not None and dir_fingerprint(self._p("chunks")) == src_fp)
                or getattr(meta, "chunks_fp", None)
                == content_fingerprint(chunks, "id", "originaltext")
            ):
                return {
                    "n_chunks": int(meta.n_chunks), "avgdl": float(meta.avgdl),
                    "n_terms": self._read("term_stats").count(), "rebuilt": False,
                }
        n, avgdl = B25.corpus_stats(chunks, "originaltext", language=self.cfg.language)
        fp = content_fingerprint(chunks, "id", "originaltext")
        postings = B25.build_postings(chunks, "id", "originaltext", language=self.cfg.language)
        postings.write.mode("overwrite").parquet(self._p("postings"))
        # read back so term_stats aggregates the materialized table
        # instead of re-tokenizing the corpus a second time
        postings = self._read("postings")
        stats = B25.build_term_stats(postings, n)
        stats.write.mode("overwrite").parquet(self._p("term_stats"))
        from customkb_spark.embedding.store import _write_single_file, dir_fingerprint

        _write_single_file(
            self.spark,
            [(int(n), float(avgdl), fp, self.cfg.language,
              dir_fingerprint(self._p("chunks")))],
            "n_chunks long, avgdl double, chunks_fp string, language string, "
            "chunks_src_fp string",
            self._p("bm25_meta"),
        )
        self._invalidate()
        return {
            "n_chunks": n, "avgdl": avgdl,
            "n_terms": self._read("term_stats").count(), "rebuilt": True,
        }

    def build_bm25_filtered(
        self,
        keywords: list[str] | None = None,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
        name: str = "bm25_focused",
    ) -> dict:
        """Focused BM25 index over a filtered slice of the corpus —
        the reference's scripts/rebuild_bm25_filtered.py (keywords
        substring-match text OR sourcedoc, OR-combined; ``include``
        patterns OR-combine over sourcedoc; ``exclude`` patterns
        AND-exclude), re-expressed as one predicate on the chunks scan
        (pushed into parquet) + the standard postings/term_stats build.

        Tables land under ``<name>_postings`` / ``<name>_term_stats`` /
        ``<name>_meta`` next to the primary index; feed them to
        ``HybridIndex.build(postings=..., term_stats=..., corpus=...)``
        for a slice-scoped retrieval session. Corpus stats (N, avgdl)
        are recomputed over the SLICE, matching the reference (idf and
        length normalization are relative to the focused corpus, not
        the full KB).
        """
        from customkb_spark.operators import bm25 as B25

        chunks = self._read("chunks")
        cond = None
        if keywords:
            kw = None
            for w in keywords:
                c = F.col("originaltext").contains(w) | F.col("sourcedoc").contains(w)
                kw = c if kw is None else (kw | c)
            cond = kw
        if include:
            inc = None
            for p in include:
                c = F.col("sourcedoc").contains(p)
                inc = c if inc is None else (inc | c)
            cond = inc if cond is None else (cond & inc)
        if exclude:
            for p in exclude:
                c = ~F.col("sourcedoc").contains(p)
                cond = c if cond is None else (cond & c)
        sliced = chunks.filter(cond) if cond is not None else chunks

        n, avgdl = B25.corpus_stats(sliced, "originaltext", language=self.cfg.language)
        postings = B25.build_postings(
            sliced, "id", "originaltext", language=self.cfg.language
        )
        postings.write.mode("overwrite").parquet(self._p(f"{name}_postings"))
        postings = self._read(f"{name}_postings")
        stats = B25.build_term_stats(postings, n)
        stats.write.mode("overwrite").parquet(self._p(f"{name}_term_stats"))
        from customkb_spark.embedding.store import _write_single_file

        _write_single_file(
            self.spark,
            [(int(n), float(avgdl), self.cfg.language)],
            "n_chunks long, avgdl double, language string",
            self._p(f"{name}_meta"),
        )
        self._invalidate()
        return {
            "n_chunks": int(n),
            "avgdl": float(avgdl),
            "n_terms": stats.count(),
            "name": name,
        }

    def load_bm25_filtered(self, name: str = "bm25_focused") -> tuple:
        """(postings, term_stats, (n, avgdl)) of a focused index built
        by ``build_bm25_filtered`` — ready for ``HybridIndex.build``."""
        meta = self._read(f"{name}_meta").collect()[0]
        return (
            self._read(f"{name}_postings"),
            self._read(f"{name}_term_stats"),
            (int(meta.n_chunks), float(meta.avgdl)),
        )

    def _persisted_bm25(self, chunks) -> tuple:
        """(postings, term_stats, (n, avgdl)) from the persisted index
        when it is fresh, else (None, None, None)."""
        if not (
            self._exists("bm25_meta")
            and self._exists("postings")
            and self._exists("term_stats")
        ):
            return None, None, None
        from customkb_spark.embedding.store import content_fingerprint, dir_fingerprint

        meta = self._read("bm25_meta").collect()[0]
        if getattr(meta, "language", "en") != self.cfg.language:
            # a different stopword gate than this cfg — query terms
            # would tokenize against the wrong index
            return None, None, None
        # cheap path first: an unchanged chunks-dir listing proves the
        # content unchanged (parquet files are immutable) without the
        # corpus scan; mismatch only demotes to the content check
        src_fp = getattr(meta, "chunks_src_fp", None)
        if src_fp is None or dir_fingerprint(self._p("chunks")) != src_fp:
            if getattr(meta, "chunks_fp", None) != content_fingerprint(
                chunks, "id", "originaltext"
            ):
                return None, None, None
        return (
            self._read("postings"),
            self._read("term_stats"),
            (int(meta.n_chunks), float(meta.avgdl)),
        )

    # ---------------------------------------------------------- query
    def _drop_persisted_indexes(self) -> None:
        """Delete the persisted derived-index artifacts (vindex dir +
        BM25 tables). Called on force re-ingest: content may have
        changed under unchanged ids/counts, which no freshness check on
        the artifacts alone can prove."""
        import shutil

        for name in ("vindex", "postings", "term_stats", "bm25_meta"):
            shutil.rmtree(self._p(name), ignore_errors=True)

    def _invalidate(self) -> None:
        """Drop the cached index after a write — unpersisting the old
        cached DataFrames so repeated database/embed/query cycles in a
        long-lived session don't leak executor memory."""
        if self._index is not None:
            vindex = getattr(self._index, "vindex", None)
            for df in (
                getattr(self, "_cached_chunks", None),
                self._index.vectors,
                self._index.postings,
                self._index.term_stats,
                getattr(vindex, "indexed", None),
            ):
                if df is not None:
                    try:
                        df.unpersist()
                    except Exception:
                        pass
        self._cached_chunks = None
        self._index = None

    def _build_index(self) -> HY.HybridIndex:
        if self._index is None:
            from customkb_spark.embedding import store as IS

            self._cached_chunks = self._read("chunks").cache()
            vectors = self._read("vectors")
            vpath = self._p("vindex")
            # reference lifecycle parity: load the persisted index tier
            # (<kb>.faiss analogue) instead of retraining; an IVF tier
            # absorbs appended vectors via FAISS-add-style incremental
            # assignment inside load_vector_index
            vindex = IS.load_vector_index(
                self.spark, vpath, vectors, source_dir=self._p("vectors")
            )
            postings, term_stats, corpus = self._persisted_bm25(self._cached_chunks)
            self._index = HY.HybridIndex.build(
                self._cached_chunks, vectors, cfg=self.cfg, vindex=vindex,
                postings=postings, term_stats=term_stats, corpus=corpus,
            )
            if vindex is None and self._index.vindex is not None:
                IS.save_vector_index(
                    self._index.vindex, vpath, source_dir=self._p("vectors")
                )
        return self._index

    def query(
        self,
        query_text: str,
        context_only: bool = True,
        fmt: str = "plain",
        categories: list[str] | None = None,
        log: bool = True,
        template: str = "default",
        model: str | None = None,
        role: str | None = None,
        temperature: float | None = None,
        max_tokens: int = 512,
        context_files: list[str] | None = None,
    ) -> str:
        """Full reference query lifecycle (SURVEY.md §3.3): hybrid
        search → context assembly → format → (stub) LLM answer.

        The answer knobs mirror the reference's query flags
        (customkb.py:230-262): ``template`` (-p), ``model`` (-m, via
        the alias registry + LiteLLM routing), ``role`` (-R system
        override), ``temperature`` (-t), ``max_tokens`` (-M), and
        ``context_files`` — extra driver-side files appended to the
        reference string before answering."""
        t0 = time.time()
        index = self._build_index()
        rerank_cache = None
        rerank_sink = None
        if self.cfg.enable_reranking:
            rerank_cache = (
                self._read("rerank_cache") if self._exists("rerank_cache") else None
            )

            def rerank_sink(entries: DataFrame) -> None:
                # materialize first: the entries plan embeds the scorer;
                # appending must not re-run it when ctx is also consumed
                rows = entries.localCheckpoint()
                if rows.limit(1).count():
                    rows.write.mode("append").parquet(self._p("rerank_cache"))

        ctx = HY.query(
            index,
            query_text,
            self.cfg,
            categories=categories,
            query_cache_path=self._p("query_emb_cache"),
            rerank_cache=rerank_cache,
            rerank_cache_sink=rerank_sink,
            # the formatter orders driver-side; the plan-side sort would
            # cost an extra exchange + AQE round per query (r8 #4)
            ordered=False,
        )
        # ONE action for everything downstream: the context rows are
        # ≤ k·(scope+1) by construction, so collecting them feeds the
        # formatter AND the log count without a checkpoint + count pair
        # of extra scheduler rounds (VERDICT r8 #4)
        with HY._no_aqe(self.spark):
            ctx_rows = ctx.select(
                *[c for c in ("sourcedoc", "doc_id") if c in ctx.columns],
                "sid",
                "text",
            ).collect()
        reference_string = format_references(ctx_rows, fmt)
        if log:
            try:
                log_query(
                    self.spark,
                    self._p("query_log"),
                    os.path.basename(self.kb_dir),
                    query_text,
                    time.time() - t0,
                    len(ctx_rows),
                )
            except Exception:
                pass  # logging must never fail the query
        if context_files:
            blocks = [reference_string]
            for path in context_files:
                with open(path, encoding="utf-8", errors="replace") as f:
                    blocks.append(f"[context file: {os.path.basename(path)}]\n{f.read()}")
            reference_string = "\n\n".join(blocks)
        if context_only:
            return reference_string
        provider = None
        if model and model != "none":
            from customkb_spark.plans.answer import get_llm

            provider = get_llm(model, temperature=temperature)
        return generate_answer(
            query_text,
            reference_string,
            template=template,
            provider=provider,
            role=role,
            max_tokens=max_tokens,
        )

    def query_batch(
        self,
        queries: DataFrame,
        context_only: bool = True,
        fmt: str = "plain",
    ) -> DataFrame:
        """Batch query surface: (qid, query_text) → per-query results,
        fully distributed (one corpus scan per ranker serves every
        query; formatting and answering never touch the driver).

        ``context_only=True`` → (qid, reference_string); else
        (qid, query_text, reference_string, answer) via the provider.
        The reference processes queries one at a time in an asyncio
        loop — this is the shape that replaces it at cluster scale.
        """
        index = self._build_index()
        if context_only:
            from customkb_spark.plans.formatters import format_references_batch

            ctx = HY.query_batch(index, queries, self.cfg)
            return format_references_batch(ctx, fmt)
        return HY.rag_batch(index, queries, self.cfg, fmt)

    # ------------------------------------------------------ ops surface
    def verify(self) -> dict:
        """verify-indexes equivalent: table row counts, pending work,
        and persisted-index FRESHNESS (the reference's verify-indexes
        checks index health, not just existence — a stale index is the
        failure mode users actually hit after re-ingests)."""
        out: dict = {}
        chunks = self._read("chunks") if self._exists("chunks") else None
        out["chunks"] = chunks.count() if chunks is not None else 0
        out["vectors"] = self._read("vectors").count() if self._exists("vectors") else 0
        if chunks is not None:
            pending = chunks.filter(F.length("embedtext") > 0)
            if self._exists("vectors"):
                pending = pending.join(
                    self._read("vectors").select("id"), "id", "left_anti"
                )
            # no vectors table yet ⇒ EVERY embeddable chunk is pending
            out["pending_embed"] = pending.count()
        # A7: schema-version aggregate over the migrations event log
        from customkb_spark.plans.migrations import get_current_schema_version

        out["schema_version"] = get_current_schema_version(self.spark, self.kb_dir)
        # BM25 index freshness: content fingerprint + language must match
        if self._exists("bm25_meta") and chunks is not None:
            from customkb_spark.embedding.store import content_fingerprint

            meta = self._read("bm25_meta").collect()[0]
            fresh = (
                getattr(meta, "chunks_fp", None)
                == content_fingerprint(chunks, "id", "originaltext")
                and getattr(meta, "language", "en") == self.cfg.language
            )
            out["bm25_index"] = "fresh" if fresh else "stale"
        else:
            out["bm25_index"] = "absent" if chunks is not None else "n/a"
        # vector index: the SAME fingerprint verdict the query path's
        # load_vector_index applies, so verify never disagrees with a
        # query ("appendable" = a query absorbs the new vectors
        # FAISS-add-style; a bare row-count compare would call in-place
        # re-embeds fresh and normal appends stale — both wrong)
        if self._exists("vindex") and self._exists("vectors"):
            from customkb_spark.embedding.store import index_freshness

            out["vector_index"] = index_freshness(
                self.spark, self._p("vindex"), self._read("vectors")
            )
        else:
            out["vector_index"] = "absent"
        # per-cache hit/miss counters this driver process has observed
        # (reference performance_analyzer.py:67-136's cache section)
        from customkb_spark.functions import cache_stats

        out["cache_stats"] = cache_stats.snapshot()
        return out
