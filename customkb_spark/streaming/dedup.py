"""Streaming deduplication + incremental BM25 index maintenance.

Streaming forms a training-data pipeline needs beyond batch dedup
(operators/dedup.py) — one gate per duplicate geometry: exact
(``streaming_exact_dedup`` standing-state / ``streaming_dedup_exact``
watermark-bounded), lexical near-dup
(``streaming_minhash_dedup``), semantic (``streaming_semantic_dedup``),
exact substrings (``streaming_substring_dedup``), normalized lines
(``streaming_line_dedup``), perceptual media
(``streaming_phash_dedup``):

- ``streaming_dedup_exact``: drop documents whose content hash was
  already seen, state-bounded by a watermark
  (``dropDuplicatesWithinWatermark`` — exact dedup that doesn't grow
  state forever; duplicates arriving after the lateness horizon are the
  documented trade for bounded state at 100 TB/day).

- ``incremental_bm25_stats``: keep the BM25 term_stats table fresh as
  documents stream in. Document frequency is an algebraic aggregate
  (df counts ADD across batches), so each micro-batch computes its own
  per-term df map-side and ``foreachBatch`` merges it into the stats
  table — the reference's rebuild-the-NPZ-file step
  (bm25_manager.py, SURVEY §2.1 S8) becomes a running merge instead of
  a periodic full rebuild. idf is derived at read time from (df, N) so
  the merge stays a pure sum.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from customkb_spark.functions import text as X
from customkb_spark.operators.dedup import content_hash

# ------------------------------------------------------------------
# Per-epoch commit ledger + id-partitioned finalized-docs state
# (VERDICT r8 "What's wrong #1": every gate used to open each
# micro-batch with a FULL finalized-docs column scan to detect
# replays — linear in accumulated corpus, invisible at bench scale,
# a billion-row scan per gate per micro-batch at 10^9 admitted docs.
# Two mechanisms make the probe cost flat in standing-state size:
#
# 1. COMMIT LEDGER — after a gate finishes an epoch's state appends it
#    writes a marker file under ``kept_dir/_epochs/`` keyed by
#    (checkpoint identity, epoch id). Structured Streaming re-delivers
#    an epoch (same checkpoint, same epoch id) only until the sink
#    confirms it, so a marker hit proves the whole epoch committed and
#    the handler returns before touching ANY state — replay detection
#    is one file probe, O(1) in corpus size. The marker is keyed by
#    checkpoint because epoch ids restart at 0 for every new
#    checkpoint dir: a fresh-checkpoint re-drain of old data (the
#    disaster-recovery path, exercised by the replay tests) must NOT
#    alias into an old epoch's marker, and instead falls through to
#    the pruned probes below, which remain exact.
#
# 2. dp PARTITION PRUNING — the finalized docs tables gain a ``dp``
#    partition column derived from the doc id (contiguous id ranges
#    share a partition: ``r<id div 2^16>``), so the membership probes a
#    marker MISS still needs (partial-commit repair, foreign-checkpoint
#    re-delivery, hand-repaired state) scan only the partitions the
#    batch's own ids can live in — cost tracks the BATCH's id locality,
#    not the standing corpus. This is the hashes tables' kp discipline
#    applied to the docs side. Non-integral id types fall back to an
#    md5-prefix key (uniform spread: prunes while the batch's distinct
#    prefixes stay under the partition count).
# ------------------------------------------------------------------

_DP_BUCKET_BITS = 16  # ids within one 65,536-wide range share a partition
_DP_PRUNE_CAP = 512  # above this many buckets a pruned probe ≈ full scan


def _ledger_path(kept_dir: str, checkpoint_dir: str, epoch_id: int) -> str:
    ck = hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]
    # underscore-prefixed so Spark's file listing ignores it when the
    # ledger lives INSIDE a parquet table dir (the semantic gate's
    # kept_path doubles as both)
    return os.path.join(kept_dir, "_epochs", f"{ck}_{int(epoch_id)}.commit")


def _epoch_committed(kept_dir: str, checkpoint_dir: str, epoch_id: int) -> bool:
    """O(1) pure-replay detection: one file-existence probe."""
    return os.path.exists(_ledger_path(kept_dir, checkpoint_dir, epoch_id))


def _commit_epoch(kept_dir: str, checkpoint_dir: str, epoch_id: int) -> None:
    """Write the epoch's commit marker — ALWAYS after the last state
    append (docs), so a crash anywhere mid-epoch leaves no marker and
    the replay takes the pruned-probe repair path."""
    p = _ledger_path(kept_dir, checkpoint_dir, epoch_id)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"checkpoint": os.path.abspath(checkpoint_dir),
                   "epoch": int(epoch_id)}, f)
    os.replace(tmp, p)  # atomic: a half-written marker never exists


def _doc_part_key(col: Column, dtype) -> Column:
    """The ``dp`` partition value for a doc id: range bucket for
    integral ids (arrival locality → few partitions per batch), md5
    prefix otherwise. Letter-prefixed so parquet partition-value type
    inference can never flip the column numeric (the kp lesson)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.concat(
            F.lit("r"),
            F.shiftright(col.cast("long"), _DP_BUCKET_BITS).cast("string"),
        )
    return F.concat(F.lit("h"), F.substring(F.md5(col.cast("string")), 1, 2))


def _batch_doc_parts(df: DataFrame, id_col: str) -> list | None:
    """Distinct ``dp`` values of a (checkpointed) batch — the pruning
    set for every finalized-docs probe this epoch. ``None`` disables
    pruning (pathological id spread where a pruned scan would not be
    cheaper, or a non-prunable legacy table)."""
    dtype = df.schema[id_col].dataType
    vals = [
        r["dp"]
        for r in df.select(
            _doc_part_key(F.col(id_col), dtype).alias("dp")
        ).distinct().limit(_DP_PRUNE_CAP + 1).collect()
    ]
    return None if len(vals) > _DP_PRUNE_CAP else vals


def _finalized_probe(batch: DataFrame, finalized: DataFrame, id_col: str) -> tuple[bool, bool]:
    """(done_any, all_done) for a batch vs the (pruned) finalized-docs
    ids — ONE left-join aggregation job instead of the former
    semi-probe + anti-probe pair (r9: two limit(1).count() jobs per
    gate per epoch collapsed into one; same information, the join is
    still against the dp-pruned read)."""
    row = (
        batch.select(id_col)
        .join(finalized.withColumn("_fin", F.lit(1)), id_col, "left")
        .agg(F.count(F.lit(1)).alias("_n"), F.count("_fin").alias("_nf"))
        .first()
    )
    return row["_nf"] > 0, row["_nf"] >= row["_n"]


def _read_docs_pruned(spark: SparkSession, doc_path: str, dps: list | None) -> DataFrame:
    """Finalized-docs read, partition-pruned to the batch's own id
    buckets. Tables written before the dp column existed (or
    hand-rewritten flat by state surgery) degrade to a full scan /
    plain filter — correct, just unpruned."""
    df = spark.read.parquet(doc_path)
    if dps is None or "dp" not in df.columns:
        return df
    return df.filter(F.col("dp").isin(dps))


def _flat_docs_layout(doc_path: str) -> bool:
    """True when the docs dir holds top-level parquet files (a
    hand-rewritten / pre-dp table). Appending partition dirs next to
    flat files would make the mixed dir unreadable, so appends match
    the layout they find."""
    try:
        names = os.listdir(doc_path)
    except FileNotFoundError:
        return False
    return any(n.endswith(".parquet") for n in names)


def _append_docs(df: DataFrame, doc_path: str) -> None:
    """Append finalized docs, partitioned by ``dp`` (flat when the
    existing table is flat — see ``_flat_docs_layout``)."""
    if _flat_docs_layout(doc_path):
        df.write.mode("append").parquet(doc_path)
    else:
        df.write.mode("append").partitionBy("dp").parquet(doc_path)


def streaming_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup: first occurrence of each whitespace-
    normalized content hash wins; state expires past the watermark.

    The bounded-state form: duplicates arriving after the lateness
    horizon are re-admitted (the documented trade at 100 TB/day).
    For the PERMANENT guarantee — dedup against everything ever
    processed, across drains and restarts — use the standing-state
    ``streaming_exact_dedup`` gate below (ADVICE r7: the pipeline's
    exact stage promised cross-invocation dedup but decayed with this
    operator's watermark)."""
    hashed = docs_stream.withColumn("_text_hash", content_hash(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_text_hash"])
        .drop("_text_hash")
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Exact-dedup admission gate with PERMANENT standing state — the
    line/substring gates' discipline applied to whole-document content
    hashes: a document is admitted iff its whitespace-normalized hash
    has never been seen in any prior micro-batch, drain, or process
    (state is a parquet table, not executor memory — no watermark
    expiry, restart-safe).

    Standing state under ``kept_dir``:
      - ``docs``:   the admitted documents (``id_col``, ``text_col``);
      - ``hashes``: (kp, thash, src_id) — one row per ADMITTED doc
        (rejected copies share their winner's hash), PARTITIONED BY
        ``kp`` (md5 prefix) so per-batch probes prune state files.

    Per micro-batch (foreachBatch), the substring/line gates' replay
    discipline: decisions run over the FULL epoch with state rows from
    this epoch's own ids excluded (a crash between the hash append and
    the docs append must not make the replay reject its own batch);
    only the docs WRITE is pruned to not-yet-finalized ids; hashes
    append FIRST (a doc present in docs but missing from hashes would
    silently stop deduping against it).

    Streaming == batch: with ids ascending in arrival order, admitted
    docs equal batch ``exact_duplicates``-keep-min-id on the
    concatenated corpus.
    """
    doc_path = os.path.join(kept_dir, "docs")
    hash_path = os.path.join(kept_dir, "hashes")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_dir, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        batch = (
            batch_df.select(F.col(id_col), F.col(text_col))
            .withColumn("_h", content_hash(F.col(text_col)))
            .localCheckpoint()
        )
        if not batch.limit(1).count():
            return
        dps = _batch_doc_parts(batch, id_col)
        done_any = False
        if os.path.isdir(doc_path):
            # marker miss with standing docs: partial-commit repair or
            # foreign-checkpoint re-delivery — membership probes pruned
            # to the batch's own id buckets (never a whole-table scan)
            finalized = _read_docs_pruned(spark, doc_path, dps).select(id_col)
            done_any, all_done = _finalized_probe(batch, finalized, id_col)
            if all_done:
                _commit_epoch(kept_dir, checkpoint_dir, epoch_id)
                return  # epoch fully finalized (pure replay)

        # batch-internal winner per hash: first arrival = min id
        from pyspark.sql import Window

        w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
        firsts = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if os.path.isdir(hash_path):
            kps = [
                r["kp"]
                for r in batch.select(
                    F.concat(F.lit("k"), F.substring("_h", 1, 2)).alias("kp")
                ).distinct().collect()
            ]
            state = spark.read.parquet(hash_path).filter(F.col("kp").isin(kps))
            seen = (
                state.join(
                    F.broadcast(batch.select(F.col("_h").alias("thash")).distinct()),
                    "thash",
                    "left_semi",
                )
                .join(
                    F.broadcast(batch.select(F.col(id_col).alias("src_id"))),
                    "src_id",
                    "left_anti",  # self-exclusion: replay of a partial commit
                )
                .select("thash")
                .distinct()
            )
            firsts = firsts.join(
                seen.select(F.col("thash").alias("_h")), "_h", "left_anti"
            )
        admitted = firsts.localCheckpoint()
        if not admitted.limit(1).count():
            _commit_epoch(kept_dir, checkpoint_dir, epoch_id)
            return
        # hashes FIRST (crash ordering — see docstring). kp carries a
        # letter prefix ('k3f') so partition-value type inference can
        # never flip the column to a numeric type when every written
        # prefix happens to be digits (ANSI cast error on the probe).
        admitted.select(
            F.concat(F.lit("k"), F.substring("_h", 1, 2)).alias("kp"),
            F.col("_h").alias("thash"),
            F.col(id_col).alias("src_id"),
        ).write.mode("append").partitionBy("kp").parquet(hash_path)
        out = admitted.drop("_h").withColumn(
            "dp", _doc_part_key(F.col(id_col), batch.schema[id_col].dataType)
        )
        if done_any:
            finalized = _read_docs_pruned(spark, doc_path, dps).select(id_col)
            out = out.join(finalized, id_col, "left_anti")
        _append_docs(out, doc_path)
        _commit_epoch(kept_dir, checkpoint_dir, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _probe_state(spark: SparkSession, path: str, kps: list) -> DataFrame:
    """Read a kp-partitioned standing table pruned to the probe's key
    prefixes, robust to partition-value TYPE INFERENCE: when every
    standing dir so far happens to be all-digits ('33', '07', …) Spark
    infers kp as a NUMBER, and a later probe containing a hex prefix
    like 'd7' would ANSI-cast-error the whole micro-batch (surfaced by
    the r8 exact-gate test with a single-partition state). A prefix
    that isn't numeric cannot exist in a numeric keyspace, so it is
    dropped from the probe rather than cast."""
    from pyspark.sql import types as T

    state = spark.read.parquet(path)
    if not isinstance(state.schema["kp"].dataType, T.StringType):
        vals = [int(k) for k in kps if str(k).lstrip("-").isdigit()]
        if not vals:
            return state.filter(F.lit(False))
        return state.filter(F.col("kp").isin(vals))
    return state.filter(F.col("kp").isin([str(k) for k in kps]))


def _merge_term_stats(spark: SparkSession, batch_stats: DataFrame, stats_path: str) -> None:
    """(term, df, n_docs) += batch — an idempotent-enough running merge:
    read current, add, overwrite. At warehouse scale this is a MERGE
    INTO on a lakehouse table; plain parquet needs the rewrite."""
    if os.path.isdir(stats_path):
        current = spark.read.parquet(stats_path)
        merged = (
            current.unionByName(batch_stats)
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("n_docs").alias("n_docs"))
        )
    else:
        merged = batch_stats
    merged.localCheckpoint().write.mode("overwrite").parquet(stats_path)


def incremental_bm25_stats(
    docs_stream: DataFrame,
    stats_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Maintain (term, df, n_docs) as documents stream in.

    Per micro-batch: tokenize (same F3 contract as the batch index),
    count per-term document frequency map-side, merge into the running
    table. ``n_docs`` rides along per row so N = sum is recoverable;
    ``read_term_stats`` derives idf exactly like the batch builder.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        toks = batch_df.select(
            F.col(id_col).alias("id"),
            X.bm25_token_set(text_col, ordered=False).alias("toks"),
        )
        n_batch = toks.count()
        if not n_batch:
            return
        batch_stats = (
            # explode_outer: plain explode re-evaluates the tokenizer
            # in an inferred not-empty filter (see bm25.build_postings)
            toks.select(F.explode_outer("toks").alias("term"))
            .filter(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .withColumn("n_docs", F.lit(0).cast("long"))
        )
        # one synthetic row carries the batch's document count so N
        # merges by the same sum as df
        n_row = spark.createDataFrame(
            [("__N__", 0, n_batch)], "term string, df long, n_docs long"
        )
        _merge_term_stats(spark, batch_stats.unionByName(n_row), stats_path)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_semantic_dedup(
    docs_stream: DataFrame,
    kept_path: str,
    checkpoint_dir: str,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> StreamingQuery:
    """Streaming SemDeDup admission: maintain a semantically-deduped
    corpus table as embedded documents stream in.

    Per micro-batch (foreachBatch):
    1. reject batch rows that semantically duplicate the standing kept
       table (``semdedup_incremental`` — frozen centroids, cell-scoped
       cosine, cost independent of corpus size beyond the landed cells);
    2. resolve batch-INTERNAL duplicate groups with ``semdedup_apply``
       (one survivor per group, paper keep policy);
    3. append survivors to ``kept_path`` behind an id anti-join, so an
       epoch replay after a crash re-admits nothing (the same
       idempotency discipline as incremental_pack_maintenance).

    Centroids are frozen for the stream's lifetime — the batch trainer
    owns retraining (embedding/store drift stats are the signal), after
    which the stream restarts on the new artifact.
    """
    from customkb_spark.operators.dedup import semdedup_apply, semdedup_incremental

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_path, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        if os.path.isdir(kept_path):
            kept = spark.read.parquet(kept_path)
        else:
            kept = spark.createDataFrame([], batch_df.schema)
        admitted = semdedup_incremental(
            batch_df, kept, centroids, id_col, vec_col, threshold
        )
        marks = semdedup_apply(admitted, centroids, id_col, vec_col, threshold)
        # carry the cell assignment into the kept table: later batches
        # reuse it (semdedup_incremental's cluster_id fast path) instead
        # of re-assigning the whole standing corpus per micro-batch, and
        # partitionBy(cluster_id) below lets those reads prune to the
        # landed cells
        keep_marks = marks.filter("kept").select(
            F.col("id").alias(id_col), "cluster_id"
        ).localCheckpoint()
        # epoch-replay idempotency anti-join, pruned to the batch's
        # LANDED CELLS: a re-delivered kept id maps to the same frozen
        # cell, so the cell-filtered kept scan is exact — never a
        # whole-table id scan (VERDICT r8 #1)
        cells = [
            r["cluster_id"]
            for r in keep_marks.select("cluster_id").distinct().collect()
        ]
        prior = (
            kept.filter(F.col("cluster_id").isin(cells))
            if "cluster_id" in kept.columns
            else kept
        ).select(id_col)
        survivors = (
            admitted.join(keep_marks, id_col)
            .join(prior, id_col, "left_anti")
            .localCheckpoint()
        )
        if survivors.limit(1).count():
            survivors.write.mode("append").partitionBy("cluster_id").parquet(
                kept_path
            )
        _commit_epoch(kept_path, checkpoint_dir, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_term_stats(spark: SparkSession, stats_path: str) -> tuple[DataFrame, int]:
    """(term, df, idf) + corpus size N from the maintained table —
    BM25's idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1), the same formula
    as the batch builder (operators/bm25.build_term_stats)."""
    raw = spark.read.parquet(stats_path)
    n = raw.filter(F.col("term") == "__N__").agg(F.sum("n_docs")).first()[0] or 0
    stats = raw.filter(F.col("term") != "__N__").select(
        "term",
        "df",
        F.round(
            F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
        ).alias("idf"),
    )
    return stats, int(n)


def streaming_minhash_dedup(
    docs_stream: DataFrame,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> StreamingQuery:
    """Streaming MinHash-LSH admission: maintain a near-dup-free corpus
    as documents stream in — the lexical third of the streaming dedup
    family (``streaming_dedup_exact`` = exact hashes,
    ``streaming_semantic_dedup`` = embedding space; this gate catches
    90%-overlap crawl re-fetches neither of those sees).

    Standing state under ``kept_dir``:
      - ``docs``:    (id, text) — admitted documents
      - ``buckets``: (id, band, band_key, kp) — their LSH buckets,
        written PARTITIONED BY ``kp`` (md5-prefix of the band key, 256
        values), so each micro-batch's candidate probe prunes the
        standing bucket scan to the ≤256 partitions its own keys land
        in — the same landed-cell discipline as the semantic gate's
        cluster-partitioned kept table. Candidate cost per batch is
        ∝ batch-bucket collisions, never standing-corpus size.

    Per micro-batch (foreachBatch):
    1. signatures + band buckets for the batch (map-side, zero
       shuffle — operators/dedup.minhash_signatures);
    2. probe the standing buckets (kp-pruned scan, batch side
       broadcastable) → (new, old) candidate pairs → EXACT shingle
       Jaccard verify against the standing docs → reject new docs with
       a kept near-dup (first-wins, like the other gates);
    3. resolve batch-INTERNAL near-dup groups with the batch operator +
       connected components, keeping each group's min-id member (the
       canonical keep-first representative);
    4. append survivors' docs and buckets behind an id anti-join so an
       epoch replay after a crash re-admits nothing.

    Greedy-vs-batch caveat (same as the semantic gate): admission
    evaluates against SURVIVORS only, so a chain A~B~C split across
    batches can keep {A, C} where batch dedup on the union keeps {A};
    tight duplicate clusters (the real-corpus case) agree — locked by
    the streaming==batch equivalence test.
    """
    from customkb_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        minhash_band_buckets,
        minhash_candidate_pairs,
        minhash_signatures,
    )

    doc_path = os.path.join(kept_dir, "docs")
    bucket_path = os.path.join(kept_dir, "buckets")

    def _buckets(df: DataFrame) -> DataFrame:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
        bb = minhash_band_buckets(sigs, num_hashes, bands)
        # ddp = the doc's dp bucket in the docs table, carried on every
        # bucket row so a candidate probe can partition-prune the kept
        # docs it needs for the Jaccard verify (no full-corpus text scan)
        return bb.withColumn(
            "kp", F.substring(F.md5("band_key"), 1, 2)
        ).withColumn(
            "ddp", _doc_part_key(F.col("id"), df.schema[id_col].dataType)
        )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_dir, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        batch = batch_df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        ).localCheckpoint()
        if not batch.limit(1).count():
            return
        dps = _batch_doc_parts(batch, "id")
        bb = _buckets(batch.select(F.col("id").alias(id_col), F.col("text").alias(text_col))).localCheckpoint()

        admitted = batch
        if os.path.isdir(bucket_path):
            # landed-partition pruning: only standing buckets under the
            # batch's own key prefixes are scanned (≤256 values)
            kps = [r["kp"] for r in bb.select("kp").distinct().collect()]
            standing = _probe_state(spark, bucket_path, kps)
            old_side = standing.select(
                "band", "band_key", F.col("id").alias("id_b"),
                *(["ddp"] if "ddp" in standing.columns else []),
            )
            cand = (
                bb.select("band", "band_key", F.col("id").alias("id_a"))
                .join(old_side, ["band", "band_key"])
                .drop("band", "band_key")
                .distinct()
                .localCheckpoint()  # reused 3×: ddp collect, verify, semi
            )
            # the candidates' kept texts live in the candidates' own dp
            # buckets — read only those partitions (bounded by bucket
            # collisions, not standing-corpus size)
            if "ddp" in cand.columns:
                cand_dps = [
                    r["ddp"] for r in cand.select("ddp").distinct().collect()
                ]
            else:
                cand_dps = None  # pre-ddp bucket state: unpruned fallback
            kept_docs = _read_docs_pruned(spark, doc_path, cand_dps).select(
                "id", "text"
            )
            # exact-Jaccard verify over (batch ∪ candidate kept) texts;
            # kept side pre-pruned to candidate ids (semi join)
            probe_docs = batch.unionByName(
                kept_docs.join(
                    cand.select(F.col("id_b").alias("id")).distinct(), "id", "left_semi"
                )
            )
            rejected = (
                jaccard_verify(
                    probe_docs.select(F.col("id").alias(id_col), F.col("text").alias(text_col)),
                    cand.select("id_a", "id_b"), id_col, text_col,
                    shingle_n, threshold,
                )
                .select(F.col("id_a").alias("id"))
                .distinct()
            )
            admitted = batch.join(rejected, "id", "left_anti")

        # batch-internal near-dup groups → keep the min-id member
        internal = admitted.select(
            F.col("id").alias(id_col), F.col("text").alias(text_col)
        )
        sigs_b = minhash_signatures(internal, id_col, text_col, num_hashes, shingle_n)
        pairs_b = minhash_candidate_pairs(minhash_band_buckets(sigs_b, num_hashes, bands))
        verified_b = jaccard_verify(internal, pairs_b, id_col, text_col, shingle_n, threshold)
        comps = connected_components(verified_b)
        losers = comps.filter(F.col("id") != F.col("cluster_id")).select("id")
        survivors = admitted.join(losers, "id", "left_anti")

        # epoch-replay idempotency: never re-append an already-kept id
        # (probe pruned to the batch's own id buckets — dps ⊇ survivors')
        if os.path.isdir(doc_path):
            survivors = survivors.join(
                _read_docs_pruned(spark, doc_path, dps).select("id"),
                "id", "left_anti",
            )
        survivors = survivors.localCheckpoint()
        if survivors.limit(1).count():
            # BUCKETS FIRST: the replay guard anti-joins on doc_path, so
            # a crash between the two appends must leave a state the
            # replay can repair. Buckets-then-docs: a crash after the
            # bucket append replays into duplicate bucket rows, which
            # the candidate generation's distinct() already absorbs.
            # Docs-then-buckets would be unrecoverable — the replay
            # would see the docs as kept, skip the append, and those
            # docs' buckets would be missing from the LSH probe forever
            # (their future near-dups silently admitted).
            # r9: the survivors' bucket rows are a subset of the
            # whole-batch `bb` already checkpointed above — filter it
            # instead of re-running tokenize+signatures over the
            # survivor texts (signatures are deterministic, so the
            # filtered rows are byte-identical to a recompute).
            (
                bb.join(survivors.select("id"), "id", "left_semi")
                .write.mode("append").partitionBy("kp").parquet(bucket_path)
            )
            _append_docs(
                survivors.withColumn(
                    "dp", _doc_part_key(F.col("id"), batch.schema["id"].dataType)
                ),
                doc_path,
            )
        _commit_epoch(kept_dir, checkpoint_dir, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_substring_dedup(
    docs_stream: DataFrame,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> StreamingQuery:
    """Streaming ExactSubstr admission (Lee et al. 2022): maintain a
    corpus whose duplicated >=k-token spans — against EVERYTHING
    processed before, across batches — are cut out, keeping the
    arrival-order first copy. The fourth streaming duplicate geometry
    (exact hashes / lexical MinHash / semantic embedding / exact
    substrings).

    Standing state under ``kept_dir``:
      - ``docs``:   (id, n_tokens, removed_tokens, text) — finalized
        cleaned documents (a doc's text never changes after its batch:
        the canonical first copy survives, exactly like the batch
        operator);
      - ``hashes``: (kp, whash, src_id) — every k-token window hash of
        every processed doc's ORIGINAL text (cut regions included: any
        earlier occurrence marks a later one, the batch rule), written
        PARTITIONED BY ``kp`` (md5-prefix, 256 values).

    Per micro-batch (foreachBatch):
    1. decisions run over the FULL epoch (skip only if every id is
       already finalized): pruning the input by finalized ids would
       let a replay after a PARTIAL docs commit treat this epoch's own
       hash rows as prior state and cut the not-yet-finalized owner's
       copy too — the duplicated run would then exist in no document.
       Replays recompute identical decisions from the same source
       files; only the docs WRITE is pruned;
    2. window-hash the batch (map-side) and probe the standing hashes:
       the batch's distinct hash set BROADCASTS, so the standing state
       is scanned map-side and never shuffles — per-batch join output
       is bounded by the batch's own window count. State rows whose
       ``src_id`` is in the current epoch are ignored (self-exclusion:
       half-written hash rows cannot poison the replay);
    3. mark duplicate occurrences: state hit -> every batch occurrence
       is a duplicate; otherwise the batch-internal rule (count > 1,
       corpus-order min survives). Gaps-and-islands merge + span cut
       reuse the batch operator's helpers;
    4. append HASHES FIRST, then cleaned docs. If any doc of the epoch
       is finalized, the hash append completed in the original run
       (docs start only after it returns), so it is not repeated; the
       docs append writes only the not-yet-finalized ids.

    Streaming == batch: when ids arrive in ascending order (the batch
    operator's corpus order), the final docs table equals
    ``exact_substring_dedup`` on the concatenated corpus — locked by
    the equivalence test. At 100 TB the per-batch cost is one map-side
    scan of the hash state + batch-sized work; the upgrade path is a
    lakehouse hash table with bloom-filter point lookups in place of
    the parquet scan.
    """
    from customkb_spark.operators.dedup import (
        _cut_spans,
        _first_occurrence_agg,
        _merge_dup_spans,
        _window_occurrences,
        _wkey_cols,
        whash_key_prefix,
    )

    doc_path = os.path.join(kept_dir, "docs")
    hash_path = os.path.join(kept_dir, "hashes")
    keys = _wkey_cols("rolling")  # flat (h1, h2) window-key columns

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_dir, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        # decisions ALWAYS run over the FULL micro-batch: pruning the
        # input by finalized ids would let a replay after a partial
        # docs commit (doc Y finalized, its same-epoch owner X not)
        # see this epoch's own hash rows as prior state and cut the
        # owner's copy too — the duplicated run would vanish from the
        # corpus entirely. Replays recompute the identical decisions
        # (same source files) and only the docs WRITE is pruned.
        batch = batch_df.select(F.col(id_col), F.col(text_col)).localCheckpoint()
        if not batch.limit(1).count():
            return
        dps = _batch_doc_parts(batch, id_col)
        done_any = False
        if os.path.isdir(doc_path):
            finalized = _read_docs_pruned(spark, doc_path, dps).select(id_col)
            done_any, all_done = _finalized_probe(batch, finalized, id_col)
            if all_done:
                _commit_epoch(kept_dir, checkpoint_dir, epoch_id)
                return  # epoch fully finalized

        occ = _window_occurrences(batch, id_col, text_col, k).localCheckpoint()
        batch_hashes = occ.select(*keys).distinct()

        if os.path.isdir(hash_path):
            kps = [r["kp"] for r in occ.select(
                whash_key_prefix().alias("kp")).distinct().collect()]
            state = spark.read.parquet(hash_path).filter(F.col("kp").isin(kps))
            seen = (
                state.join(F.broadcast(batch_hashes), keys, "left_semi")
                .join(
                    F.broadcast(batch.select(F.col(id_col).alias("src_id"))),
                    "src_id",
                    "left_anti",
                )
                .select(*keys)
                .distinct()
            )
        else:
            seen = spark.createDataFrame([], "h1 bigint, h2 bigint")

        agg, is_first = _first_occurrence_agg(occ, id_col, keys)
        dup = (
            occ.join(agg, keys)
            .join(
                F.broadcast(seen.withColumn("_seen", F.lit(True))), keys, "left"
            )
            .filter(
                F.coalesce("_seen", F.lit(False))
                | ((F.col("_n_occ") > 1) & ~is_first)
            )
            .select(id_col, "pos")
        )
        spans = _merge_dup_spans(dup, id_col, k)
        cleaned = _cut_spans(batch, spans, id_col, text_col).localCheckpoint()

        # HASHES FIRST (see docstring): original-text windows, one row
        # per (window-hash, contributing doc). If ANY doc of this epoch
        # is already finalized, the hash append fully committed in the
        # original run (docs only start after it returns) — re-appending
        # would duplicate state rows for nothing.
        if not done_any:
            (
                occ.select(
                    whash_key_prefix().alias("kp"),
                    *keys,
                    F.col(id_col).alias("src_id"),
                )
                .distinct()
                .write.mode("append")
                .partitionBy("kp")
                .parquet(hash_path)
            )
        to_write = cleaned
        if done_any:
            to_write = cleaned.join(
                _read_docs_pruned(spark, doc_path, dps).select(id_col),
                id_col, "left_anti",
            )
        _append_docs(
            to_write.withColumn(
                "dp", _doc_part_key(F.col(id_col), batch.schema[id_col].dataType)
            ),
            doc_path,
        )
        _commit_epoch(kept_dir, checkpoint_dir, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_line_dedup(
    docs_stream: DataFrame,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming CCNet line-level dedup (Wenzek et al. 2020 §3.1):
    maintain a corpus in which every normalized line appears exactly
    once — the arrival-order first copy survives, later copies are cut
    from their documents. The FIFTH streaming duplicate geometry
    (exact doc hashes / lexical MinHash / semantic embedding / exact
    substrings / normalized lines).

    Standing state under ``kept_dir``:
      - ``docs``:  the finalized cleaned documents, batch
        ``line_dedup``'s exact output schema (a doc's text never
        changes after its batch);
      - ``lines``: (kp, lhash, src_id) — every normalized-line hash of
        every processed doc's ORIGINAL lines (a line removed as a dup
        still hashes identically to its owner, so distinct hashes seen
        is sufficient state), PARTITIONED BY ``kp`` (md5 prefix).

    Per micro-batch (foreachBatch), the substring gate's discipline:
    1. decisions run over the FULL epoch (skip only when every id is
       finalized) and only the docs WRITE is pruned — see
       ``streaming_substring_dedup`` step 1 for the partial-commit
       replay argument;
    2. explode + normalize + hash map-side; probe the standing lines
       with the batch's distinct hash set BROADCAST (state scans
       map-side, kp-partition-pruned, never shuffles), ignoring state
       rows whose ``src_id`` is in the current epoch (self-exclusion);
    3. a line survives iff its normalized form is empty (never a
       candidate) or it is unseen in state AND the batch-internal
       minimum (id, pos) occurrence;
    4. append LINES FIRST, then the not-yet-finalized cleaned docs
       (same crash-ordering argument as the substring gate).

    Streaming == batch: with ids ascending in arrival order the docs
    table equals ``curation.line_dedup`` on the concatenated corpus —
    locked by the equivalence test.
    """
    from customkb_spark.operators.curation import ccnet_line_norm

    doc_path = os.path.join(kept_dir, "docs")
    line_path = os.path.join(kept_dir, "lines")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_dir, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        # full-epoch decisions + output-side prune — the same partial-
        # docs-commit replay argument as streaming_substring_dedup
        # step 1 (pruning the input would vanish a shared line from
        # the corpus when its same-epoch owner wasn't finalized yet)
        batch = batch_df.select(F.col(id_col), F.col(text_col)).localCheckpoint()
        if not batch.limit(1).count():
            return
        dps = _batch_doc_parts(batch, id_col)
        done_any = False
        if os.path.isdir(doc_path):
            finalized = _read_docs_pruned(spark, doc_path, dps).select(id_col)
            done_any, all_done = _finalized_probe(batch, finalized, id_col)
            if all_done:
                _commit_epoch(kept_dir, checkpoint_dir, epoch_id)
                return  # epoch fully finalized

        ex = (
            batch.select(
                F.col(id_col),
                F.posexplode(F.split(F.col(text_col), "\n")).alias(
                    "_pos", "_line"
                ),
            )
            .withColumn("_norm", ccnet_line_norm(F.col("_line")))
            .withColumn(
                "_h", F.when(F.length("_norm") > 0, F.md5(F.col("_norm")))
            )
            .drop("_norm")
            .localCheckpoint()
        )
        hashed = ex.filter(F.col("_h").isNotNull())
        batch_hashes = hashed.select(F.col("_h").alias("lhash")).distinct()

        if os.path.isdir(line_path):
            kps = [
                r["kp"]
                for r in hashed.select(
                    F.substring("_h", 1, 2).alias("kp")
                ).distinct().collect()
            ]
            state = _probe_state(spark, line_path, kps)
            seen = (
                state.join(F.broadcast(batch_hashes), "lhash", "left_semi")
                .join(
                    F.broadcast(batch.select(F.col(id_col).alias("src_id"))),
                    "src_id",
                    "left_anti",
                )
                .select("lhash")
                .distinct()
            )
        else:
            seen = spark.createDataFrame([], "lhash string")

        occ = F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))
        firsts = hashed.groupBy("_h").agg(F.min(occ).alias("_first"))
        kept = (
            ex.join(
                F.broadcast(
                    seen.select(F.col("lhash").alias("_h")).withColumn(
                        "_seen", F.lit(True)
                    )
                ),
                "_h",
                "left",
            )
            .join(firsts, "_h", "left")
            .filter(
                F.col("_h").isNull()
                | (~F.coalesce("_seen", F.lit(False)) & (occ == F.col("_first")))
            )
        )
        reasm = kept.groupBy(id_col).agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count("*").cast("long").alias("lines_kept"),
        )
        totals = batch.select(
            F.col(id_col),
            F.size(F.split(F.col(text_col), "\n")).cast("long").alias(
                "lines_total"
            ),
        )
        cleaned = (
            totals.join(reasm, id_col, "left")
            .select(
                id_col,
                F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                "lines_total",
                F.coalesce("lines_kept", F.lit(0)).cast("long").alias(
                    "lines_kept"
                ),
                (F.col("lines_total") - F.coalesce("lines_kept", F.lit(0)))
                .cast("long")
                .alias("lines_removed"),
                F.round(
                    (F.col("lines_total") - F.coalesce("lines_kept", F.lit(0)))
                    / F.greatest(F.col("lines_total"), F.lit(1)),
                    6,
                ).alias("dup_line_frac"),
            )
            .localCheckpoint()
        )

        # LINES FIRST (see docstring); skip when the epoch's line
        # append already committed (any finalized doc proves it), and
        # prune the docs write to the not-yet-finalized ids
        if not done_any:
            (
                hashed.select(
                    F.substring("_h", 1, 2).alias("kp"),
                    F.col("_h").alias("lhash"),
                    F.col(id_col).alias("src_id"),
                )
                .distinct()
                .write.mode("append")
                .partitionBy("kp")
                .parquet(line_path)
            )
        to_write = cleaned
        if done_any:
            to_write = cleaned.join(
                _read_docs_pruned(spark, doc_path, dps).select(id_col),
                id_col, "left_anti",
            )
        _append_docs(
            to_write.withColumn(
                "dp", _doc_part_key(F.col(id_col), batch.schema[id_col].dataType)
            ),
            doc_path,
        )
        _commit_epoch(kept_dir, checkpoint_dir, epoch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_phash_dedup(
    media_stream: DataFrame,
    kept_dir: str,
    checkpoint_dir: str,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
) -> StreamingQuery:
    """Streaming perceptual-hash admission — the SIXTH streaming
    duplicate geometry (exact hashes / lexical MinHash / semantic
    embedding / exact substrings / normalized lines / perceptual
    media): maintain a media corpus free of near-duplicate images as
    items stream in (crawl re-fetches, recompressions, thumbnails).

    Standing state under ``kept_dir``:
      - ``media``:   (id, phash) — admitted items. Payload bytes are
        hashed once in their arrival batch and NEVER stored in state:
        the Hamming verify runs on hashes, so state is 16 bytes/item
        regardless of media size;
      - ``buckets``: (id, band, band_key, kp) — pigeonhole bit bands,
        PARTITIONED BY ``kp`` (md5-prefix of the band key), so each
        batch's probe prunes the standing scan to its own landed
        partitions (the minhash gate's discipline).

    Per micro-batch (foreachBatch):
    1. pHash the batch (the one pass over payload bytes);
    2. probe standing buckets (kp-pruned) → (new, old) candidates →
       exact JVM Hamming verify against standing hashes → reject new
       items with a kept near-dup (first-wins);
    3. resolve batch-internal near-dup groups (``phash_pairs`` +
       connected components, min-id survivor);
    4. append BUCKETS FIRST, then media rows, behind an id anti-join —
       the minhash gate's crash-ordering argument verbatim (docs-first
       would finalize items whose bands never reach the probe state).

    Greedy-vs-batch caveat as the other admission gates: evaluation is
    against survivors only; tight clusters agree with batch dedup
    (equivalence-tested).
    """
    from customkb_spark.operators.dedup import connected_components
    from customkb_spark.operators.multimodal import (
        media_phash,
        phash_band_frame,
        phash_hamming,
        phash_pairs,
    )

    media_path = os.path.join(kept_dir, "media")
    bucket_path = os.path.join(kept_dir, "buckets")

    def _buckets(hashed: DataFrame) -> DataFrame:
        # ddp = the item's dp bucket in the media table (the minhash
        # gate's discipline) so the Hamming verify reads only the
        # candidates' own media partitions
        return phash_band_frame(hashed, max_hamming).withColumn(
            "kp", F.substring(F.md5("band_key"), 1, 2)
        ).withColumn(
            "ddp",
            _doc_part_key(F.col("id"), hashed.schema["media_id"].dataType),
        )

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if _epoch_committed(kept_dir, checkpoint_dir, epoch_id):
            return  # O(1) ledger hit: the whole epoch already committed
        hashed = (
            media_phash(
                batch_df.select(
                    F.col(id_col).alias("media_id"),
                    F.col(content_col).alias("content"),
                )
            )
            .localCheckpoint()
        )
        if not hashed.limit(1).count():
            return
        dps = _batch_doc_parts(hashed, "media_id")
        bb = _buckets(hashed).localCheckpoint()

        admitted = hashed
        if os.path.isdir(bucket_path):
            kps = [r["kp"] for r in bb.select("kp").distinct().collect()]
            standing = _probe_state(spark, bucket_path, kps)
            cand = (
                bb.select("band", "band_key", F.col("id").alias("id_a"))
                .join(
                    standing.select(
                        "band", "band_key", F.col("id").alias("id_b"),
                        *(["ddp"] if "ddp" in standing.columns else []),
                    ),
                    ["band", "band_key"],
                )
                .drop("band", "band_key")
                .distinct()
                .localCheckpoint()
            )
            if "ddp" in cand.columns:
                cand_dps = [
                    r["ddp"] for r in cand.select("ddp").distinct().collect()
                ]
            else:
                cand_dps = None  # pre-ddp bucket state: unpruned fallback
            kept = _read_docs_pruned(spark, media_path, cand_dps)
            rejected = (
                cand.select("id_a", "id_b").join(
                    hashed.select(
                        F.col("media_id").alias("id_a"),
                        F.col("phash").alias("_ha"),
                    ),
                    "id_a",
                )
                .join(
                    kept.select(
                        F.col("id").alias("id_b"), F.col("phash").alias("_hb")
                    ),
                    "id_b",
                )
                .filter(phash_hamming("_ha", "_hb") <= max_hamming)
                .select(F.col("id_a").alias("media_id"))
                .distinct()
            )
            admitted = hashed.join(rejected, "media_id", "left_anti")

        pairs_b = phash_pairs(admitted, max_hamming, max_bucket_size)
        comps = connected_components(pairs_b.select("id_a", "id_b"))
        losers = comps.filter(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias("media_id")
        )
        survivors = admitted.join(losers, "media_id", "left_anti").select(
            F.col("media_id").alias("id"), "phash"
        )
        if os.path.isdir(media_path):
            survivors = survivors.join(
                _read_docs_pruned(spark, media_path, dps).select("id"),
                "id", "left_anti",
            )
        survivors = survivors.localCheckpoint()
        if survivors.limit(1).count():
            # r9: survivors' bucket rows ⊂ the checkpointed whole-batch
            # bb — filter instead of recomputing the band frame
            (
                bb.join(survivors.select("id"), "id", "left_semi")
                .write.mode("append").partitionBy("kp").parquet(bucket_path)
            )
            _append_docs(
                survivors.withColumn(
                    "dp",
                    _doc_part_key(
                        F.col("id"), hashed.schema["media_id"].dataType
                    ),
                ),
                media_path,
            )
        _commit_epoch(kept_dir, checkpoint_dir, epoch_id)

    return (
        media_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
