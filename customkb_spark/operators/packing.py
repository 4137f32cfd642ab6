"""Training-batch preparation — sequence packing and dataset splits.

The last mile of a training-data pipeline: after curation/dedup the
corpus must become (a) fixed-length token sequences for the trainer
(GPT-style "concatenate documents, split every ``seq_len`` tokens")
and (b) reproducible train/validation/test partitions. Neither exists
in the reference (it is a retrieval engine, not a trainer), but both
are required to feed the curated corpus into a training job, so they
are first-class here alongside the curation suite.

Scale notes (100 TB):
- Packing is computed PER SHARD (``shard_col``): the running-offset
  window partitions by shard, so parallelism = number of shards, and
  no global single-partition window ever exists. Real pipelines pack
  per input shard/file anyway (packing order across shards is
  immaterial to training — shards are shuffled at load time). For a
  corpus with few logical shards, re-shard first
  (``pmod(xxhash64(id), n)``) — any deterministic assignment works
  because only WITHIN-shard order matters.
- Split assignment is a pure per-row expression (md5 threshold — the
  same engine-portable uniform draw as ``curation.stratified_sample``):
  zero shuffles, retry-safe, and stable under corpus growth (a doc's
  split never changes when other docs are added or removed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import text as X
from customkb_spark.operators.curation import hash_bucket_hex, rate_threshold_hex


def pack_segments(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = "source",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Map each document onto the fixed-length training sequences it
    occupies — concat-and-chunk packing (the GPT / T5 pretraining
    layout: concatenate all documents in shard order, cut every
    ``seq_len`` tokens; boundary documents straddle two packs).

    Per shard, documents are laid out in ``id_col`` order; a running
    token offset (window SUM) gives each doc a half-open token span
    ``[start, start + n)``, which is then exploded onto the packs it
    overlaps: pack ``p`` covers tokens ``[p*seq_len, (p+1)*seq_len)``.

    Returns one row per (document, pack) overlap::

        shard_col, id_col, n_tokens, pack_id, seg_tokens

    where ``seg_tokens`` is how many of the doc's tokens land in that
    pack (sums to ``n_tokens`` over the doc's rows). Zero-token
    documents are dropped (they occupy no sequence).

    Token counts default to ``size(tokens(text))``; pass
    ``n_tokens_col`` to pack by a precomputed (e.g. tiktoken) count.

    Plan shape: one scan → window SUM partitioned by shard →
    ``explode(sequence(first_pack, last_pack))``. The explode fan-out
    per doc is ``ceil(n/seq_len)+1`` at most — bounded by document
    length, never by corpus size.

    ``shard_col=None`` packs the WHOLE corpus as one global stream
    (ids must be numeric): the running offset then comes from
    :func:`customkb_spark.operators.windows.running_total` — the
    two-phase bucketed prefix sum — so no single-partition window
    exists even without shards. Global-mode output carries a constant
    ``shard`` column (value ``"all"``); pass ``shard_col="shard"`` to
    :func:`pack_summary` when rolling it up.
    """
    n: Column = (
        F.col(n_tokens_col)
        if n_tokens_col
        else F.size(X.tokens(text_col))
    ).cast("long")
    from pyspark.sql import Window

    L = F.lit(int(seq_len)).cast("long")
    if shard_col is None:
        from customkb_spark.operators.windows import running_total

        shard_col = "shard"
        laid = (
            df.select(F.lit("all").alias(shard_col), F.col(id_col), n.alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
        )
        laid = running_total(laid, id_col, "n_tokens", out_col="_end")
        laid = laid.withColumn("_start", F.col("_end") - F.col("n_tokens"))
    else:
        w = (
            Window.partitionBy(shard_col)
            .orderBy(id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        laid = (
            df.select(F.col(shard_col), F.col(id_col), n.alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
            .withColumn("_end", F.sum("n_tokens").over(w))
            .withColumn("_start", F.col("_end") - F.col("n_tokens"))
        )
    return _explode_segments(laid, shard_col, id_col, L)


def _explode_segments(
    laid: DataFrame, shard_col: str, id_col: str, L: Column
) -> DataFrame:
    """(shard, id, n_tokens, _start, _end) → one row per overlapped
    pack, with the token count landing in that pack."""
    seg = laid.select(
        shard_col,
        id_col,
        "n_tokens",
        F.explode(
            F.sequence(
                (F.col("_start") / L).cast("long"),
                ((F.col("_end") - 1) / L).cast("long"),
            )
        ).alias("pack_id"),
        "_start",
        "_end",
    )
    seg_tokens = F.least(F.col("_end"), (F.col("pack_id") + 1) * L) - F.greatest(
        F.col("_start"), F.col("pack_id") * L
    )
    return seg.select(
        shard_col,
        id_col,
        "n_tokens",
        F.col("pack_id").cast("long").alias("pack_id"),
        seg_tokens.cast("long").alias("seg_tokens"),
    )


def pack_summary(segments: DataFrame, shard_col: str = "source") -> DataFrame:
    """Per-pack roll-up of :func:`pack_segments` — the table a trainer's
    data loader indexes: ``shard, pack_id, n_docs (documents
    contributing), pack_tokens (≤ seq_len; only each shard's final pack
    is ragged)``. One partial-aggregated shuffle on (shard, pack_id) —
    the same key the window already partitioned by, so AQE coalesces
    without a second wide exchange."""
    return segments.groupBy(shard_col, "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("seg_tokens").cast("long").alias("pack_tokens"),
    )


def pack_append(
    existing_summary: DataFrame,
    new_docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Incremental packing: lay NEW documents out after an existing
    pack layout without touching it — the packing twin of the repo's
    incremental ingest/index maintenance (append-only corpora must not
    re-pack 100 TB to add a day's crawl).

    ``existing_summary`` is a prior :func:`pack_summary` result; each
    shard's token total (= ``sum(pack_tokens)``) becomes the base
    offset, so the first new document continues filling the shard's
    ragged final pack exactly where a full re-pack would. Shards absent
    from the summary start at offset 0. Produces segments for the new
    documents only, same schema as :func:`pack_segments`.

    Equivalence contract (tested): if every new id sorts after the
    shard's existing ids, ``pack_segments(old) ∪ pack_append(summary,
    new)`` equals ``pack_segments(old ∪ new)`` row-for-row. The base
    table is one tiny aggregate (≤ shards rows) broadcast onto the new
    batch — incremental cost scales with the batch, not the corpus.
    """
    n: Column = (
        F.col(n_tokens_col)
        if n_tokens_col
        else F.size(X.tokens(text_col))
    ).cast("long")
    from pyspark.sql import Window

    base = existing_summary.groupBy(shard_col).agg(
        F.sum("pack_tokens").cast("long").alias("_base")
    )
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    L = F.lit(int(seq_len)).cast("long")
    laid = (
        new_docs.select(F.col(shard_col), F.col(id_col), n.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .join(F.broadcast(base), shard_col, "left")
        .withColumn("_base", F.coalesce("_base", F.lit(0)))
        .withColumn("_end", F.sum("n_tokens").over(w) + F.col("_base"))
        .withColumn("_start", F.col("_end") - F.col("n_tokens"))
    )
    return _explode_segments(laid, shard_col, id_col, L)


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
) -> DataFrame:
    """Deterministic train/validation/test assignment — the standard
    hash-split: ``u = md5(key:seed)`` mapped through the cumulative
    split weights. Properties a training pipeline needs and random
    splits lack:

    - stable: a document's split depends only on its key — ingesting
      more data, repartitioning, or task retries never move it;
    - leakage-safe across engines: the same md5 rule reproduces the
      split anywhere (the DuckDB oracle evaluates it verbatim);
    - zero-shuffle: a pure column expression on the scan.

    ``weights`` maps split name → fraction (default 98/1/1). Comparison
    happens on the 8-hex-char prefix against precomputed hex
    thresholds (integer-free, float-free — same trick as
    ``curation.stratified_sample``), so no engine disagrees at the
    boundary. Returns ``df`` plus a ``split`` column.
    """
    weights = weights or {"train": 0.98, "validation": 0.01, "test": 0.01}
    total = sum(weights.values())
    if not weights or abs(total - 1.0) > 1e-9:
        # silent misallocation trap: the last split is the residual of
        # the others, so weights summing to != 1 would hand it
        # 1 - sum(first n-1) regardless of its stated fraction
        raise ValueError(f"split weights must sum to 1.0, got {total} ({weights})")
    hex8 = hash_bucket_hex(F.col(key_col), seed)
    cum = 0.0
    expr: Column | None = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = hex8 < F.lit(rate_threshold_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", out)
