"""Context range join (J2) — expand each hit to its ±scope window of
neighboring chunks within the same source document.

Reference behavior (query/search.py:37-58,567-606): for a hit at
(sourcedoc, sid) fetch rows WHERE sourcedoc = ? AND sid BETWEEN
max(0, sid−scope/2) AND sid+scope/2, ordered by sid; hits with
similarity below `similarity_threshold` get their window shrunk by
`low_similarity_scope_factor` (search.py:562-565).

Spark shape: equi-join on sourcedoc + non-equi BETWEEN on sid. The hit
side is a top-k set (tiny) → broadcast, so the chunks table is scanned
once with the sourcedoc filter pushed down; no shuffle of the corpus.
A chunks table clustered by (sourcedoc, sid) additionally prunes row
groups — the Spark analogue of the reference's covering index
(database/index_manager.py:161).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def context_range(
    hits: DataFrame,
    scope: int = 4,
    similarity_threshold: float = 0.6,
    low_sim_factor: float = 0.5,
    sim_col: str | None = "score",
) -> DataFrame:
    """Annotate hits with [lo, hi] context bounds (clamped at 0)."""
    half = scope // 2
    if sim_col is not None and sim_col in hits.columns:
        eff = F.when(
            F.col(sim_col) < similarity_threshold,
            F.greatest(F.ceil(F.lit(half) * low_sim_factor).cast("int"), F.lit(1)),
        ).otherwise(F.lit(half))
    else:
        eff = F.lit(half)
    return hits.withColumn("lo", F.greatest(F.col("sid") - eff, F.lit(0))).withColumn(
        "hi", F.col("sid") + eff
    )


def context_range_join(
    hits: DataFrame,
    chunks: DataFrame,
    scope: int = 4,
    similarity_threshold: float = 0.6,
    low_sim_factor: float = 0.5,
    text_col: str = "originaltext",
    key_cols: tuple[str, ...] = ("sourcedoc",),
) -> DataFrame:
    """Return the context rows for every hit.

    hits:   (*key_cols, sid[, score]) — a top-k set.
    chunks: the corpus table with (*key_cols, sid, ``text_col``).

    Output: (*key_cols, hit_sid, sid, text) ordered by key, hit, sid —
    duplicate context rows across overlapping hits are preserved, as in
    the reference's per-hit loop.

    ``key_cols`` is the identity the sid sequence is scoped to. In the
    reference one file is one document, so its (sourcedoc, sid) key is
    unambiguous; here sids restart per ingested DOCUMENT, so callers
    whose corpora can hold several documents under one source path must
    include the doc key — ("sourcedoc", "doc_id") — or a hit joins
    every same-sid-range chunk of every doc in the file (measured: 10
    hits → 85M context rows on a 100k-chunk corpus with ~100 distinct
    sources, and context text drawn from unrelated documents).
    """
    h = F.broadcast(
        context_range(
            hits, scope, similarity_threshold, low_sim_factor
        ).select(
            *[F.col(k).alias(f"h_{k}") for k in key_cols],
            F.col("sid").alias("hit_sid"),
            "lo",
            "hi",
        )
    )
    cond = chunks["sid"].between(h["lo"], h["hi"])
    for k in key_cols:
        cond = (chunks[k] == h[f"h_{k}"]) & cond
    joined = chunks.join(h, cond)
    return joined.select(
        *key_cols, "hit_sid", "sid", F.col(text_col).alias("text")
    ).orderBy(*key_cols, "hit_sid", "sid")
