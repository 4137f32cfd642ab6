"""Query-embedding TTL cache — reference query/embedding.py:30-141.

The reference caches single-query embeddings as per-key JSON files with
a 7-day TTL (query_cache_ttl_days). The Spark equivalent is a small
keyed parquet table

    <kb_dir>/query_emb_cache/  (cache_key, embedding, created_at)

probed DRIVER-side before the provider call — a single-query embed is
inherently a driver operation (one vector), so the probe is a pushed
filter on the key column, not a join. Key scheme is the reference's
exactly: f'{model}_{sha256(query_text)}' (query/embedding.py:30-44).

The batch path doesn't use this table: batch query embedding goes
through the J5 emb_cache read-through join (embedding/cache.py), which
is the scale shape. This table exists for single-query LATENCY parity —
a repeated query skips the provider round-trip entirely.
"""

from __future__ import annotations

import hashlib
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

QUERY_CACHE_SCHEMA = "cache_key string, embedding array<double>, created_at double"


def query_cache_key(query_text: str, model: str) -> str:
    """f'{model}_{sha256(text)}' — reference query/embedding.py:30-44."""
    return f"{model}_{hashlib.sha256(query_text.encode()).hexdigest()}"


def probe_query_embedding(
    spark: SparkSession,
    path: str,
    query_text: str,
    model: str,
    ttl_days: float = 7,
    now: float | None = None,
) -> list[float] | None:
    """Freshest unexpired cached embedding for the query, or None.

    The key filter pushes down to the parquet scan; with the table
    written sorted/partitioned by key prefix this is a metadata-pruned
    point lookup even when the cache grows large. Expired rows are
    ignored (the reference deletes the file on expired read; here
    ``prune_expired`` does compaction separately, keeping reads
    read-only)."""
    import os

    if not os.path.isdir(path):
        from customkb_spark.functions import cache_stats

        cache_stats.record(cache_stats.QUERY_TTL_CACHE, misses=1)
        return None
    from customkb_spark.functions import cache_stats

    now = time.time() if now is None else now
    key = query_cache_key(query_text, model)
    rows = (
        spark.read.parquet(path)
        .filter(
            (F.col("cache_key") == key)
            & (F.col("created_at") > F.lit(now - ttl_days * 86400.0))
        )
        .orderBy(F.desc("created_at"))
        .limit(1)
        .collect()
    )
    cache_stats.record(
        cache_stats.QUERY_TTL_CACHE, hits=1 if rows else 0, misses=0 if rows else 1
    )
    return [float(x) for x in rows[0]["embedding"]] if rows else None


def save_query_embedding(
    spark: SparkSession,
    path: str,
    query_text: str,
    model: str,
    embedding: list[float],
    now: float | None = None,
) -> None:
    """Append-only write-back (reference save_query_embedding_to_cache,
    query/embedding.py:116-141)."""
    now = time.time() if now is None else now
    row = [(query_cache_key(query_text, model), [float(x) for x in embedding], float(now))]
    spark.createDataFrame(row, QUERY_CACHE_SCHEMA).write.mode("append").parquet(path)


def prune_expired(
    spark: SparkSession, path: str, ttl_days: float = 7, now: float | None = None
) -> int:
    """Compact the cache table down to unexpired rows (the reference
    removes expired files on read; a distributed cache prunes in one
    rewrite pass instead). Returns rows kept."""
    import os

    if not os.path.isdir(path):
        return 0
    now = time.time() if now is None else now
    fresh = (
        spark.read.parquet(path)
        .filter(F.col("created_at") > F.lit(now - ttl_days * 86400.0))
        .localCheckpoint()
    )
    n = fresh.count()
    fresh.write.mode("overwrite").parquet(path)
    return n
