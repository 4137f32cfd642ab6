"""Embedding cache as a keyed table + joins.

The reference keeps a two-tier JSON cache keyed by
f'{model}_{sha256(text)}' (embedding/cache.py:49-120,
embed_manager.py:72-119). The distributed equivalent is a
``embedding_cache(cache_key, vector)`` table:

    hits    = pending ⋈ cache            (left join, key pre-hashed)
    misses  = pending where vector IS NULL → provider call
    updated = cache ∪ new vectors        (append)

The cache join IS the reference's read-through semantics (J5); the
append is the write-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions.hashing import sha_cache_key


def with_cache_key(df: DataFrame, text_col: str, model: str) -> DataFrame:
    return df.withColumn("cache_key", sha_cache_key(model, text_col))


def split_hits_misses(
    pending: DataFrame, cache: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """pending must carry cache_key; cache is (cache_key, vector).

    Returns (hits with vector, misses without). One left join, reused
    for both sides — Catalyst caches the common subplan per action.
    """
    joined = pending.join(cache, "cache_key", "left")
    hits = joined.filter(F.col("vector").isNotNull())
    misses = joined.filter(F.col("vector").isNull()).drop("vector")
    return hits, misses
