"""Rerank score cache + query-embedding TTL cache (VERDICT r1 #5/#6;
reference rerank_manager.py:48-119, query/embedding.py:30-141)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from customkb_spark.embedding.query_cache import (
    probe_query_embedding,
    prune_expired,
    query_cache_key,
    save_query_embedding,
)
from customkb_spark.operators.rerank import (
    RERANK_CACHE_SCHEMA,
    rerank_hits_cached,
    rerank_pair_key,
)


# ------------------------------------------------- query-embedding TTL


def test_query_cache_roundtrip_and_ttl(spark, tmp_path):
    path = str(tmp_path / "qcache")
    assert probe_query_embedding(spark, path, "q", "m") is None  # no table yet
    save_query_embedding(spark, path, "q", "m", [1.0, 2.0], now=1000.0)
    got = probe_query_embedding(spark, path, "q", "m", ttl_days=7, now=2000.0)
    assert got == [1.0, 2.0]
    # different query / model miss
    assert probe_query_embedding(spark, path, "other", "m", now=2000.0) is None
    assert probe_query_embedding(spark, path, "q", "m2", now=2000.0) is None
    # expired entry ignored
    expired_now = 1000.0 + 7 * 86400 + 1
    assert probe_query_embedding(spark, path, "q", "m", ttl_days=7, now=expired_now) is None
    # freshest entry wins
    save_query_embedding(spark, path, "q", "m", [3.0, 4.0], now=5000.0)
    assert probe_query_embedding(spark, path, "q", "m", now=6000.0) == [3.0, 4.0]
    # prune keeps only unexpired: with a 1-day TTL at now=5000+86400-10,
    # the created_at=1000 row is expired, the 5000 row is not
    assert prune_expired(spark, path, ttl_days=1, now=5000.0 + 86400 - 10) == 1


def test_query_cache_key_scheme():
    import hashlib

    assert query_cache_key("hello", "mod") == f"mod_{hashlib.sha256(b'hello').hexdigest()}"


def test_hybrid_search_skips_provider_on_repeat(spark, tmp_path, monkeypatch):
    """Reference behavior: a repeated query within the TTL never calls
    the provider (query/embedding.py:76-114)."""
    from customkb_spark.config import KBConfig
    from customkb_spark.embedding import embedder as EMB
    from customkb_spark.plans import hybrid as HY

    chunks = spark.createDataFrame(
        [(i, i, 0, f"doc {i} spark text", f"doc {i} spark text") for i in range(5)],
        ["id", "sourcedoc", "sid", "originaltext", "embedtext"],
    )
    vecs = EMB.embed_texts(chunks, "id", "embedtext", "stub-hash-embed", 8)
    index = HY.HybridIndex.build(chunks, vecs)
    cfg = KBConfig(vector_dimensions=8, query_top_k=3)
    path = str(tmp_path / "qec")
    calls = []
    real_get_provider = HY.get_provider

    def counting_get_provider(model, dims):
        calls.append(model)
        return real_get_provider(model, dims)

    monkeypatch.setattr(HY, "get_provider", counting_get_provider)
    HY.hybrid_search(index, "spark doc", cfg=cfg, query_cache_path=path).collect()
    assert len(calls) == 1
    HY.hybrid_search(index, "spark doc", cfg=cfg, query_cache_path=path).collect()
    assert len(calls) == 1  # second run: cache hit, no provider call


# ---------------------------------------------------- rerank score cache


def _hits(spark):
    return spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7), (4, 0.6)], ["id", "score"]
    )


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark engine"),
            (2, "data table"),
            (3, "spark data window"),
            (4, "other text"),
        ],
        ["doc_id", "text"],
    )


def test_rerank_cached_matches_uncached(spark):
    from customkb_spark.operators.rerank import rerank_hits

    out, entries = rerank_hits_cached(
        _hits(spark), _docs(spark), "spark data", ["spark", "data"], None, rerank_top_k=3
    )
    plain = rerank_hits(
        _hits(spark), _docs(spark), ["spark", "data"], rerank_top_k=3
    )
    assert [tuple(r) for r in out.collect()] == [tuple(r) for r in plain.collect()]
    # one entry per scored head pair
    assert entries.count() == 3


def test_rerank_second_call_invokes_no_scorer(spark):
    """With every head pair cached, the scorer must see ZERO rows —
    proven with a scorer that throws on any evaluation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def bomb(texts: pd.Series) -> pd.Series:
        raise RuntimeError("scorer invoked despite full cache")

    def bomb_scorer(terms, text_col):
        return bomb(text_col)

    out1, entries = rerank_hits_cached(
        _hits(spark), _docs(spark), "spark data", ["spark", "data"], None, rerank_top_k=3
    )
    cache = spark.createDataFrame(
        [(r["pair_key"], r["rerank_score"]) for r in entries.collect()],
        RERANK_CACHE_SCHEMA,
    )
    out2, entries2 = rerank_hits_cached(
        _hits(spark),
        _docs(spark),
        "spark data",
        ["spark", "data"],
        cache,
        rerank_top_k=3,
        scorer=bomb_scorer,
    )
    assert [tuple(r) for r in out2.collect()] == [tuple(r) for r in out1.collect()]
    assert entries2.count() == 0


def test_rerank_pair_key_is_reference_scheme(spark):
    import hashlib

    row = (
        spark.range(1)
        .select(rerank_pair_key(F.lit("q"), F.lit("doc")).alias("k"))
        .first()
    )
    assert row["k"] == hashlib.md5(b"q|||doc").hexdigest()


def test_kb_query_populates_and_reuses_rerank_cache(spark, tmp_path):
    import os

    from customkb_spark.config import KBConfig
    from customkb_spark.kb import KnowledgeBase

    kb_dir = str(tmp_path / "kb")
    cfg = KBConfig(vector_dimensions=8, enable_reranking=True, query_top_k=5)
    kb = KnowledgeBase(spark, kb_dir, cfg)
    docs = spark.createDataFrame(
        [(i, f"spark data document number {i} " * 5, f"/src/{i}.txt") for i in range(6)],
        ["doc_id", "text", "source"],
    )
    kb.database(docs)
    kb.embed()
    out1 = kb.query("spark data", log=False)
    assert os.path.isdir(os.path.join(kb_dir, "rerank_cache"))
    n_entries = spark.read.parquet(os.path.join(kb_dir, "rerank_cache")).count()
    assert n_entries > 0
    out2 = kb.query("spark data", log=False)
    assert out1 == out2
    # second run added no new cache rows (all pairs were hits)
    assert (
        spark.read.parquet(os.path.join(kb_dir, "rerank_cache")).count() == n_entries
    )
    # and the query-embedding cache has exactly one row for the query
    assert os.path.isdir(os.path.join(kb_dir, "query_emb_cache"))
    assert spark.read.parquet(os.path.join(kb_dir, "query_emb_cache")).count() == 1


def test_enhance_query_cached(spark, tmp_path):
    from customkb_spark.functions.enhance import enhance_query, enhance_query_cached

    path = str(tmp_path / "enh")
    q = "runing  querys"
    want = enhance_query(q)
    got = enhance_query_cached(spark, path, q, now=1000.0)
    assert got == want
    # hit path returns the stored value without re-enhancing
    assert enhance_query_cached(spark, path, q, now=2000.0) == want
    assert spark.read.parquet(path).count() == 1
    # expired → recompute + second row appended
    assert enhance_query_cached(spark, path, q, ttl_days=1, now=1000.0 + 90000) == want
    assert spark.read.parquet(path).count() == 2


def test_cache_dim_mismatch_hits_become_misses(spark):
    """The cache key omits dimensions (reference parity) — stale-dim
    entries must re-embed, not re-serve, and a same-key stale+fresh
    pair must not fan out the probe join (code-review r4)."""
    from customkb_spark.embedding.cache import split_hits_misses

    pending = spark.createDataFrame(
        [(1, "k1"), (2, "k2")], "id long, cache_key string"
    )
    cache = spark.createDataFrame(
        [("k1", [1.0, 2.0]), ("k2", [1.0, 2.0, 3.0])],
        "cache_key string, vector array<float>",
    )
    hits, misses = split_hits_misses(pending, cache, expected_dims=2)
    assert [r.id for r in hits.collect()] == [1]
    assert [r.id for r in misses.collect()] == [2]
    # duplicate key (stale 3-dim + fresh 2-dim): one hit row, right dims
    cache2 = cache.union(
        spark.createDataFrame([("k2", [9.0, 9.0])], cache.schema)
    )
    hits2, misses2 = split_hits_misses(pending, cache2, expected_dims=2)
    assert misses2.count() == 0
    got = {r.id: list(r.vector) for r in hits2.collect()}
    assert len(got) == 2 and got[2] == [9.0, 9.0]
    # no-guard path unchanged (both rows hit regardless of dims)
    h0, m0 = split_hits_misses(pending, cache)
    assert h0.count() == 2 and m0.count() == 0


# ------------------------------------------------- hit/miss counters


def test_cache_counters_move_across_cached_requery(spark, tmp_path):
    """VERDICT r4 #9 (reference performance_analyzer.py:67-136): the
    per-cache hit/miss counters must move as each cache is probed —
    miss on the cold probe, hit on the re-query — for all three caches,
    and kb.verify() must surface the snapshot."""
    from customkb_spark.functions import cache_stats

    cache_stats.reset()

    # query-TTL cache: cold probe = miss, warm probe = hit
    qpath = str(tmp_path / "qc")
    assert probe_query_embedding(spark, qpath, "q", "m") is None
    save_query_embedding(spark, qpath, "q", "m", [1.0, 2.0])
    assert probe_query_embedding(spark, qpath, "q", "m") is not None
    snap = cache_stats.snapshot()
    assert snap["query_ttl"]["misses"] == 1 and snap["query_ttl"]["hits"] == 1
    assert snap["query_ttl"]["hit_rate"] == 0.5

    # rerank score cache: cold = 3 misses, warm = 3 hits
    s1: dict = {}
    _, entries = rerank_hits_cached(
        _hits(spark), _docs(spark), "spark data", ["spark", "data"], None,
        rerank_top_k=3, stats=s1,
    )
    assert s1 == {"hits": 0, "misses": 3}
    cache = spark.createDataFrame(
        [(r["pair_key"], r["rerank_score"]) for r in entries.collect()],
        RERANK_CACHE_SCHEMA,
    )
    s2: dict = {}
    rerank_hits_cached(
        _hits(spark), _docs(spark), "spark data", ["spark", "data"], cache,
        rerank_top_k=3, stats=s2,
    )
    assert s2 == {"hits": 3, "misses": 0}


def test_kb_embed_cache_counters_and_verify_surface(spark, tmp_path):
    """Embedding cache counters: first embed records all misses; after
    dropping the vectors table (cache intact) the re-embed records all
    hits. kb.verify() carries the snapshot."""
    import shutil

    from customkb_spark.functions import cache_stats
    from customkb_spark.kb import KnowledgeBase

    cache_stats.reset()
    kb = KnowledgeBase(spark, str(tmp_path / "kb"))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "s1"), (2, "delta epsilon zeta", "s2")],
        ["doc_id", "text", "source"],
    )
    kb.database(docs)
    n1 = kb.embed()
    snap = cache_stats.snapshot()
    assert snap["embedding"]["misses"] == n1 > 0
    assert snap["embedding"]["hits"] == 0

    shutil.rmtree(str(tmp_path / "kb" / "vectors"))  # lose the vectors, keep the cache
    n2 = kb.embed()
    assert n2 == n1
    snap = cache_stats.snapshot()
    assert snap["embedding"]["hits"] == n1  # second pass: all cache hits
    assert snap["embedding"]["misses"] == n1

    v = kb.verify()
    assert v["cache_stats"]["embedding"]["hits"] == n1
    assert 0.0 < v["cache_stats"]["embedding"]["hit_rate"] <= 1.0
