"""Unit tests for the scalar expression library (reference invariants:
tokenization dedup, cleaning, hashing determinism)."""

from pyspark.sql import functions as F

from customkb_spark.functions import hashing as H
from customkb_spark.functions import text as X
from customkb_spark.functions import vector as V


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_tokens_lowercase_alnum(spark):
    df = spark.createDataFrame([("Hello, World! 42x",)], ["t"])
    assert df.select(X.tokens("t").alias("v")).collect()[0]["v"] == [
        "hello",
        "world",
        "42x",
    ]


def test_unique_tokens_dedup_sorted(spark):
    # BM25 tf ∈ {0,1}: dedup is load-bearing (text_utils.py:306-314)
    df = spark.createDataFrame([("b a b a c",)], ["t"])
    assert df.select(X.unique_tokens("t").alias("v")).collect()[0]["v"] == ["a", "b", "c"]


def test_clean_text_strips_html(spark):
    df = spark.createDataFrame([("<p>Hello <b>World</b></p>!!",)], ["t"])
    assert df.select(X.clean_text("t").alias("v")).collect()[0]["v"] == "hello world"


def test_normalize_query(spark):
    df = spark.createDataFrame([("“what??   is  this…’s”",)], ["t"])
    out = df.select(X.normalize_query("t").alias("v")).collect()[0]["v"]
    assert "  " not in out and "??" not in out


def test_quality_score_range(spark, documents):
    rows = documents.select(X.quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_lang_id_returns_known_codes(spark, documents):
    rows = documents.select(X.detect_language_heuristic("text").alias("l")).collect()
    assert {r["l"] for r in rows} <= {"en", "es", "de", "fr", "und"}


def test_shingles(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],)], ["toks"])
    out = df.select(H.shingles(F.col("toks"), 3).alias("v")).collect()[0]["v"]
    assert out == ["a b c", "b c d"]


def test_shingles_short_doc_fallback(spark):
    df = spark.createDataFrame([(["a", "b"],)], ["toks"])
    out = df.select(H.shingles(F.col("toks"), 3).alias("v")).collect()[0]["v"]
    assert out == ["a b"]


def test_sha_cache_key_format(spark):
    df = spark.createDataFrame([("hello",)], ["t"])
    v = df.select(H.sha_cache_key("m1", F.col("t")).alias("v")).collect()[0]["v"]
    assert v.startswith("m1_") and len(v) == 3 + 64


def test_cosine_identity(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0],)], ["v"])
    out = df.select(F.round(V.cosine(F.col("v"), F.col("v")), 9).alias("c")).collect()
    assert out[0]["c"] == 1.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    out = df.select(V.l2_normalize(F.col("v")).alias("n")).collect()[0]["n"]
    assert abs(out[0] - 0.6) < 1e-9 and abs(out[1] - 0.8) < 1e-9


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame([("ab cdefghij",)], ["t"])
    # ab → 1 piece, cdefghij (8 chars) → 2 pieces
    assert df.select(X.token_count_bpe_ish("t").alias("v")).collect()[0]["v"] == 3


def test_readability_scores(spark):
    from customkb_spark.functions import text as X

    rows = [
        (1, "The cat sat. The dog ran. It was fun."),          # simple prose
        (2, "Notwithstanding institutional heterogeneity, organizational "
            "epistemologies necessitate multidimensional reconceptualization."),
        (3, ""),                                                # empty: deterministic, not NULL
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    sig = X.readability_scores("text")
    out = {
        r.doc_id: (r.ease, r.grade)
        for r in df.select(
            "doc_id", sig["flesch_ease"].alias("ease"), sig["fk_grade"].alias("grade")
        ).collect()
    }
    # simple text reads easier (higher ease, lower grade) than jargon
    assert out[1][0] > out[2][0]
    assert out[1][1] < out[2][1]
    assert out[3][0] is not None and out[3][1] is not None


def test_mean_pool_matches_numpy(spark, embeddings):
    import numpy as np

    from customkb_spark.functions.vector import mean_pool

    pooled = {
        r.label: (r.n_members, np.array(r.embedding))
        for r in mean_pool(embeddings, "label", "embedding").collect()
    }
    rows = embeddings.select("label", "embedding").collect()
    import collections

    by_label = collections.defaultdict(list)
    for r in rows:
        by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
    for label, vecs in by_label.items():
        n, got = pooled[label]
        assert n == len(vecs)
        assert np.allclose(got, np.mean(vecs, axis=0), atol=1e-5)


def test_readability_ignores_decimal_points(spark):
    from customkb_spark.functions import text as X

    df = spark.createDataFrame(
        [(1, "Use version 3.14 from www.example.com today."),
         (2, "Use version x from y today.")],
        "doc_id: long, text: string",
    )
    sig = X.readability_scores("text")
    rows = {r.doc_id: r.ease for r in df.select("doc_id", sig["flesch_ease"].alias("ease")).collect()}
    # one sentence either way: dotted tokens must not inflate the count
    one = spark.createDataFrame([(1, "Use version 3.14 from www.example.com today.")], "doc_id: long, text: string")
    ns = one.select(
        __import__("pyspark.sql.functions", fromlist=["F"]).size(
            __import__("pyspark.sql.functions", fromlist=["F"]).regexp_extract_all(
                __import__("pyspark.sql.functions", fromlist=["F"]).col("text"),
                __import__("pyspark.sql.functions", fromlist=["F"]).lit(r"[.!?]+(\s+|$)"), 0)
        ).alias("ns")
    ).collect()[0].ns
    assert ns == 1


def test_mean_pool_empty_and_null(spark):
    from pyspark.sql import types as T

    from customkb_spark.functions.vector import mean_pool

    schema = T.StructType([
        T.StructField("g", T.LongType()),
        T.StructField("v", T.ArrayType(T.FloatType())),
    ])
    import pytest

    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="dims"):
        mean_pool(empty, "g", "v")
    assert mean_pool(empty, "g", "v", dims=2).count() == 0
    mixed = spark.createDataFrame([(1, None), (1, [2.0, 4.0])], schema)
    row = mean_pool(mixed, "g", "v").collect()[0]
    # NULL vector dropped: count matches the mean's denominator
    assert row.n_members == 1 and list(row.v) == [2.0, 4.0]


def test_py_norm_bit_exact(spark):
    # r9 pre-normed cosine: a driver-folded query norm (py_norm) must
    # equal the Column fold BIT-exactly (same IEEE summation order) —
    # no rounding in this assertion on purpose
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-3, 3) for _ in range(17)] for _ in range(50)]
    df = spark.createDataFrame([(v,) for v in vecs], "a array<double>")
    out = df.select(V.norm(F.col("a")).alias("n")).collect()
    for r, v in zip(out, vecs):
        assert r["n"] == V.py_norm(v)


def test_prenormed_cosine_bit_exact(spark):
    # the factored form dot/(norm_a_attr * norm_b_attr) — used by every
    # scoring join since r9 — must reproduce the inline cosine fold
    # BIT-exactly (same arithmetic DAG, norms merely bound to columns)
    import random

    rng = random.Random(11)
    rows = [
        ([rng.uniform(-3, 3) for _ in range(17)],
         [rng.uniform(-3, 3) for _ in range(17)])
        for _ in range(50)
    ] + [(None, [0.0] * 17)]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    bound = df.withColumn("_na", V.norm(F.col("a"))).withColumn(
        "_nb", V.norm(F.col("b"))
    )
    out = bound.select(
        V.cosine(F.col("a"), F.col("b")).alias("c0"),
        (V.dot(F.col("a"), F.col("b")) / (F.col("_na") * F.col("_nb"))).alias("c1"),
    ).collect()
    for r in out:
        assert r["c0"] == r["c1"]


def test_l2_normalized_frame_bit_exact(spark):
    # the bulk normalizer (norm bound to an attribute before the scale
    # step) must equal the Column form element-for-element, including
    # NULL propagation and the zero-vector passthrough
    import random

    rng = random.Random(13)
    rows = [([rng.uniform(-3, 3) for _ in range(9)],) for _ in range(30)]
    rows += [(None,), ([0.0] * 9,)]
    df = spark.createDataFrame(rows, "v array<float>").withColumn(
        "i", F.monotonically_increasing_id()
    )
    a = df.select("i", V.l2_normalize(F.col("v")).alias("x"))
    b = V.l2_normalized_frame(df, "v")
    rows_a = {r["i"]: r["x"] for r in a.collect()}
    rows_b = {r["i"]: r["v"] for r in b.collect()}
    assert rows_a == rows_b
