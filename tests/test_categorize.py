"""Categorize surface: counts, complexity bounds, fuzzy merge, import join."""

from pyspark.sql import functions as F

from customkb_spark.operators import categorize as C


def test_category_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "primary_category"]
    )
    out = {r["category"]: r["n_docs"] for r in C.category_counts(docs).collect()}
    assert out == {"a": 2, "b": 1}


def test_complexity_score_bounds(spark, documents):
    out = documents.select(C.complexity_score(F.col("text")).alias("c")).collect()
    assert all(3 <= r["c"] <= 7 for r in out)


def test_fuzzy_pairs_and_merge(spark):
    cats = spark.createDataFrame(
        [("machine learning",), ("machine learnin",), ("databases",)], ["category"]
    )
    pairs = C.fuzzy_category_pairs(cats, threshold=0.85).collect()
    assert [(p["cat_a"], p["cat_b"]) for p in pairs] == [
        ("machine learnin", "machine learning")
    ]
    merged = {
        r["category"]: r["canonical"]
        for r in C.merge_categories(
            cats, C.fuzzy_category_pairs(cats, threshold=0.85)
        ).collect()
    }
    assert merged["machine learning"] == "machine learnin"
    assert merged["databases"] == "databases"


def test_fuzzy_pairs_length_guard_prunes(spark):
    cats = spark.createDataFrame([("ab",), ("abcdefghij",)], ["category"])
    assert C.fuzzy_category_pairs(cats, threshold=0.85).count() == 0


def test_import_categories_basename_match(spark):
    chunks = spark.createDataFrame(
        [(1, "/data/docs/file1.txt"), (2, "/data/docs/file2.txt")],
        ["id", "sourcedoc"],
    )
    assignments = spark.createDataFrame(
        [("file1.txt", "tech", ["tech", "ai"])],
        ["filename", "primary_category", "categories"],
    )
    out = {r["id"]: r for r in C.import_categories(chunks, assignments).collect()}
    assert out[1]["primary_category"] == "tech" and out[1]["categories"] == ["tech", "ai"]
    assert out[2]["primary_category"] is None


def test_categorize_documents_stub(spark, documents):
    from customkb_spark.ingest.pipeline import documents_to_chunks

    chunks = documents_to_chunks(documents.limit(10), chunk_size=100)
    out = C.categorize_documents(
        chunks, doc_col="sourcedoc", sid_col="sid", text_col="originaltext"
    )
    rows = out.collect()
    assert len(rows) == chunks.select("sourcedoc").distinct().count()
    for r in rows:
        assert r["primary_category"] == r["categories"][0]
        assert 1 <= len(r["categories"]) <= 7
    # deterministic across runs
    again = {r["sourcedoc"]: r["categories"] for r in out.collect()}
    assert all(again[r["sourcedoc"]] == r["categories"] for r in rows)


def test_random_sample_seeded(spark, documents):
    from customkb_spark.operators.windows import random_sample

    a = [r["doc_id"] for r in random_sample(documents, 5, seed=7, order_col="doc_id").collect()]
    b = [r["doc_id"] for r in random_sample(documents, 5, seed=7, order_col="doc_id").collect()]
    assert a == b and len(a) == 5
