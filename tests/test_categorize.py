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


def test_load_or_generate_categories_persists_yaml(spark, tmp_path):
    import yaml

    from customkb_spark.operators.categorize import load_or_generate_categories

    chunks = spark.createDataFrame(
        [(f"/d/{i}.md", s, f"spark data engine document {i} chunk {s} " * 3)
         for i in range(4) for s in range(3)],
        ["sourcedoc", "sid", "originaltext"],
    )
    kb_dir = str(tmp_path / "kb")
    cats = load_or_generate_categories(spark, kb_dir, chunks, kb_name="t")
    assert cats and cats == sorted(cats)
    # the reference's YAML shape on disk
    with open(f"{kb_dir}/cats/categories.yaml") as f:
        data = yaml.safe_load(f)
    assert data["categories"] == cats and data["kb_name"] == "t"
    assert "generated_at" in data
    # second call loads the file, no regeneration (chunks not needed)
    assert load_or_generate_categories(spark, kb_dir, None) == cats


def test_categorize_with_resume_skips_done(spark, tmp_path):
    from customkb_spark.operators.categorize import categorize_with_resume

    chunks = spark.createDataFrame(
        [(f"/d/{i}.md", s, f"spark data engine document {i} chunk {s} " * 3)
         for i in range(7) for s in range(3)],
        ["sourcedoc", "sid", "originaltext"],
    )
    path = str(tmp_path / "assignments")
    # batch of 3 over 7 docs: 3 appends, all docs covered
    n1 = categorize_with_resume(chunks, path, batch_docs=3)
    assert n1 == 7
    table = spark.read.parquet(path)
    assert table.count() == 7
    assert table.select("sourcedoc").distinct().count() == 7
    assert table.filter(F.col("primary_category").isNull()).count() == 0
    # re-run: everything already assigned -> zero new work, no dup rows
    n2 = categorize_with_resume(chunks, path, batch_docs=3)
    assert n2 == 0
    assert spark.read.parquet(path).count() == 7
    # partial resume: two extra docs appear -> only they are processed
    more = spark.createDataFrame(
        [(f"/d/new{i}.md", 0, f"fresh document {i} text " * 4) for i in range(2)],
        ["sourcedoc", "sid", "originaltext"],
    )
    n3 = categorize_with_resume(chunks.unionByName(more), path, batch_docs=3)
    assert n3 == 2
    assert spark.read.parquet(path).count() == 9


def test_normalize_category_reference_parity():
    from customkb_spark.operators.categorize import normalize_category

    assert normalize_category("Machine Learning") == "machine learning"
    assert normalize_category("MACHINE LEARNING") == "machine learning"
    assert normalize_category("Machine Learning", case_sensitive=True) == "Machine Learning"
    assert normalize_category("Machine Learning and AI") == "machine learning ai"
    assert normalize_category("History of the World") == "history world"
    # all-ignore-words falls back to the lowered original
    assert normalize_category("The And Of") == "the and of"


def test_four_way_similarity_metrics():
    from customkb_spark.operators.categorize import four_way_similarity, _indel_ratio

    assert four_way_similarity("machine learning", "machine learning") == 100.0
    # token reorder: plain ratio low, token_sort catches it
    assert four_way_similarity("learning machine", "machine learning") == 100.0
    # substring: partial_ratio catches it
    assert four_way_similarity("machine", "machine learning systems") == 100.0
    # token_set: shared core with extra tokens on one side
    assert four_way_similarity("machine learning", "machine learning advanced topics") == 100.0
    assert four_way_similarity("machine learning", "quantum chemistry") < 60.0
    # indel ratio is the documented rapidfuzz formula
    assert _indel_ratio("abcd", "abcd") == 100.0
    assert _indel_ratio("abcd", "abce") == 75.0  # LCS 3 → 2*3/8
    assert _indel_ratio("", "") == 100.0 and _indel_ratio("a", "") == 0.0


def test_find_merge_groups_reference_invariants():
    from customkb_spark.operators.categorize import find_merge_groups

    assert find_merge_groups([]) == []
    # exact case-fold duplicates merge; shorter-or-equal name is primary
    groups = find_merge_groups(["Machine Learning", "machine learning"])
    assert len(groups) == 1
    g = groups[0]
    assert g["primary"] in ("Machine Learning", "machine learning")
    assert len(g["aliases"]) == 1 and list(g["aliases"].values())[0] >= 95.0
    # shorter name preferred as primary
    groups = find_merge_groups(
        ["Machine Learning and Artificial Intelligence", "Machine Learning"],
        similarity_threshold=85.0,
    )
    if groups:
        assert len(groups[0]["primary"]) <= len(next(iter(groups[0]["aliases"])))
    # unrelated categories never group
    assert find_merge_groups(["Biology", "Quantum Computing"], 85.0) == []


def test_apply_merge_groups(spark):
    from customkb_spark.operators.categorize import apply_merge_groups, find_merge_groups

    docs = spark.createDataFrame(
        [(1, "Machine Learning"), (2, "machine learning"), (3, "Biology")],
        ["doc_id", "primary_category"],
    )
    groups = find_merge_groups(["Machine Learning", "machine learning", "Biology"])
    out = {r["doc_id"]: r["primary_category"] for r in apply_merge_groups(docs, groups).collect()}
    assert len(set(out.values())) == 2  # ML variants collapsed, Biology kept
    assert out[3] == "Biology" and out[1] == out[2]
