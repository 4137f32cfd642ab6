"""Dedup family: exact groups, MinHash-LSH planted near-dups, SimHash
stability, embedding near-dup symmetry."""

from pyspark.sql import functions as F

from customkb_spark.operators import dedup as D


def test_exact_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "hello  world"), (2, "hello world"), (3, "other text")],
        ["doc_id", "text"],
    )
    out = D.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["canonical_id"] == 1 and out[0]["n_dups"] == 2


def test_minhash_finds_planted_near_dup(spark, documents):
    base = documents.limit(20).select("doc_id", "text")
    mutated = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.substring("text", 1, F.floor(F.length("text") * 0.9).cast("int")).alias("text"),
    )
    pairs = D.minhash_lsh_duplicates(base.union(mutated), threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 1000) for r in base.collect()}
    # LSH is probabilistic: require most planted pairs recovered, no junk
    assert len(found & planted) >= len(planted) * 0.7
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_minhash_no_false_positives_on_distinct(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")],
        ["doc_id", "text"],
    )
    assert D.minhash_lsh_duplicates(docs).count() == 0


def test_simhash_identical_docs_share_fingerprint(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "completely different words here")],
        ["doc_id", "text"],
    )
    fps = {r["id"]: r["simhash"] for r in D.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_embedding_near_dups_brute_force(spark):
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.1]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    out = D.embedding_near_duplicates(docs, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_embedding_near_dups_bucketed_prunes(spark):
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.99, 0.1], 1), (3, [0.98, 0.05], 1)],
        ["vec_id", "embedding", "cluster_id"],
    )
    out = D.embedding_near_duplicates(docs, threshold=0.5, bucket_col="cluster_id").collect()
    # pair (1,2) crosses buckets → pruned; only (2,3) survives
    assert [(r["id_a"], r["id_b"]) for r in out] == [(2, 3)]


def test_connected_components_transitive(spark):
    from customkb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    # A~B~C collapses to min-id 1 even though (1,3) was never a pair
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    from customkb_spark.operators.dedup import connected_components

    # a 12-node path: min label must flow the whole chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_connected_components_string_ids_converge(spark):
    """ADVICE r2: string ids made the old sum-based convergence check
    compare null == null and stop after ONE propagation round — a long
    chain of string-keyed docs must still collapse to one cluster."""
    from customkb_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(8)],
        ["id_a", "id_b"],
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert set(got.values()) == {"doc00"}
    assert len(got) == 9
