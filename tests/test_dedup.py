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


def test_semantic_duplicates_subset_of_exact(spark):
    """SemDeDup pairs are exact pairs filtered to same-cluster scope;
    nlist=1 degenerates to brute force (full recall)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 8))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant a tight near-dup of row 0
    rows.append((100, [float(x) for x in (base[0] + 0.01)]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_duplicates(emb, threshold=0.9).collect()
    }
    assert (0, 100) in exact

    from customkb_spark.embedding.index import train_centroids

    cents1 = train_centroids(emb, "embedding", nlist=1, sample_size=100)
    sem1 = {
        (r.id_a, r.id_b)
        for r in D.semantic_duplicates(emb, cents1, threshold=0.9).collect()
    }
    assert sem1 == exact  # one cluster == brute force

    cents4 = train_centroids(emb, "embedding", nlist=4, sample_size=100)
    sem4 = {
        (r.id_a, r.id_b)
        for r in D.semantic_duplicates(emb, cents4, threshold=0.9).collect()
    }
    assert sem4 <= exact  # cluster scope only ever drops pairs
    # a 0.01-perturbed duplicate lands in the same k-means cell
    assert (0, 100) in sem4


def test_semdedup_apply_keep_policies(spark):
    """The paper's low-centroid-sim policy keeps the rim member of each
    duplicate group; min_id keeps the canonical representative;
    singletons always survive; exactly one survivor per group."""
    import numpy as np

    from customkb_spark.embedding.index import train_centroids

    rng = np.random.default_rng(11)
    a = rng.standard_normal(8)
    rows = [
        (1, [float(x) for x in a]),
        (2, [float(x) for x in a * 1.001 + 0.001]),  # near-dup of 1
        (3, [float(x) for x in -a]),  # far singleton
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = train_centroids(emb, "embedding", nlist=2, sample_size=100)

    for policy in ("low_centroid_sim", "min_id"):
        out = {r.id: r for r in D.semdedup_apply(
            emb, cents, threshold=0.99, keep=policy
        ).collect()}
        assert set(out) == {1, 2, 3}
        assert out[3].kept  # singleton survives
        kept_in_group = [i for i in (1, 2) if out[i].kept]
        assert len(kept_in_group) == 1  # exactly one survivor
        if policy == "min_id":
            assert out[1].kept
        else:
            lo = min((out[i].centroid_sim, i) for i in (1, 2))[1]
            assert out[lo].kept

    import pytest

    with pytest.raises(ValueError, match="keep policy"):
        D.semdedup_apply(emb, cents, keep="bogus")


def test_semdedup_incremental_admits_only_novel(spark):
    """New batch dedups against the kept corpus under frozen centroids:
    a near-dup of a kept doc is rejected, novel docs are admitted, and
    batch-internal duplicates pass through (semdedup_apply's job)."""
    import numpy as np

    from customkb_spark.embedding.index import train_centroids

    rng = np.random.default_rng(3)
    a, b = rng.standard_normal(8), rng.standard_normal(8)
    kept = spark.createDataFrame(
        [(1, [float(x) for x in a])], ["vec_id", "embedding"]
    )
    new = spark.createDataFrame(
        [
            (10, [float(x) for x in a * 1.001]),  # dup of kept 1 → rejected
            (11, [float(x) for x in b]),          # novel → admitted
            (12, [float(x) for x in b * 1.001]),  # batch-internal dup → admitted
        ],
        ["vec_id", "embedding"],
    )
    cents = train_centroids(
        kept.unionByName(new), "embedding", nlist=2, sample_size=100
    )
    got = sorted(
        r.vec_id
        for r in D.semdedup_incremental(new, kept, cents, threshold=0.99).collect()
    )
    assert got == [11, 12]
    # schema passthrough: admitted rows keep the original columns
    cols = D.semdedup_incremental(new, kept, cents, threshold=0.99).columns
    assert cols == ["vec_id", "embedding"]


def test_semdedup_incremental_prunes_kept_partitions(spark, tmp_path):
    """With a cluster-partitioned kept table, the kept scan must carry a
    static cluster_id IN (...) partition filter for the batch's landed
    cells — DPP alone does not fire for this shape (code-review r4
    follow-up), so the operator prunes by hand."""
    import contextlib
    import io

    import numpy as np

    from customkb_spark.embedding.index import assign_clusters, train_centroids

    rng = np.random.default_rng(2)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_centroids(emb, "embedding", nlist=8, sample_size=500)
    kp = str(tmp_path / "kept")
    assign_clusters(emb, cents, "embedding").write.partitionBy("cluster_id").parquet(kp)
    kept = spark.read.parquet(kp)
    new = spark.createDataFrame(
        [(500, [float(x) for x in rng.standard_normal(8)])],
        "vec_id long, embedding array<double>",
    )
    out = D.semdedup_incremental(new, kept, cents, threshold=0.99)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    pf = [l for l in buf.getvalue().splitlines() if "PartitionFilters" in l]
    # Catalyst simplifies a single landed cell's IN to an equality
    assert pf and "cluster_id" in pf[0] and (" IN " in pf[0] or " = " in pf[0])
    assert out.count() == 1  # novel doc admitted


def test_substring_spans_planted_cross_doc(spark):
    """A shared >=k-token passage is reported once, in the
    non-canonical doc only, covering exactly the shared run."""
    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, shared + " and runs far away"),
            (2, "intro words here " + shared + " trailing bits"),
            (3, "completely different content with no shared runs at all"),
        ],
        ["doc_id", "text"],
    )
    rows = D.duplicated_substring_spans(docs, k=5).collect()
    assert len(rows) == 1
    r = rows[0]
    # doc 1 is corpus-order first -> canonical; doc 2 carries the span
    assert r["doc_id"] == 2
    assert (r["span_start"], r["span_end"]) == (3, 13)  # 10 shared tokens


def test_substring_spans_below_k_invisible(spark):
    """A shared run shorter than k can produce no window at all."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique tail one"),
            (2, "other head alpha beta gamma delta distinct end"),
        ],
        ["doc_id", "text"],
    )
    assert D.duplicated_substring_spans(docs, k=5).count() == 0


def test_substring_spans_internal_repeat_merges(spark):
    """Self-repetition: first occurrence canonical, later copies merge
    into ONE maximal island even though their windows overlap."""
    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee aa bb cc dd ee aa bb cc dd ee")],
        ["doc_id", "text"],
    )
    rows = D.duplicated_substring_spans(docs, k=5).collect()
    assert len(rows) == 1
    assert (rows[0]["span_start"], rows[0]["span_end"]) == (5, 15)


def test_exact_substring_dedup_apply(spark):
    """Apply cuts the duplicated spans, keeps the canonical copy, and
    returns every doc exactly once with consistent counters."""
    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " enda aa"),
            (2, "head x " + shared + " endb bb"),
            (3, "unrelated words entirely here today"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.exact_substring_dedup(docs, k=4).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["removed_tokens"] == 0 and out[1]["text"].startswith("one two")
    assert out[2]["removed_tokens"] == 8
    assert out[2]["text"] == "head x endb bb"
    assert out[3]["removed_tokens"] == 0
    for r in out.values():
        assert r["n_tokens"] - r["removed_tokens"] == len(r["text"].split())


def test_substring_rolling_equals_md5_spans(spark):
    """Equality lock: the O(n) rolling Karp-Rabin window hash and the
    legacy O(n*k) md5-over-rebuilt-grams path produce IDENTICAL span
    reports (hashes differ; spans are the contract) — on a corpus mixing
    cross-doc shares, internal repeats, adjacent islands, and clean
    docs, at two k values."""
    shared = "the quick brown fox jumps over the lazy dog tonight again"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique ending one two"),
            (2, "intro bits " + shared + " other tail"),
            (3, "aa bb cc dd ee aa bb cc dd ee aa bb cc dd ee ff gg"),
            (4, "totally unrelated content with zero shared window runs"),
            (5, shared + " mid gap " + shared),
        ],
        ["doc_id", "text"],
    )
    for k in (4, 7):
        rolling = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in D.duplicated_substring_spans(docs, k=k, hash_impl="rolling")
            .collect()
        )
        md5 = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in D.duplicated_substring_spans(docs, k=k, hash_impl="md5")
            .collect()
        )
        assert rolling == md5 and rolling


def test_substring_spans_fully_duplicated_doc_empties(spark):
    """A non-canonical doc that is one big duplicated run cleans to
    empty text (the paper's drop case, left to the caller)."""
    t = "p q r s t u v w"
    docs = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in D.exact_substring_dedup(docs, k=4).collect()}
    assert out[1]["text"] == t and out[1]["removed_tokens"] == 0
    assert out[2]["text"] == "" and out[2]["removed_tokens"] == 8


# ------------------------------------ large-star / small-star CC tier


def test_star_cc_matches_propagation_on_random_graph(spark):
    import random

    random.seed(7)
    pairs = [
        (random.randrange(120), random.randrange(120)) for _ in range(90)
    ]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    prop = {r.id: r.cluster_id for r in D.connected_components(df).collect()}
    star = {
        r.id: r.cluster_id for r in D.connected_components_star(df).collect()
    }
    assert prop == star


def test_star_cc_contracts_a_deep_path(spark):
    # diameter 199: min-label propagation needs 199 rounds (over its
    # default max_iter); star contraction converges in O(log^2 n)
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], ["id_a", "id_b"]
    )
    out = {
        r.id: r.cluster_id
        for r in D.connected_components_star(path, max_iter=15).collect()
    }
    assert len(out) == 200 and set(out.values()) == {0}


def test_star_cc_string_ids_and_self_pair_singleton(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "x")], ["id_a", "id_b"]
    )
    out = {
        r.id: r.cluster_id for r in D.connected_components_star(df).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x"}


def test_tune_lsh_bands_tracks_threshold():
    # low threshold -> many bands (few rows): catch low-similarity pairs;
    # high threshold -> fewer bands (more rows): suppress false positives
    b_low, r_low = D.tune_lsh_bands(0.2, 64)
    b_high, r_high = D.tune_lsh_bands(0.9, 64)
    assert b_low * r_low == 64 and b_high * r_high == 64
    assert b_low > b_high and r_low < r_high
    # at the chosen split the S-curve crosses ~50% near the threshold
    for t, (b, r) in ((0.2, (b_low, r_low)), (0.9, (b_high, r_high))):
        p = 1.0 - (1.0 - t**r) ** b
        assert 0.2 < p < 0.98
    # recall bias pushes toward more bands (earlier S-curve rise)
    b_recall, _ = D.tune_lsh_bands(0.5, 64, fn_weight=10.0)
    b_neutral, _ = D.tune_lsh_bands(0.5, 64)
    assert b_recall >= b_neutral


def test_tune_lsh_bands_validates_inputs():
    import pytest as _pt

    with _pt.raises(ValueError):
        D.tune_lsh_bands(0.0, 16)
    with _pt.raises(ValueError):
        D.tune_lsh_bands(0.5, 1)


def test_star_cc_exhausted_iterations_still_one_row_per_id(spark):
    # max_iter too small to converge on a deep path: the result may be
    # under-merged (propagation's documented non-converged mode) but
    # must still honor the one-row-per-id contract
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["id_a", "id_b"]
    )
    out = D.connected_components_star(path, max_iter=1).collect()
    ids = [r.id for r in out]
    assert len(ids) == len(set(ids)) == 64
    assert all(r.cluster_id <= r.id for r in out)


def test_minhash_signatures_match_hof_reference(spark):
    """r9 pins the exploded-projection + partial-agg signature rewrite
    to the original per-row HOF definition, including the edge
    geometries the explode path must preserve: empty text (empty
    shingle array), NULL text, and a doc shorter than the shingle
    width (all -> one row of NULL signatures via explode_outer)."""
    from customkb_spark.functions import hashing as H

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, ""),
            (4, None),
            (5, "shorty"),
            (6, "alpha beta gamma delta epsilon zeta"),
            # exactly n tokens — one shingle, the index-sequence
            # boundary of the codegen'd exploded construction
            (7, "one two three"),
        ],
        ["doc_id", "text"],
    )
    sh = D.shingle_sets(docs, "doc_id", "text", 3)
    xs = sh.select(
        "id", F.transform(F.col("shingles"), lambda s: H.shingle_to_int(s)).alias("xs")
    )
    params = H.minhash_perm_params(8)
    ref_cols = [
        F.array_min(
            F.transform(F.col("xs"), lambda x: (F.lit(a) * x + F.lit(b)) % H.MINHASH_PRIME)
        ).alias(f"mh{k}")
        for k, (a, b) in enumerate(params)
    ]
    ref = {r["id"]: tuple(r)[1:] for r in xs.select("id", *ref_cols).collect()}
    got = {
        r["id"]: tuple(r)[1:]
        for r in D.minhash_signatures(docs, "doc_id", "text", 8, 3).collect()
    }
    assert got == ref
    # every doc keeps exactly one row — the explode_outer path must not
    # drop empty/NULL/short-text docs (short docs carry the whole-text
    # fallback shingle, the tokenizer's convention)
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    # identical texts agree; near-identical overlap on most mins
    assert got[1] == got[6]
