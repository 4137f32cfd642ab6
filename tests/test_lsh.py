"""Hyperplane LSH: bucket determinism, near-dup pruning, search recall
vs the exact oracle."""

from customkb_spark.embedding import lsh as L
from customkb_spark.operators.topk import brute_force_topk


def test_bucket_assignment_deterministic(spark, embeddings):
    planes = L.random_hyperplanes(64, nbits=8, seed=42)
    a = {r["vec_id"]: r["lsh_bucket"] for r in L.assign_lsh_buckets(embeddings, planes).collect()}
    b = {r["vec_id"]: r["lsh_bucket"] for r in L.assign_lsh_buckets(embeddings, planes).collect()}
    assert a == b
    assert all(len(k) == 8 and set(k) <= {"0", "1"} for k in a.values())


def test_identical_vectors_always_collide(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.0]), (3, [-1.0, -2.0, -3.0])],
        ["vec_id", "embedding"],
    )
    out = L.lsh_near_duplicates(df, threshold=0.99, nbits=4)
    pairs = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert pairs == [(1, 2)]  # 3 is in the opposite bucket of every plane


def test_lsh_search_recall_vs_exact(spark, embeddings):
    planes = L.random_hyperplanes(64, nbits=4, seed=42)
    row = embeddings.filter("vec_id = 0").select("embedding").first()
    q = [float(x) for x in row[0]]
    exact = [r["id"] for r in brute_force_topk(embeddings, q, 10, "vec_id", "embedding").collect()]
    approx = [
        r["id"]
        for r in L.lsh_search(embeddings, q, planes, k=10, multiprobe_hamming=1).collect()
    ]
    # multi-probe over 4-bit buckets must at least find the query itself
    # plus a reasonable share of true neighbors
    assert 0 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_multiprobe_hamming_generates_all_combinations(spark):
    # 1 + C(4,1) + C(4,2) = 11 buckets at hamming<=2
    probes = L.multiprobe_buckets("1010", 2)
    assert "1010" in probes
    assert len(probes) == 11
    assert all(sum(a != b for a, b in zip(p, "1010")) <= 2 for p in probes)
    # hamming=1 keeps the old behavior; hamming=0 is just the home bucket
    assert len(L.multiprobe_buckets("1010", 1)) == 5
    assert L.multiprobe_buckets("1010", 0) == {"1010"}
    # capped at nbits: full flip enumerates the whole 2^4 keyspace
    assert len(L.multiprobe_buckets("1010", 99)) == 16


def test_lsh_search_reuses_prebucketed_table(spark, embeddings, tmp_path):
    """lsh_search on a table already carrying lsh_bucket (the persisted
    index shape) must return exactly the inline-assignment results —
    and must NOT re-derive the sign expressions (locked via a plan
    check on a PERSISTED index: no sign-chain CASE WHEN, and the
    bucket filter is PUSHED to the parquet scan)."""
    from customkb_spark.embedding import lsh as L

    dim = len(embeddings.select("embedding").first()[0])
    planes = L.random_hyperplanes(dim, 12, 7)
    q = [float(x) for x in embeddings.filter("vec_id = 9").first()["embedding"]]
    inline = [
        (r["id"], round(r["score"], 9))
        for r in L.lsh_search(embeddings, q, planes, k=10, multiprobe_hamming=1).collect()
    ]
    idx_path = str(tmp_path / "lsh_index")
    L.assign_lsh_buckets(embeddings, planes, "embedding").write.parquet(idx_path)
    bucketed = spark.read.parquet(idx_path)
    pre = L.lsh_search(bucketed, q, planes, k=10, multiprobe_hamming=1)
    assert [(r["id"], round(r["score"], 9)) for r in pre.collect()] == inline
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "CASE WHEN" not in plan  # stored buckets, not re-derived
    assert "PushedFilters: [In(lsh_bucket" in plan  # probe filter reaches the scan
