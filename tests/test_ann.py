"""ANN paths vs the exact oracle: IVF recall/monotonicity, nprobe=nlist
exactness, cluster assignment sanity."""

from customkb_spark.embedding.index import (
    assign_clusters,
    ivf_search,
    nearest_clusters,
    train_centroids,
)
from customkb_spark.operators.topk import brute_force_topk


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


def test_ivf_exact_when_probing_all_clusters(spark, embeddings):
    cents = train_centroids(embeddings, "embedding", nlist=8)
    indexed = assign_clusters(embeddings, cents, "embedding").cache()
    q = [float(x) for x in embeddings.filter("vec_id = 0").first()["embedding"]]
    exact = [r["id"] for r in brute_force_topk(embeddings, q, 10, "vec_id", "embedding").collect()]
    full = [
        r["id"]
        for r in ivf_search(indexed, cents, q, k=10, nprobe=8, id_col="vec_id", vec_col="embedding").collect()
    ]
    assert full == exact  # nprobe = nlist ⇒ identical to brute force


def test_ivf_recall_monotone_in_nprobe(spark, embeddings):
    cents = train_centroids(embeddings, "embedding", nlist=8)
    indexed = assign_clusters(embeddings, cents, "embedding").cache()
    q = [float(x) for x in embeddings.filter("vec_id = 3").first()["embedding"]]
    exact = [r["id"] for r in brute_force_topk(embeddings, q, 10, "vec_id", "embedding").collect()]
    recalls = []
    for nprobe in (1, 4, 8):
        ids = [
            r["id"]
            for r in ivf_search(indexed, cents, q, k=10, nprobe=nprobe, id_col="vec_id", vec_col="embedding").collect()
        ]
        recalls.append(_recall(ids, exact))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[-1] == 1.0
    # the probed cluster always contains the query vector itself
    assert 3 in [
        r["id"]
        for r in ivf_search(indexed, cents, q, k=10, nprobe=1, id_col="vec_id", vec_col="embedding").collect()
    ]


def test_cluster_assignment_covers_all(spark, embeddings):
    cents = train_centroids(embeddings, "embedding", nlist=4)
    indexed = assign_clusters(embeddings, cents, "embedding")
    assert indexed.filter("cluster_id IS NULL").count() == 0
    n_clusters = indexed.select("cluster_id").distinct().count()
    assert 1 <= n_clusters <= 4
    probes = nearest_clusters(
        [float(x) for x in embeddings.first()["embedding"]], cents, 2
    )
    assert len(probes) == 2 and all(0 <= p < 4 for p in probes)
