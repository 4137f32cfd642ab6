"""Random-hyperplane LSH for embedding columns — the bucketed scale
path for cosine similarity search and embedding near-dup mining.

Complements the IVF index (embedding/index.py): IVF partitions by
k-means cells (data-dependent, needs training); hyperplane LSH is
training-free — ``nbits`` seeded random hyperplanes, bucket key =
concatenated sign bits of the projections (SimHash for vectors).
Cosine-similar vectors collide with probability (1 - θ/π)^nbits.

Everything after plane generation is a JVM-side column expression, so
bucket assignment is map-side at any scale; the near-dup self-join is
then restricted to same-bucket pairs (operators/dedup.
embedding_near_duplicates with bucket_col). At 100 TB: write the
vectors table partitioned/bucketed by ``lsh_bucket`` so the pair join
is co-located — zero shuffle of vector payloads.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import vector as V
from customkb_spark.operators.dedup import embedding_near_duplicates


def random_hyperplanes(dim: int, nbits: int = 8, seed: int = 42) -> np.ndarray:
    """(nbits, dim) standard-normal hyperplanes, deterministic by seed."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket key: one sign bit per hyperplane, as a bit string.

    dot ≥ 0 → '1'. String keys (not ints) keep the expression mirrorable
    in the DuckDB oracle and debuggable."""
    bits = [
        F.when(
            V.dot(vec_col, F.lit([float(x) for x in p]).cast("array<double>")) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def assign_lsh_buckets(
    vectors: DataFrame, planes: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    return vectors.withColumn("lsh_bucket", lsh_bucket(F.col(vec_col), planes))


def lsh_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nbits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (cos ≥ threshold) restricted to same-LSH-bucket
    candidates. Recall follows the collision curve — raise recall by
    lowering nbits or unioning over several seeds (band trick)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, nbits, seed)
    bucketed = assign_lsh_buckets(embeddings, planes, vec_col)
    return embedding_near_duplicates(
        bucketed, id_col, vec_col, threshold, bucket_col="lsh_bucket"
    )


def multiprobe_buckets(qbits: str, hamming: int) -> set[str]:
    """All bucket keys within ``hamming`` bit flips of ``qbits``:
    flip every size-≤d combination of positions —
    sum_{j<=d} C(nbits, j) probes total."""
    from itertools import combinations

    probes = {qbits}
    for d in range(1, min(hamming, len(qbits)) + 1):
        for idxs in combinations(range(len(qbits)), d):
            flipped = list(qbits)
            for i in idxs:
                flipped[i] = "0" if flipped[i] == "1" else "1"
            probes.add("".join(flipped))
    return probes


def lsh_search(
    embeddings: DataFrame,
    query_vec: list[float],
    planes: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: scan only buckets within ``multiprobe_hamming`` bit
    flips of the query's bucket (multi-probe LSH), exact cosine within.

    With the table bucketed by ``lsh_bucket`` the isin filter is
    partition pruning, mirroring the IVF nprobe pattern.

    If ``embeddings`` already carries ``lsh_bucket`` (a persisted/
    cached ``assign_lsh_buckets`` table — the index-build step), the
    stored assignment is reused: re-deriving nbits sign expressions
    over the whole corpus PER QUERY is the repeated-query cost this
    path exists to avoid (same convention as semdedup_incremental's
    cluster_id reuse; measured ~10× per-query at 100k×256, nbits 16)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = "".join("1" if float(p @ q) >= 0 else "0" for p in planes)
    probes = multiprobe_buckets(qbits, multiprobe_hamming)
    bucketed = (
        embeddings
        if "lsh_bucket" in embeddings.columns
        else assign_lsh_buckets(embeddings, planes, vec_col)
    )
    pruned = bucketed.filter(F.col("lsh_bucket").isin(sorted(probes)))
    from customkb_spark.operators.topk import brute_force_topk

    return brute_force_topk(pruned, query_vec, k, id_col, vec_col, "cosine")
