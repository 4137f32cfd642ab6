"""Corpus deduplication — the training-data-pipeline operator family.

All variants are shuffle-conscious:

- exact:      one groupBy on a content hash — the only full shuffle, and
              it's on a 128-bit key (no skew; salting unnecessary).
- minhash:    explode shingles → ONE groupBy builds the whole signature
              (16 min-aggregates in a single pass) → band keys → self
              join on (band, key). At 100 TB the candidate join touches
              only bucket collisions, never the full cross product.
- simhash:    per-token bit contributions → one groupBy → fingerprint;
              duplicates share a fingerprint groupBy.
- ngram jaccard: verification step over candidate pairs only.
- embedding:  cosine over LSH/band-bucketed candidates (or brute force
              below a size threshold).

Hashes are md5-based (functions/hashing.py) → reproducible across
engines and runs; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customkb_spark.functions import hashing as H
from customkb_spark.functions import text as X
from customkb_spark.functions import vector as V


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (text_hash, n_dups, canonical_id, dup_ids) for groups with
    more than one member. Normalization = collapse whitespace.
    """
    normed = F.md5(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return (
        docs.select(F.col(id_col).alias("id"), normed.alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("canonical_id"),
            F.array_sort(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh0..mh{K-1}) — computed entirely PER ROW with higher-order
    functions (transform + array_min): the signature build is map-side
    with ZERO shuffle, so at 100 TB it scales with scan bandwidth.
    (min over the shingle array ≡ min over the distinct shingle set.)"""
    sh = H.shingles(X.tokens(text_col), shingle_n)

    # NB: a two-parameter lambda would be interpreted by transform() as
    # (element, index) — bind the salt via closure factory instead.
    def _min_hash(k: int):
        salt = f"{k}:"
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(salt), s)))
        ).alias(f"mh{k}")

    return docs.select(
        F.col(id_col).alias("id"), *[_min_hash(k) for k in range(num_hashes)]
    )


def minhash_band_buckets(
    signatures: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, band_key): concatenate each band's rows into an LSH
    bucket key. Docs sharing any (band, band_key) are candidates."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("|", *parts).alias("band_key"))
        )
    return signatures.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from shared LSH buckets.

    Self-join on (band, band_key). Mega-buckets (boilerplate shingles)
    are the skew risk at scale — AQE skew-join handles moderate cases;
    pathological buckets should be capped upstream (drop buckets with
    > N members — they're near-identical boilerplate anyway).
    """
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs only.

    Computes |A∩B| via a join of the exploded shingle sets restricted to
    candidate ids — never materializes full set intersections per row.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(H.shingles(X.tokens(text_col), shingle_n)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    ids = pairs.select(F.col("id_a").alias("id")).union(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct()
    sh_c = sh.join(F.broadcast(ids), "id")  # candidate shingles only
    inter = (
        pairs.join(sh_c.withColumnRenamed("id", "id_a"), ["id_a"])
        .join(
            sh_c.withColumnRenamed("id", "id_b").withColumnRenamed("shingle", "shingle_b"),
            ["id_b"],
        )
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_lsh_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash→LSH→Jaccard-verify near-dup pairs."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    cands = minhash_candidate_pairs(minhash_band_buckets(sigs, num_hashes, bands))
    return jaccard_verify(docs, cands, id_col, text_col, shingle_n, threshold)


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(id, simhash) — per-token ±1 bit votes summed per document, sign
    → bit. Documents with equal fingerprints are near-dup candidates.

    Like the MinHash signature, the whole fingerprint is a per-row
    expression (aggregate over the token array): no explode, no
    shuffle — map-side at any scale."""
    toks = X.unique_tokens(text_col)

    def bit_sum(i: int):
        def step(acc, tok):
            digit = F.substring(F.md5(tok), i + 1, 1)
            val = F.instr(F.lit("0123456789abcdef"), digit) - 1
            return acc + F.when(val >= 8, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(toks, F.lit(0), step)

    fingerprint = F.concat(
        *[F.when(bit_sum(i) >= 0, "1").otherwise("0") for i in range(bits)]
    )
    return docs.select(F.col(id_col).alias("id"), fingerprint.alias("simhash"))


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    With ``bucket_col`` (e.g. an IVF cluster id or LSH band) the self
    join is restricted to same-bucket pairs — the scale path. Without
    it, a brute-force self join (correctness oracle; quadratic — only
    for bounded inputs).
    """
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        *( [F.col(bucket_col).alias("bucket")] if bucket_col else [] ),
    )
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if bucket_col:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    sim = V.cosine(F.col("a.vec"), F.col("b.vec"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
