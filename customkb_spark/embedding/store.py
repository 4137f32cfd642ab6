"""Index persistence + incremental maintenance.

The reference serializes its FAISS index to one file and mmaps it per
query (embed_manager.py saves ``<kb>.faiss``; index_manager.py:209
verifies/rebuilds it). The Spark-first equivalents:

- centroids / PQ codebooks are TINY (nlist×dim and m×2^nbits×dsub
  doubles) → plain parquet tables, loaded to the driver in one collect
  and re-broadcast into search expressions;
- the indexed vector table is the big artifact → parquet PARTITIONED BY
  ``cluster_id`` so nprobe search prunes files before the scan (the
  disk layout IS the index);
- incremental maintenance appends only NEW vectors (anti-join on id),
  assigned to the EXISTING centroids — same as FAISS ``add`` after
  ``train``. ``index_drift`` reports per-cluster assignment distance so
  callers know when the frozen centroids have drifted enough to
  retrain (the reference's verify-indexes analogue for ANN).

At 100 TB: appends write only the affected cluster partitions; a
retrain decision is a stats read, never a full rescan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customkb_spark.embedding.index import assign_clusters
from customkb_spark.embedding.pq import PQModel
from customkb_spark.functions import vector as V


# ------------------------------------------------------ small artifacts


def _write_single_file(spark, rows, schema: str, path: str) -> None:
    """Driver-local rows → one parquet file. A single-slice parallelize,
    NOT createDataFrame().coalesce(1): the default path slices local
    data into defaultParallelism pickled partitions and coalesce makes
    ONE task page through every one of them via the Python worker
    (measured 6-11 s for a 512-row codebook table; single-slice is
    ~0.4 s)."""
    rdd = spark.sparkContext.parallelize(rows, 1)
    spark.createDataFrame(rdd, schema).write.mode("overwrite").parquet(path)


def save_centroids(spark: SparkSession, centroids: np.ndarray, path: str) -> None:
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    _write_single_file(spark, rows, "cluster_id int, centroid array<double>", path)


def load_centroids(spark: SparkSession, path: str) -> np.ndarray:
    # Arrow toPandas, not collect(): boxing an array<double> column
    # element-by-element through py4j is ~50× slower (index.
    # sample_vectors' measured 57 s); at the FAISS-scale tiers this
    # loader exists for (nlist 16k × dim 1024 = 16M doubles) the boxed
    # path takes minutes
    pdf = spark.read.parquet(path).orderBy("cluster_id").toPandas()
    if not len(pdf):
        return np.empty((0, 0), dtype=np.float64)
    return np.stack([np.asarray(c, dtype=np.float64) for c in pdf["centroid"].values])


def save_pq(spark: SparkSession, model: PQModel, path: str) -> None:
    """Codebooks flattened to (subvector, code) rows; IVF coupling is
    restored on load from the sibling centroids table if present."""
    rows = [
        (int(j), int(c), [float(x) for x in model.codebooks[j, c]])
        for j in range(model.m)
        for c in range(model.ksub)
    ]
    _write_single_file(
        spark, rows, "subvector int, code int, centroid array<double>",
        f"{path}/codebooks",
    )
    if model.centroids is not None:
        save_centroids(spark, model.centroids, f"{path}/ivf_centroids")
    if model.rotation is not None:
        _write_single_file(
            spark,
            [(i, [float(x) for x in row]) for i, row in enumerate(model.rotation)],
            "row int, coeffs array<double>",
            f"{path}/opq_rotation",
        )


def save_sq(spark: SparkSession, model, path: str) -> None:
    """SQ8 grid: one row (vmin, scale, nbits) — the whole model is
    2×dim doubles."""
    _write_single_file(
        spark,
        [([float(x) for x in model.vmin], [float(x) for x in model.scale],
          int(model.nbits))],
        "vmin array<double>, scale array<double>, nbits int",
        path,
    )


def load_sq(spark: SparkSession, path: str, centroids=None):
    from customkb_spark.embedding.sq import SQModel

    r = spark.read.parquet(path).collect()[0]
    return SQModel(
        np.asarray(r.vmin, dtype=np.float64),
        np.asarray(r.scale, dtype=np.float64),
        int(r.nbits),
        centroids,
    )


def load_pq(spark: SparkSession, path: str) -> PQModel:
    # Arrow transfer (see load_centroids): m × 2^nbits codebook rows
    pdf = (
        spark.read.parquet(f"{path}/codebooks").orderBy("subvector", "code").toPandas()
    )
    m = int(pdf["subvector"].max()) + 1
    ksub = int(pdf["code"].max()) + 1
    dsub = len(pdf["centroid"].iloc[0])
    books = np.zeros((m, ksub, dsub), dtype=np.float64)
    for j, c, cent in zip(pdf["subvector"], pdf["code"], pdf["centroid"]):
        books[int(j), int(c)] = np.asarray(cent, dtype=np.float64)
    cents = None
    try:
        cents = load_centroids(spark, f"{path}/ivf_centroids")
    except Exception:
        pass  # flat PQ (no IVF coupling) has no centroids table
    rotation = None
    try:
        rpdf = spark.read.parquet(f"{path}/opq_rotation").orderBy("row").toPandas()
        rotation = np.asarray(
            [np.asarray(r, dtype=np.float64) for r in rpdf["coeffs"]]
        )
    except Exception:
        pass  # plain PQ has no rotation table
    return PQModel(books, cents, rotation)


def dir_fingerprint(path: str | None) -> str | None:
    """Cheap identity of a parquet table DIRECTORY: sorted (relpath,
    size, mtime_ns) of its data files, hashed. Parquet data files are
    immutable once written (every write creates new files), so listing
    equality ⇒ content equality — a freshness check that costs two
    ``os.walk``s instead of two full-table scans (VERDICT r7 #4: the
    kb100k index_load spent its 13.5 s mostly in content_fingerprint
    corpus scans that re-proved an unchanged directory unchanged).

    Returns None when ``path`` isn't a local directory (object-store
    URI, absent table) — callers fall back to content_fingerprint.
    Any mismatch is also just a fallback, never a verdict: a rewrite
    that produced identical content still passes the content check."""
    import hashlib
    import os

    if not path or not os.path.isdir(path):
        return None
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS / .crc markers: not data
            p = os.path.join(root, f)
            st = os.stat(p)
            entries.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    entries.sort()
    return hashlib.md5(repr(entries).encode()).hexdigest()


def content_fingerprint(df: DataFrame, id_col: str, vec_col: str) -> str:
    """Order-independent content checksum: sum of ``xxhash64(id, vec)``
    accumulated in DECIMAL(38,0) (overflow-proof, partial-aggregated).
    A bare row count misses in-place re-embeds under unchanged ids
    (force re-ingest writes new vectors for the same deterministic ids)
    — the fingerprint changes whenever any (id, vector) pair changes,
    in any order, at any parallelism."""
    row = df.agg(
        F.sum(
            F.xxhash64(F.col(id_col), F.col(vec_col)).cast("decimal(38,0)")
        ).alias("fp")
    ).collect()[0]
    return str(row.fp if row.fp is not None else 0)


# ----------------------------------------------------- the big artifact


def write_ivf_table(indexed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write vectors partitioned by ``cluster_id`` — probe-time cluster
    filters become partition pruning (no data files read outside the
    probed clusters; pinned by tests/test_plans.test_ivf_partition_pruning).

    The repartition before the write is load-bearing: a partitionBy
    from an N-partition frame writes up to N files into EVERY cluster
    dir (the classic small-files fan-out — measured 8,161 files for a
    91 MB / 256-cluster table, which put ~8k scheduling-overhead tasks
    in front of every unpruned scan). Clustering the frame by the
    partition column first writes one file per cluster per holding
    partition — n_clusters files total."""
    indexed.repartition("cluster_id").write.mode(mode).partitionBy(
        "cluster_id"
    ).parquet(path)


def incremental_index(
    vectors: DataFrame,
    table_path: str,
    centroids: np.ndarray,
    id_col: str = "id",
    vec_col: str = "vector",
) -> int:
    """Append only vectors whose id is NOT already indexed, assigned to
    the existing centroids (FAISS ``add`` semantics — training is
    frozen). Anti-join on id (broadcast-able: the *new* side is small in
    steady state), JVM argmin assignment, partitioned append touching
    only the affected cluster partitions. Returns rows appended."""
    spark = vectors.sparkSession
    existing = spark.read.parquet(table_path).select(id_col)
    fresh = vectors.join(existing, id_col, "left_anti")
    assigned = assign_clusters(fresh, centroids, vec_col)
    n = assigned.count()
    if n:
        write_ivf_table(assigned, table_path, mode="append")
    return n


# ------------------------------------------------- index-tier lifecycle


def save_vector_index(tier, path: str, source_dir: str | None = None) -> None:
    """Persist a ``VectorIndexTier`` (embedding/auto.py) — the engine's
    analogue of the reference writing ``<kb>.faiss`` next to the DB
    (embed_manager.py save path). Layout under ``path``:

    - ``meta``: one row (kind, n indexed rows, id/vec column names);
    - ``centroids`` (ivf/ivfpq), ``pq/`` codebooks (ivfpq);
    - ``indexed``: the derived table, PARTITIONED BY cluster_id.

    ``flat`` persists meta only — the raw vectors table IS the index.

    ``source_dir`` (the vectors table's parquet directory, when the
    caller reads it from one, e.g. KnowledgeBase) also pins the cheap
    dir_fingerprint next to the content fingerprint, so a later load
    of the UNCHANGED table skips the freshness corpus scan entirely.
    """
    spark = tier.vectors.sparkSession
    n = tier.indexed.count() if tier.indexed is not None else tier.vectors.count()
    fp = content_fingerprint(tier.vectors, tier.id_col, tier.vec_col)
    _write_meta(
        spark, path, tier.kind, int(n), tier.id_col, tier.vec_col, fp,
        dir_fingerprint(source_dir),
    )
    if tier.kind == "flat":
        return
    save_centroids(spark, tier.centroids, f"{path}/centroids")
    if tier.kind == "ivfpq":
        save_pq(spark, tier.pq, f"{path}/pq")
    if tier.kind == "ivfsq":
        save_sq(spark, tier.sq, f"{path}/sq")
    write_ivf_table(tier.indexed, f"{path}/indexed")


def _write_meta(spark, path, kind, n, id_col, vec_col, fp, src_fp=None) -> None:
    _write_single_file(
        spark,
        [(kind, int(n), id_col, vec_col, fp, src_fp)],
        "kind string, n long, id_col string, vec_col string, fp string, "
        "src_fp string",
        f"{path}/meta",
    )


def index_freshness(spark: SparkSession, path: str, vectors: DataFrame) -> str:
    """Report-only freshness verdict for a saved tier, using the SAME
    rules ``load_vector_index`` applies at query time (so ``verify``
    never disagrees with what a query would do):

    - ``"fresh"`` — fingerprint matches (or flat tier: nothing to go
      stale);
    - ``"appendable"`` — ivf, content changed but purely by appends
      (a query absorbs them FAISS-``add``-style);
    - ``"stale"`` — in-place mutation / ivfpq change / pre-fingerprint
      meta: a query would rebuild;
    - ``"absent"`` — no readable saved index.
    """
    try:
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
    except Exception:
        return "absent"
    if meta.kind == "flat":
        return "fresh"
    fp_old = getattr(meta, "fp", None)
    if fp_old is None:
        return "stale"
    if content_fingerprint(vectors, meta.id_col, meta.vec_col) == fp_old:
        return "fresh"
    if meta.kind != "ivf":
        return "stale"
    try:
        indexed_ids = spark.read.parquet(f"{path}/indexed").select(meta.id_col)
    except Exception:
        return "stale"
    old_subset = vectors.join(indexed_ids, meta.id_col, "left_semi")
    if content_fingerprint(old_subset, meta.id_col, meta.vec_col) == fp_old:
        return "appendable"
    return "stale"


def load_vector_index(
    spark: SparkSession, path: str, vectors: DataFrame,
    source_dir: str | None = None,
):
    """Rehydrate a saved tier, refreshing it if the vectors table changed.

    Freshness is judged by a CONTENT fingerprint (content_fingerprint),
    not a bare row count — vectors re-embedded under the same ids (force
    re-ingest, kb.py) must never serve stale neighbors:

    - fingerprint matches → load as-is (no training, no assignment);
    - ``ivf`` and the change is a PURE APPEND (the previously-indexed
      ids' content is byte-identical) → ``incremental_index`` the new
      ids against the frozen centroids (FAISS ``add``), then load;
    - any in-place mutation, or ``ivfpq`` with any change → None
      (residual codes should be retrained/re-encoded; caller rebuilds);
    - no saved index / pre-fingerprint meta → None.

    With ``source_dir`` (the directory ``vectors`` was read from) an
    unchanged file listing PROVES the content unchanged (parquet files
    are immutable) and the load skips the corpus scan — the warm-path
    load is then metadata-only. A changed/absent listing only demotes
    to the content check, never to a stale verdict.
    """
    try:
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
    except Exception:
        return None
    try:
        return _load_tier(spark, path, vectors, meta, source_dir)
    except Exception:
        # partially-written/corrupt index dir (e.g. a killed save):
        # fall back to a fresh build rather than failing the query
        return None


def _load_tier(
    spark: SparkSession, path: str, vectors: DataFrame, meta,
    source_dir: str | None = None,
):
    from customkb_spark.embedding.auto import VectorIndexTier

    if meta.kind == "flat":
        # the raw vectors table IS the index — nothing can go stale
        return VectorIndexTier("flat", vectors, meta.id_col, meta.vec_col)
    fp_old = getattr(meta, "fp", None)
    if fp_old is None:
        return None  # pre-fingerprint meta: can't prove freshness → rebuild
    src_fp_old = getattr(meta, "src_fp", None)
    if src_fp_old is not None and dir_fingerprint(source_dir) == src_fp_old:
        fp_now = fp_old  # unchanged listing ⇒ unchanged content
    else:
        fp_now = content_fingerprint(vectors, meta.id_col, meta.vec_col)
    cents = load_centroids(spark, f"{path}/centroids")
    if fp_now != fp_old:
        if meta.kind not in ("ivf", "ivfsq"):
            return None
        # ivf/ivfsq absorb PURE appends (FAISS ``add`` after ``train``
        # — both assignment and the SQ grid are frozen artifacts, so
        # new rows encode deterministically); any in-place re-embed
        # under existing ids invalidates the table. ivfpq could in
        # principle add the same way but is rebuilt: its residual
        # codebooks drift fastest as the corpus grows, and a rebuild
        # doubles as the retrain index_drift would recommend.
        indexed_ids = spark.read.parquet(f"{path}/indexed").select(meta.id_col)
        old_subset = vectors.join(indexed_ids, meta.id_col, "left_semi")
        if content_fingerprint(old_subset, meta.id_col, meta.vec_col) != fp_old:
            return None
        fresh = vectors.join(indexed_ids, meta.id_col, "left_anti")
        if meta.kind == "ivf":
            incremental_index(
                vectors, f"{path}/indexed", cents,
                id_col=meta.id_col, vec_col=meta.vec_col,
            )
        else:
            from customkb_spark.embedding.sq import encode_sq
            from customkb_spark.functions.vector import l2_normalized_frame

            sq_m = load_sq(spark, f"{path}/sq", centroids=cents)
            normed = l2_normalized_frame(
                fresh.select(meta.id_col, meta.vec_col), meta.vec_col
            )
            appended = encode_sq(normed, sq_m, meta.id_col, meta.vec_col)
            if appended.limit(1).count():
                write_ivf_table(appended, f"{path}/indexed", mode="append")
        _write_meta(
            spark, path, meta.kind, vectors.count(), meta.id_col, meta.vec_col,
            fp_now, dir_fingerprint(source_dir),
        )
    indexed = spark.read.parquet(f"{path}/indexed")
    if meta.kind == "ivf":
        return VectorIndexTier(
            "ivf", vectors, meta.id_col, meta.vec_col, centroids=cents, indexed=indexed
        )
    if meta.kind == "ivfsq":
        sq = load_sq(spark, f"{path}/sq", centroids=cents)
        return VectorIndexTier(
            "ivfsq", vectors, meta.id_col, meta.vec_col,
            centroids=cents, indexed=indexed, sq=sq,
        )
    pq = load_pq(spark, f"{path}/pq")
    return VectorIndexTier(
        "ivfpq", vectors, meta.id_col, meta.vec_col,
        centroids=pq.centroids if pq.centroids is not None else cents,
        indexed=indexed, pq=pq,
    )


def index_drift(
    indexed: DataFrame, centroids: np.ndarray, vec_col: str = "vector"
) -> DataFrame:
    """Per-cluster assignment-distance stats: ``cluster_id, n, avg_dist,
    max_dist``. Rising avg distance on fresh appends = the frozen
    centroids no longer describe the data → retrain. One scan, one
    partial-aggregated groupBy."""
    cents = F.array(
        *[F.lit([float(x) for x in c]).cast("array<double>") for c in centroids]
    )
    dist = V.l2_distance(
        F.col(vec_col),
        F.element_at(cents, F.col("cluster_id") + 1),
    )
    return (
        indexed.select("cluster_id", dist.alias("d"))
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("d"), 6).alias("avg_dist"),
            F.round(F.max("d"), 6).alias("max_dist"),
        )
        .orderBy("cluster_id")
    )
