"""Bucketed storage layout — the 100 TB co-location story made real.

The KB's hot per-document operators all key on ``sourcedoc``:
the per-doc sid window (W4), the context range join (J2), chunk
statistics (A6), categorize's per-doc sampling (T6). On a plain
parquet table each of those is one hash exchange of the corpus. With
the chunks table written BUCKETED by sourcedoc (Spark's bucketBy —
hive-style layout in the session catalog), FileSourceScanExec reports
the bucketing to the planner and every groupBy/window/join keyed on
sourcedoc reads pre-partitioned data: the exchange disappears from the
plan (asserted in tests/test_plans.py::test_bucketed_groupby_no_exchange).

At 100 TB this is the difference between "every retrieval shuffles the
corpus once" and "only ingest pays the shuffle, every query after it
is exchange-free". Directory partitioning (``partitionBy``) cannot do
this — it prunes scans but carries no co-location guarantee the
planner can use; bucketing does.

Notes for cluster use:
- bucket count should target HDFS-block-sized buckets at full scale
  (e.g. 100 TB / 256 MB ≈ 400k buckets is too many files per write
  task — in practice 4-16k buckets with multiple blocks each);
- ``spark.sql.sources.bucketing.enabled`` (default true) must stay on,
  and readers must come through the catalog (``spark.table``), not the
  path, for the planner to see the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "sourcedoc",
    n_buckets: int = 8,
    sort_col: str | None = "sid",
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and per-bucket sorted) catalog
    table. Sorting by the in-document sequence makes the sid window a
    pure streaming pass over each bucket file."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(bucket_col, sort_col)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — REQUIRED for the planner to use the bucket spec
    (a path read of the same files loses it)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
