"""Bucketed storage for co-located joins — the 100 TB layout story.

The engine's hot joins are all keyed on chunk id or sourcedoc:
vectors ⋈ chunks (hit lookup), context range join, per-doc windows.
On a cluster, writing both sides BUCKETED BY the join key into the
catalog means those joins read pre-partitioned data and plan with NO
Exchange on either side — the shuffle happens once at write time,
then every query amortizes it.

Plain ``.write.parquet`` cannot express this (bucket metadata lives in
the catalog), so these helpers go through ``saveAsTable``. In this
repo's tests the catalog is Spark's default local warehouse; on a real
deployment it's the metastore/lakehouse catalog.

``spark.sql.sources.bucketing.enabled`` is on by default; readers must
keep ``spark.sql.shuffle.partitions`` ≥ bucket count or Spark may
still re-shuffle one side (AQE handles the mismatch in 3.2+).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed (and optionally sorted
    within buckets) by the join key. Sorting by (bucket_col, sid)-style
    keys additionally enables sort-merge joins with NO sort step."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(bucket_col, sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two co-bucketed tables — with matching bucket specs the
    physical plan contains no Exchange on either input (asserted in
    tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)
