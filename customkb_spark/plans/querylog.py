"""Query log sink — reference S11 (query/processing.py:134-146):
append (ts, kb, query, elapsed, n_results) per query to a log table.

An append-only table keyed by day gives the reference's logs/query.log
semantics with partition pruning for retention/analytics; the write is
a single tiny row batch per query (driver-side), so it never touches
the cluster's hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def log_query(
    spark: SparkSession,
    log_path: str,
    kb: str,
    query_text: str,
    elapsed_s: float,
    n_results: int,
) -> None:
    from customkb_spark.functions.security import mask_sensitive_col

    row = spark.createDataFrame(
        [(kb, query_text, float(elapsed_s), int(n_results))],
        "kb string, query string, elapsed_s double, n_results int",
    ).select(
        F.current_timestamp().alias("ts"),
        F.to_date(F.current_timestamp()).alias("day"),
        "kb",
        # reference mask_sensitive_data before anything reaches a log:
        # a pasted API key must not be persisted in the query log table
        mask_sensitive_col("query").alias("query"),
        "elapsed_s",
        "n_results",
    )
    row.write.mode("append").partitionBy("day").parquet(log_path)


def read_query_log(spark: SparkSession, log_path: str) -> DataFrame:
    return spark.read.parquet(log_path)


def query_stats(log: DataFrame) -> DataFrame:
    """Per-day latency/result aggregates over the log table."""
    return log.groupBy("day", "kb").agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg("elapsed_s"), 6).alias("avg_elapsed_s"),
        F.round(F.max("elapsed_s"), 6).alias("max_elapsed_s"),
        F.round(F.avg("n_results"), 6).alias("avg_results"),
    )
