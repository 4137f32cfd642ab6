"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production targets a
multi-executor cluster. All scale-sensitive knobs (AQE, shuffle
partitions, Arrow) are set here so every entry point gets the same
execution profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-timezone is pinned to UTC so timestamp semantics match the
# DuckDB oracle (DuckDB parquet timestamps are UTC-naive).
_BASE_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 100 TB note: autoBroadcastJoinThreshold stays default (10 MB); we
    # broadcast explicitly where the small side is provably bounded
    # (top-k hit sets, dimension tables, query batches).
    "spark.sql.parquet.filterPushdown": "true",
    # The driver's events table stores TIMESTAMP(NANOS) (unsupported by
    # Spark's reader) — read as long and convert (see schema.read_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "customkb_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32 (the driver's local
    harness); on a real cluster the master is taken from the environment
    and this arg is ignored.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name)
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session
    (the verify driver hands us its own SparkSession)."""
    for k, v in _BASE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static confs on a running session — ignore
            pass
    return spark
