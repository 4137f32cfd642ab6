"""Exact global ranking and curriculum staging at scale.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the
classic Spark scale trap: Catalyst moves the whole corpus to one
partition (the WindowExec warning). But exact global ranks ARE
computable at 100 TB with the TeraSort shape — ONE range shuffle plus
bounded bookkeeping:

1. ``repartitionByRange`` on the full sort key (the key includes a
   unique id, so equal signal values cannot straddle a boundary
   ambiguously — the total order is unique and the rank well-defined
   regardless of where sampling puts the boundaries) +
   ``sortWithinPartitions`` — together the distributed sort;
2. a per-partition LOCAL row index from an Arrow-batched running
   counter (``mapInPandas`` — batches arrive in partition order, the
   counter is O(1) memory, the index column is one ``np.arange`` per
   batch). A window over ``spark_partition_id()`` would be the
   declarative spelling, but Catalyst cannot see that the rows are
   already clustered by construction and inserts a SECOND corpus-sized
   hash shuffle — the per-partition scan is the one thing DataFrame
   algebra can't express, the same sanction as the rolling-hash cumsum
   in ``dedup._rk_window_hashes``;
3. per-partition counts → cumulative offsets. The offsets table has
   one row per shuffle partition — bounded by cluster parallelism,
   genuinely broadcastable (unlike per-domain offsets in
   ``urls.domain_frequency_cap``, whose key space is data-sized).
   Both consumers of the ranked lineage (counts, final join) hang off
   one deterministic subtree — RangePartitioner's sample seed is fixed
   per partition index, so even a recompute lands identical
   boundaries, and within one action AQE reuses the exchange.

``global_rank`` is the utility; ``curriculum_stages`` builds the
training-data use on top: order the corpus by a difficulty/quality
signal and cut it into ``n_stages`` equal quantile bins — curriculum
learning's data-side half (Bengio et al. 2009), the standard way
pretraining runs schedule "clean → hard" data. The stage formula is
``1 + floor((rank-1) * n_stages / total)`` — contiguous, monotone in
the signal, sizes differing by at most one — chosen over SQL NTILE's
remainder-first-groups rule because the closed form mirrors textually
into the DuckDB oracle (both sides compute the identical expression
from the identical rank).

Determinism: ranks depend only on the (signal, id) total order, not on
partition boundaries or sampling, so reruns and engine ports agree
exactly. NULL signals sort LAST (matching DuckDB's default) — callers
filter them out when NULL means "unscored".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number under ``order_by`` (extended
    with nothing — pass a unique tiebreaker yourself; a non-unique key
    leaves peer order partition-dependent). One range shuffle; no
    single-partition window; offsets bounded by the partition count.

    The partition count is ALWAYS passed explicitly (default: the
    session's shuffle parallelism). This is load-bearing, not
    cosmetic: the ranked lineage is consumed twice (counts, final
    join), and with an implicit count AQE coalesces the range
    exchange's partitions independently per consumer — the two sides
    then disagree on ``spark_partition_id()`` and the offsets join
    silently drops rows (observed: one side coalesced to 1 partition,
    the other kept 8, 7/8 of the corpus vanished). An explicit count
    makes the shuffle REPARTITION_BY_NUM, which AQE never rewrites, so
    both consumers see identical pids; boundaries are deterministic
    too (RangePartitioner's sample seed is fixed per partition index).
    """
    import numpy as np
    from pyspark.sql import types as T

    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    cols = [c.asc_nulls_last() for c in cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("_r", T.LongType())]
    )

    def add_local_index(batches):
        n = 0
        for pdf in batches:
            pdf = pdf.assign(_r=np.arange(n, n + len(pdf), dtype="int64"))
            n += len(pdf)
            yield pdf

    local = ranged.mapInPandas(add_local_index, out_schema)
    # counts come from `ranged`, NOT `local`: the per-pid row count
    # doesn't need the local index, and aggregating the pre-Python
    # frame means the offsets job re-reads the shuffle files without a
    # second Arrow round-trip through the mapInPandas stage
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    # the offsets window IS partitionless — over ≤ num_partitions rows
    # (cluster parallelism, not data size), the same bounded-window
    # argument as fusion's FUSION_INPUT_BOUND
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_r") + F.col("_off") + 1).cast("long"))
        .drop("_pid", "_r", "_off")
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_by: list[Column | str],
    weight_col: str,
    out_col: str = "cum_weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE prefix sum of ``weight_col`` under the global
    ``order_by`` total order — ``sum(w) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING)`` without the single-partition window, same
    TeraSort shape (and the same explicit-partition-count AQE guard)
    as :func:`global_rank`. Descending keys: pass a negated column
    (``-F.col("sig")``) — sort direction can't be attached to a bare
    Column portably, and negation is exact for numerics.

    Integral weights accumulate in int64, fractional in float64 (a
    float prefix sum IS order-dependent in the last ulps; the total
    order makes it deterministic, and the oracle convention rounds).
    """
    import numpy as np
    from pyspark.sql import types as T

    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    cols = [c.asc_nulls_last() for c in cols]
    integral = isinstance(
        df.schema[weight_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    np_t, sql_t = ("int64", T.LongType()) if integral else ("float64", T.DoubleType())
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("_cw", sql_t)]
    )

    def add_local_cumsum(batches):
        run = np.zeros(1, dtype=np_t)[0]
        for pdf in batches:
            w = pdf[weight_col].to_numpy(dtype=np_t, na_value=0)
            c = np.cumsum(w, dtype=np_t) + run
            run = c[-1] if len(c) else run
            yield pdf.assign(_cw=c)

    local = ranged.mapInPandas(add_local_cumsum, out_schema)
    # per-pid totals off the pre-Python frame (see global_rank)
    totals = ranged.groupBy("_pid").agg(F.sum(weight_col).cast(sql_t).alias("_t"))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(woff), F.lit(0).cast(sql_t)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_cw") + F.col("_off")).cast(sql_t))
        .drop("_pid", "_cw", "_off")
    )


def curriculum_stages(
    df: DataFrame,
    signal_col: str,
    n_stages: int = 4,
    id_col: str = "doc_id",
    rank_col: str = "corpus_rank",
    stage_col: str = "curriculum_stage",
) -> DataFrame:
    """Order the corpus by ``signal_col`` (ascending = easiest/cleanest
    first; ties broken by ``id_col``) and assign each row its exact
    quantile stage ``1..n_stages`` via ``1 + floor((rank-1)*n/total)``.
    Adds ``rank_col`` and ``stage_col``; one range shuffle + one scalar
    count, no corpus-wide window."""
    if n_stages < 1:
        raise ValueError("n_stages must be >= 1")
    total = df.count()
    ranked = global_rank(df, [signal_col, id_col], rank_col=rank_col)
    if total == 0:
        return ranked.withColumn(stage_col, F.lit(None).cast("long"))
    return ranked.withColumn(
        stage_col,
        (
            1
            + F.floor(
                (F.col(rank_col) - 1) * F.lit(n_stages) / F.lit(total)
            )
        ).cast("long"),
    )
