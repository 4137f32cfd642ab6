"""Exact global ranking / curriculum staging — equality with the
single-partition window it replaces, stage balance, plan shape."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from customkb_spark.operators.ranking import curriculum_stages, global_rank


@pytest.fixture()
def scored(spark):
    # heavy signal ties (only 7 distinct values over 500 rows) so the
    # tiebreaker path is what's actually exercised
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("sig"),
    )


def test_global_rank_equals_window_row_number(spark, scored):
    got = {
        r["doc_id"]: r["rank"]
        for r in global_rank(scored, ["sig", "doc_id"]).collect()
    }
    w = Window.orderBy(F.col("sig").asc_nulls_last(), "doc_id")
    want = {
        r["doc_id"]: r["rn"]
        for r in scored.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_nulls_last(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 0.5), (3, 0.1)], "doc_id long, sig double"
    )
    ranks = {r["doc_id"]: r["rank"] for r in global_rank(df, ["sig", "doc_id"]).collect()}
    assert ranks == {3: 1, 2: 2, 1: 3}


def test_global_rank_is_one_range_shuffle_no_global_window(spark, scored):
    plan = (
        global_rank(scored, ["sig", "doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus shuffle is the range partitioning (it appears once
    # per consumer subtree in the textual plan; at runtime AQE reuses
    # the exchange)
    assert "rangepartitioning" in plan
    # the only hash exchange is the per-partition counts agg (rows =
    # partition count, map-side combined), the only SinglePartition
    # exchange is the offsets window over those counts, and the only
    # Window is that offsets window — the data side has NO window and
    # no post-sort re-shuffle (the original sin this operator replaces)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert plan.count("Window") == 1
    assert "BroadcastHashJoin" in plan


def test_curriculum_stage_sizes_and_monotonicity(spark, scored):
    out = curriculum_stages(scored, "sig", n_stages=4).cache()
    sizes = {
        r["curriculum_stage"]: r["n"]
        for r in out.groupBy("curriculum_stage").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # stage boundaries respect the signal order: every stage-s signal
    # <= every stage-(s+1) signal
    bounds = (
        out.groupBy("curriculum_stage")
        .agg(F.min("sig").alias("lo"), F.max("sig").alias("hi"))
        .orderBy("curriculum_stage")
        .collect()
    )
    for a, b in zip(bounds, bounds[1:]):
        assert a["hi"] <= b["lo"] + 1e-9


def test_rank_and_prefix_survive_multiple_arrow_batches(spark):
    """The per-partition running counter/cumsum must carry across
    Arrow batches — invisible at default 10k-row batches, so force
    17-row batches over 2000 rows."""
    from customkb_spark.operators.ranking import global_rank, ordered_prefix_sum

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, "10000")
    spark.conf.set(key, "17")
    try:
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).cast("double").alias("sig"),
            (F.col("id") % 3 + 1).cast("long").alias("w"),
        )
        got = {
            r["doc_id"]: (r["rank"], r["cum"])
            for r in ordered_prefix_sum(
                global_rank(df, ["sig", "doc_id"]),
                ["sig", "doc_id"],
                "w",
                out_col="cum",
            ).collect()
        }
        w = Window.orderBy(F.col("sig").asc_nulls_last(), "doc_id")
        want = {
            r["doc_id"]: (r["rn"], r["cum"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "cum",
                F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set(key, old)


def test_ordered_prefix_sum_equals_window(spark, scored):
    from customkb_spark.operators.ranking import ordered_prefix_sum

    df = scored.withColumn("w", (F.col("doc_id") % 13 + 1).cast("long"))
    got = {
        r["doc_id"]: r["cum"]
        for r in ordered_prefix_sum(df, ["sig", "doc_id"], "w", out_col="cum").collect()
    }
    w = (
        Window.orderBy(F.col("sig").asc_nulls_last(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["doc_id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(w)).collect()
    }
    assert got == want


def test_quality_budget_sample_prefix_semantics(spark):
    from customkb_spark.operators.curation import quality_budget_sample

    docs = spark.createDataFrame(
        [
            (i, ("good clean prose with the and of it was " * (i + 1))[:400])
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    out = quality_budget_sample(docs, token_budget=300).orderBy("cum_tokens")
    rows = out.collect()
    assert rows, "budget admits at least one doc"
    assert rows[-1]["cum_tokens"] <= 300
    # selection order is signal-descending (ties by id): cum_tokens is
    # the running sum in that order, and every selected doc's signal >=
    # every rejected doc's signal (prefix property)
    sel = {r["doc_id"] for r in rows}
    sig = {
        r["doc_id"]: r["signal"]
        for r in quality_budget_sample(docs, token_budget=10**9).collect()
    }
    worst_sel = min((sig[i], -i) for i in sel)
    best_rej = max(((sig[i], -i) for i in sig if i not in sel), default=None)
    if best_rej is not None:
        assert best_rej <= worst_sel


def test_curriculum_single_stage_and_empty(spark, scored):
    one = curriculum_stages(scored, "sig", n_stages=1)
    assert one.filter(F.col("curriculum_stage") != 1).count() == 0
    empty = curriculum_stages(scored.filter("doc_id < 0"), "sig", n_stages=4)
    assert empty.count() == 0
    with pytest.raises(ValueError):
        curriculum_stages(scored, "sig", n_stages=0)
