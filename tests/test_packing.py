"""Sequence packing, hash splits, and DSIR importance weights."""

import math

from pyspark.sql import functions as F

from customkb_spark.operators import curation as C
from customkb_spark.operators import packing as P


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["source", "doc_id", "text"])


# ------------------------------------------------------- pack_segments


def test_pack_segments_layout(spark):
    # tokens: d1=3, d2=4, d3=2 in one shard; seq_len=4
    # offsets: d1 [0,3), d2 [3,7), d3 [7,9)
    df = _docs(
        spark,
        [("s", 1, "a b c"), ("s", 2, "d e f g"), ("s", 3, "h i")],
    )
    seg = P.pack_segments(df, 4).orderBy("doc_id", "pack_id").collect()
    got = [(r.doc_id, r.pack_id, r.seg_tokens) for r in seg]
    assert got == [(1, 0, 3), (2, 0, 1), (2, 1, 3), (3, 1, 1), (3, 2, 1)]


def test_pack_segments_token_conservation(spark, documents):
    seg = P.pack_segments(documents, 128)
    per_doc = seg.groupBy("doc_id").agg(
        F.sum("seg_tokens").alias("s"), F.first("n_tokens").alias("n")
    )
    assert per_doc.filter(F.col("s") != F.col("n")).count() == 0
    # every pack except each shard's last holds exactly seq_len tokens
    summary = P.pack_summary(seg)
    last = summary.groupBy("source").agg(F.max("pack_id").alias("pack_id"))
    short = summary.join(last, ["source", "pack_id"], "left_anti").filter(
        F.col("pack_tokens") != 128
    )
    assert short.count() == 0


def test_pack_segments_doc_spanning_many_packs(spark):
    df = _docs(spark, [("s", 1, " ".join(["t"] * 10))])
    seg = P.pack_segments(df, 3).orderBy("pack_id").collect()
    assert [r.seg_tokens for r in seg] == [3, 3, 3, 1]
    assert [r.pack_id for r in seg] == [0, 1, 2, 3]


def test_pack_segments_drops_empty_docs(spark):
    df = _docs(spark, [("s", 1, "!!!"), ("s", 2, "a b")])
    seg = P.pack_segments(df, 4)
    assert [r.doc_id for r in seg.collect()] == [2]


def test_pack_segments_shards_independent(spark):
    # two shards pack from offset 0 each — no cross-shard coupling
    df = _docs(spark, [("s1", 1, "a b c"), ("s2", 2, "d e")])
    seg = {(r.source, r.pack_id) for r in P.pack_segments(df, 4).collect()}
    assert seg == {("s1", 0), ("s2", 0)}


def test_pack_append_equals_rebuild(spark, documents):
    old = documents.filter(F.col("doc_id") % 5 != 0)
    new = documents.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000  # new ids sort after old
    )
    full = P.pack_segments(old.unionByName(new), 128)
    base = P.pack_summary(P.pack_segments(old, 128))
    incr = P.pack_segments(old, 128).unionByName(P.pack_append(base, new, 128))
    key = lambda r: (r.source, r.doc_id, r.pack_id, r.seg_tokens)  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, incr.collect()))


def test_pack_append_new_shard_starts_at_zero(spark):
    old = _docs(spark, [("s1", 1, "a b c")])
    base = P.pack_summary(P.pack_segments(old, 4))
    new = _docs(spark, [("s2", 2, "d e")])
    seg = P.pack_append(base, new, 4).collect()
    assert [(r.source, r.pack_id, r.seg_tokens) for r in seg] == [("s2", 0, 2)]


# ------------------------------------------------------ running_total


def test_running_total_matches_global_window(spark):
    from pyspark.sql import Window

    from customkb_spark.operators.windows import running_total

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("v")
    )
    got = running_total(df, "k", "v", n_buckets=16, out_col="rt")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rt", F.sum("v").over(w))
    assert got.select("k", "rt").exceptAll(want.select("k", "rt")).count() == 0
    assert want.select("k", "rt").exceptAll(got.select("k", "rt")).count() == 0


def test_running_total_no_global_sort_exchange(spark):
    from customkb_spark.operators.windows import running_total

    df = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = (
        running_total(df, "k", "v", n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side window must be hash-partitioned by bucket, never
    # SinglePartition; the only allowed single-partition window is over
    # the <= n_buckets offsets table
    assert "hashpartitioning(_rt_bucket" in plan


def test_pack_segments_global_matches_sharded_single_source(spark):
    rows = [("s", i, " ".join(["w"] * (i % 7 + 1))) for i in range(200)]
    df = _docs(spark, rows)
    per_shard = {
        (r.doc_id, r.pack_id, r.seg_tokens)
        for r in P.pack_segments(df, 32, shard_col="source").collect()
    }
    global_ = {
        (r.doc_id, r.pack_id, r.seg_tokens)
        for r in P.pack_segments(df, 32, shard_col=None).collect()
    }
    assert per_shard == global_


# ------------------------------------------------------- assign_splits


def test_assign_splits_deterministic_and_exhaustive(spark, documents):
    a = P.assign_splits(documents, "doc_id").select("doc_id", "split")
    b = P.assign_splits(documents, "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0
    assert a.filter(~F.col("split").isin("train", "validation", "test")).count() == 0


def test_assign_splits_fractions(spark):
    n = 20000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    counts = dict(
        P.assign_splits(df, "doc_id", {"train": 0.8, "validation": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .collect()
    )
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["validation"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01


def test_assign_splits_rejects_bad_weights(spark):
    import pytest

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1.0"):
        P.assign_splits(df, "doc_id", {"train": 0.5, "validation": 0.2})


def test_assign_splits_stable_under_corpus_growth(spark):
    small = spark.range(1000).withColumnRenamed("id", "doc_id")
    big = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = P.assign_splits(small, "doc_id").select("doc_id", "split")
    b = P.assign_splits(big, "doc_id").select("doc_id", "split")
    joined = a.join(b.withColumnRenamed("split", "split2"), "doc_id")
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0


# ---------------------------------------------------- dsir_log_weights


def test_dsir_prefers_target_like_docs(spark):
    rows = [("t", i, "alpha beta gamma delta") for i in range(20)] + [
        ("r", 100 + i, "zulu yankee xray whiskey") for i in range(20)
    ]
    # a raw doc written in the target's vocabulary must outscore one
    # written in the raw corpus's vocabulary
    rows += [("r", 900, "alpha beta gamma delta"), ("r", 901, "zulu yankee xray whiskey")]
    df = _docs(spark, rows)
    w = {
        r.doc_id: r.log_weight
        for r in C.dsir_log_weights(df, F.col("source") == "t").collect()
    }
    assert w[900] > 0 > w[901]
    assert w[900] > w[901]


def test_dsir_weight_is_sum_of_bucket_ratios(spark):
    # single doc, single token: weight == ln(p_t/p_r) for its bucket
    df = _docs(spark, [("t", 1, "aaa"), ("r", 2, "aaa")])
    out = {r.doc_id: r for r in C.dsir_log_weights(df, F.col("source") == "t").collect()}
    # bucket counts: c_t=1, c_r=1, n_t=1, n_r=1 → ratio = ln(1.5/129)-ln(1.5/129) = 0
    assert out[1].n_tokens == 1
    assert abs(out[1].log_weight) < 1e-9
    assert abs(out[2].log_weight) < 1e-9


def test_dsir_counts_all_tokens(spark, documents):
    out = C.dsir_log_weights(documents, F.col("source") == documents.select("source").first()[0])
    n_docs_with_tokens = documents.filter(F.size(F.split(F.lower("text"), "[^a-z0-9]+")) > 0).count()
    assert out.count() <= documents.count()
    assert out.filter(F.col("n_tokens") <= 0).count() == 0
    assert out.count() > 0 and n_docs_with_tokens > 0


def test_dsir_train_apply_matches_batch_scorer(spark, documents):
    pred = F.col("source") == "src0"
    model = C.dsir_train(documents, pred)
    applied = {
        r.doc_id: (r.n_tokens, r.log_weight)
        for r in C.dsir_apply(documents, model).select(
            "doc_id", "n_tokens", "log_weight"
        ).collect()
    }
    batch = {
        r.doc_id: (r.n_tokens, r.log_weight)
        for r in C.dsir_log_weights(documents, pred).collect()
    }
    # every token bucket appears in the trained model (trained on the
    # same corpus), so the stateless scorer must agree bit-for-bit
    for doc_id, want in batch.items():
        assert applied[doc_id] == want


def test_dsir_apply_is_streamable(spark, tmp_path):
    rows = [(1, "alpha beta"), (2, "gamma delta"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    model = C.dsir_train(df, F.col("doc_id") == 1)
    src = str(tmp_path / "dsrc")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        C.dsir_apply(stream, model)
        .writeStream.format("memory")
        .queryName("dsir_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: (r.n_tokens, r.log_weight) for r in spark.sql("SELECT * FROM dsir_out").collect()}
    exp = {
        r.doc_id: (r.n_tokens, r.log_weight)
        for r in C.dsir_apply(df, model).collect()
    }
    assert got == exp and len(got) == 4
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0)  # NULL text scores 0, not NULL


def test_dsir_plan_broadcasts_ratio_table(spark, documents):
    out = C.dsir_log_weights(documents, F.col("source") == "src0")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------- streaming packing


def test_streaming_pack_maintenance_matches_batch(spark, tmp_path):
    """In-order micro-batches — including across a stream restart —
    produce exactly the batch layout; per-epoch overwrite keeps the
    sink idempotent and the offsets sidecar invisible to readers."""
    from customkb_spark.streaming.incremental import incremental_pack_maintenance

    rows = [("s%d" % (i % 3), i, " ".join(["w"] * (i % 9 + 1))) for i in range(90)]
    df = _docs(spark, rows)
    src = str(tmp_path / "pk_src")
    seg_dir = str(tmp_path / "pk_seg")
    ckpt = str(tmp_path / "pk_ckpt")

    def run():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        incremental_pack_maintenance(stream, seg_dir, ckpt, seq_len=16).awaitTermination(120)

    key = lambda r: (r.source, r.doc_id, r.pack_id, r.seg_tokens)  # noqa: E731
    # two in-order micro-batches in the first run
    df.filter(F.col("doc_id") < 30).coalesce(1).write.parquet(src)
    df.filter(F.col("doc_id").between(30, 59)).coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(map(key, spark.read.parquet(seg_dir).collect()))
    want = sorted(map(key, P.pack_segments(df.filter(F.col("doc_id") < 60), 16).collect()))
    assert got == want

    # a RESTARTED stream continues each shard's offsets where the
    # previous run stopped (offsets sidecar, not a corpus rescan)
    df.filter(F.col("doc_id") >= 60).coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(map(key, spark.read.parquet(seg_dir).collect()))
    want = sorted(map(key, P.pack_segments(df, 16).collect()))
    assert got == want


def test_pack_segments_window_is_shard_partitioned(spark, documents):
    plan = (
        P.pack_segments(documents, 128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cumsum window must partition by the shard key — a
    # SinglePartition window over the corpus is the 100-TB cliff
    assert "SinglePartition" not in plan
    assert "hashpartitioning(source" in plan


def test_assign_splits_nested_under_fraction_change(spark):
    """Same seed: shrinking train's fraction only REMOVES rows from
    train (threshold comparison on a fixed per-row draw) — the nesting
    property scaling-law data budgets rely on."""
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    big = {
        r.doc_id
        for r in P.assign_splits(df, "doc_id", {"train": 0.9, "test": 0.1})
        .filter(F.col("split") == "train").collect()
    }
    small = {
        r.doc_id
        for r in P.assign_splits(df, "doc_id", {"train": 0.5, "test": 0.5})
        .filter(F.col("split") == "train").collect()
    }
    assert small < big


def test_pack_append_chains_across_batches(spark):
    """Appending in two steps equals appending once (and equals the
    full rebuild): offsets accumulate exactly."""
    rows = [("s%d" % (i % 2), i, " ".join(["w"] * (i % 5 + 1))) for i in range(90)]
    df = _docs(spark, rows)
    a = df.filter(F.col("doc_id") < 30)
    b = df.filter(F.col("doc_id").between(30, 59))
    c = df.filter(F.col("doc_id") >= 60)
    seg_a = P.pack_segments(a, 16)
    seg_b = P.pack_append(P.pack_summary(seg_a), b, 16)
    seg_c = P.pack_append(P.pack_summary(seg_a.unionByName(seg_b)), c, 16)
    chained = seg_a.unionByName(seg_b).unionByName(seg_c)
    full = P.pack_segments(df, 16)
    key = lambda r: (r.source, r.doc_id, r.pack_id, r.seg_tokens)  # noqa: E731
    assert sorted(map(key, chained.collect())) == sorted(map(key, full.collect()))


def test_streaming_pack_cleared_checkpoint_refuses(spark, tmp_path):
    """A new/cleared checkpoint against an existing multi-epoch
    segments dir restarts epoch_id at 0 — the handler must refuse
    instead of overwriting epoch 0 and re-basing offsets (ADVICE r3).
    Legitimate same-epoch replays (max epoch == epoch_id) stay allowed
    — that is the per-epoch-overwrite idempotency contract."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from customkb_spark.streaming.incremental import incremental_pack_maintenance

    rows = [("s0", i, "w w w") for i in range(20)]
    df = _docs(spark, rows)
    src = str(tmp_path / "cc_src")
    seg_dir = str(tmp_path / "cc_seg")

    def run(ckpt):
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        incremental_pack_maintenance(
            stream, seg_dir, ckpt, seq_len=8
        ).awaitTermination(120)

    # first run: two micro-batches → epochs 0 and 1 persisted
    df.filter(F.col("doc_id") < 10).coalesce(1).write.parquet(src)
    df.filter(F.col("doc_id") >= 10).coalesce(1).write.mode("append").parquet(src)
    run(str(tmp_path / "cc_ckpt1"))
    epochs = {r.epoch for r in spark.read.parquet(f"{seg_dir}/_offsets").collect()}
    assert epochs == {0, 1}

    # second run with a FRESH checkpoint: epoch_id restarts at 0 < 1
    with pytest.raises(StreamingQueryException, match="checkpoint"):
        run(str(tmp_path / "cc_ckpt2"))
