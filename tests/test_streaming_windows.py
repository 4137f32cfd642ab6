"""Streaming windows: watermarked agg matches batch twin; stateful
sessionization emits closed sessions with bounded state."""

import time

from pyspark.sql import functions as F

from customkb_spark.operators.sessionize import tumbling_window_agg
from customkb_spark.streaming import windows as SW


def test_streaming_window_agg_matches_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(events.dtypes).get("ts")
    if ts_type == "bigint":
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # watermarks require the session-tz TIMESTAMP type
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    agg = SW.streaming_window_agg(stream, watermark="2 hours")
    # complete mode: a finite replay's watermark never passes the last
    # windows, so append would withhold them; complete emits all state
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in tumbling_window_agg(events, "ts", "event_type", "value", "hour").collect()
    }
    assert got == expected


def test_streaming_sessionize_closes_on_gap(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),  # same session
        (1, base + dt.timedelta(minutes=90)),  # gap > 30min → closes first
        (2, base),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    sessions = SW.streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess").collect()
    # the closed session for user 1 (2 events, 10 min span) must be out;
    # open sessions (user 1's second, user 2's only) stay in state
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["n_events"] == 2
    assert (r["session_end"] - r["session_start"]).total_seconds() == 600
