"""As-of join: backward match semantics, equal-ts inclusion, tolerance,
no-match nulls — checked against hand-computed expectations."""

import datetime as dt

from customkb_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        ["k", "ts", "l_val"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8), "a"), (1, _ts(25), "b"), (1, _ts(40), "c"), (2, _ts(9), "d")],
        ["k", "ts", "r_val"],
    )
    out = {r["l_val"]: r for r in asof_join(left, right, ["k"]).collect()}
    assert out["p1"]["r_val_right"] == "a"      # latest right ≤ 10 is ts=8
    assert out["p2"]["r_val_right"] == "b"      # 25 ≤ 30, not 40
    assert out["p3"]["r_val_right"] is None     # right ts=9 is AFTER left ts=5
    assert out["p1"]["ts_right"] == _ts(8)


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame([(1, _ts(10), "p")], ["k", "ts", "l_val"])
    right = spark.createDataFrame([(1, _ts(10), "same")], ["k", "ts", "r_val"])
    out = asof_join(left, right, ["k"]).collect()[0]
    assert out["r_val_right"] == "same"


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30), "p")], ["k", "ts", "l_val"])
    right = spark.createDataFrame([(1, _ts(5), "old")], ["k", "ts", "r_val"])
    strict = asof_join(left, right, ["k"], tolerance_seconds=600).collect()[0]
    loose = asof_join(left, right, ["k"], tolerance_seconds=3600).collect()[0]
    assert strict["r_val_right"] is None  # 25 min gap > 10 min tolerance
    assert loose["r_val_right"] == "old"


def test_asof_matches_duckdb_semantics(spark, sf_dir):
    """Cross-check on real events vs DuckDB's native ASOF JOIN."""
    import duckdb
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    purchases = events.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter("event_type = 'view'").select("user_id", "ts")
    got = {
        (r["user_id"], r["event_id"]): r["ts_right"]
        for r in asof_join(purchases, views, ["user_id"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        # TIMESTAMP_NS → TIMESTAMP truncates to micros, matching Spark's
        # timestamp_micros(ns div 1000) conversion
        f"CREATE VIEW ev AS SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type"
        f" FROM '{sf_dir}/events.parquet'"
    )
    expected_rows = con.execute(
        """
        SELECT p.user_id, p.event_id, v.ts
        FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts FROM ev WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
        """
    ).fetchall()
    expected = {(u, e): ts for u, e, ts in expected_rows}
    assert got == expected


def test_asof_tiebreak_deterministic(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", "L1")], ["user_id", "ts", "lv"]
    ).withColumn("ts", F.to_timestamp("ts"))
    # three right rows at the SAME (key, ts): tiebreak must pick seq=3
    right = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:05", 1, "A"),
            ("k", "2024-01-01 00:00:05", 3, "C"),
            ("k", "2024-01-01 00:00:05", 2, "B"),
        ],
        ["user_id", "ts", "seq", "rv"],
    ).withColumn("ts", F.to_timestamp("ts"))
    for _ in range(3):  # stable run-to-run
        rows = asof_join(
            left, right, ["user_id"], right_tiebreak_col="seq"
        ).collect()
        assert len(rows) == 1
        assert rows[0]["rv_right"] == "C" and rows[0]["seq_right"] == 3
