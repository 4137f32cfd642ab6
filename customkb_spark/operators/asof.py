"""As-of join — for each left row, the most recent right row at or
before its timestamp (backward direction), per key.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The naive
formulations — a per-row correlated subquery, or an inequality join +
per-left-row top-1 — shuffle L×R candidate pairs. This implementation
is the scalable union-scan form:

    tag left/right → union → ONE shuffle on (key) → sort within
    partition by (ts, side) → running last_value(right payload) →
    keep left rows.

Cost is one shuffle of |L| + |R| rows total (same as a groupBy), no
pair blowup, no skew amplification beyond the key distribution itself.
``tolerance`` bounds how stale a match may be (reference semantics of
pandas merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    right_tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row with
    ``right.ts <= left.ts`` on the same key.

    Right rows at exactly the same timestamp DO match (<=). Left rows
    with no prior right row keep NULLs (left-outer semantics; filter
    the joined ts column for inner). Right value columns are suffixed.

    ``right_tiebreak_col``: when several right rows share the same
    (key, ts), the one with the GREATEST tiebreak value wins,
    deterministically. Without it, which of the tied right payloads a
    left row matches is undefined run-to-run (the window order over
    tied rows is unspecified).
    """
    rvals = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != ts_col
    ]
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rvals],
    )
    lvals = [c for c in left.columns if c not in key_cols and c != ts_col]
    tb_right = (
        F.col(right_tiebreak_col)
        if right_tiebreak_col is not None
        else F.lit(0)
    )
    r = right.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts BEFORE left at equal ts → <= matches
        tb_right.alias("_tb"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lvals],
    )
    l = left.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        *[F.col(c) for c in lvals],
    )
    l = l.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType)).select(r.columns)
    unioned = r.unionByName(l)
    # ascending _tb → among right rows tied on (key, ts) the running
    # last_value sees the greatest tiebreak LAST, so it wins; left rows
    # carry NULL _tb, which is irrelevant (side 1 sorts after side 0)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    # JOIN semantics: NULL keys never match (Window.partitionBy would
    # group them together — null out their matches)
    null_key = None
    for k in key_cols:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    matched = matched.withColumn("_m", F.when(~null_key, F.col("_m")))
    if tolerance_seconds is not None:
        # double-epoch keeps sub-second precision (unix_timestamp
        # truncates to whole seconds)
        fresh = (
            F.col("_ts").cast("double")
            - F.col("_m")[f"{ts_col}{suffix}"].cast("double")
        ) <= tolerance_seconds
        matched = matched.withColumn("_m", F.when(fresh, F.col("_m")))
    out_cols = [F.col(c) for c in key_cols]
    out_cols.append(F.col("_ts").alias(ts_col))
    out_cols += [F.col(c) for c in lvals]
    out_cols += [
        F.col("_m")[f"{ts_col}{suffix}"].alias(f"{ts_col}{suffix}"),
        *[F.col("_m")[f"{c}{suffix}"].alias(f"{c}{suffix}") for c in rvals],
    ]
    return matched.select(*out_cols)
