"""Event sessionization + time-window aggregation.

The reference has no streaming surface (SURVEY.md §2.11); these are the
batch forms of the standard event-pipeline operators, with streaming
variants in streaming/. Both are single-shuffle plans: partition by
user, order by time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``.

    Returns one row per session: (user, session_id, n_events,
    session_start, session_end). session_id is 1-based per user.
    ``tiebreak_col`` (e.g. event_id) makes ordering deterministic when
    a user has multiple events at the same timestamp.
    """
    order_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev = F.lag(ts_col).over(w)
    # double-epoch: unix_timestamp truncates to whole seconds, merging
    # events gap+0.5s apart; mirrored by epoch() in the SQL oracle
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = events.withColumn("_new", is_new).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_sess.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Tumbling-window aggregate: (window_start, key, n, total).

    ``total`` is summed in decimal then cast to double so results are
    deterministic (order-independent) and oracle-comparable.
    """
    return (
        events.groupBy(
            F.date_trunc(unit, F.col(ts_col)).alias("window_start"),
            F.col(key_col).alias(key_col),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: per user, the furthest step reached with
    each step strictly after the previous one in event time.

    Returns (user, steps_completed, step_name). One shuffle (partition
    by user); per-user progress is a min-timestamp cascade — step k's
    earliest occurrence AFTER step k-1's earliest valid occurrence —
    computed with conditional aggregation, no UDFs, no self-joins (the
    naive k-way self-join explodes at scale; this is one pass).
    """
    order_cols = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    seq = F.struct(*order_cols)
    per_user = events.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, seq)).alias(f"_first_{k}")
            for k, s in enumerate(steps)
        ],
        *[
            F.array_sort(
                F.collect_list(F.when(F.col(type_col) == s, seq))
            ).alias(f"_all_{k}")
            # step 0 only needs its min — never collect the (typically
            # highest-volume) first step's full event list
            for k, s in enumerate(steps)
            if k >= 1
        ],
    )
    # cascade: t0 = first step-0; t_k = earliest step-k occurrence > t_{k-1}.
    # each _cur_k is materialized in its own select so the filter lambda
    # references an attribute, not a re-evaluated nested expression
    cascaded = per_user.withColumn("_cur_0", F.col("_first_0"))
    for k in range(1, len(steps)):
        prev = F.col(f"_cur_{k - 1}")
        cascaded = cascaded.withColumn(
            f"_cur_{k}",
            F.array_min(
                F.filter(F.col(f"_all_{k}"), lambda x: prev.isNotNull() & (x > prev))
            ),
        )
    reached = F.lit(0)
    for k in range(len(steps)):
        reached = F.when(F.col(f"_cur_{k}").isNotNull(), k + 1).otherwise(reached)
    step_name = F.element_at(
        F.array(*[F.lit(s) for s in steps]), F.greatest(reached, F.lit(1))
    )
    return cascaded.select(
        F.col(user_col),
        reached.alias("steps_completed"),
        F.when(reached > 0, step_name).alias("furthest_step"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period, counted in each later period they were active.

    Returns ``cohort, period, periods_since (0 = the cohort period),
    active_users``.

    Two partial-aggregated shuffles on ``user_col`` (first-activity min
    and the distinct activity periods come out of the SAME hash
    partitioning, so AQE reuses the exchange), then one small groupBy
    over (cohort, period) — a result bounded by periods², never by
    events. No windows, no self-joins over raw events.
    """
    # DATE-typed buckets (day granularity is inherent to cohorts; also
    # what ANSI date_trunc-on-week returns in most engines)
    bucket = F.date_trunc(unit, F.col(ts_col)).cast("date")
    first = events.groupBy(user_col).agg(F.min(bucket).alias("cohort"))
    activity = events.select(F.col(user_col), bucket.alias("period")).distinct()
    per_day = {"week": 7, "day": 1}.get(unit)
    since = (
        (F.datediff("period", "cohort") / per_day).cast("long")
        if per_day
        else F.months_between("period", "cohort").cast("long")
    )
    return (
        activity.join(first, user_col)
        .groupBy("cohort", "period")
        .agg(F.count_distinct(user_col).cast("long").alias("active_users"))
        .select(
            "cohort", "period", since.alias("periods_since"), "active_users"
        )
    )
