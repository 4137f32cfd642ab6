"""Streaming windowed aggregation + custom stateful sessionization.

The reference has no streaming runtime (SURVEY.md §2.11); these are the
Structured-Streaming upgrades of its batch shapes:

- ``streaming_window_agg``: event-time tumbling/sliding windows with a
  watermark — the streaming twin of operators/sessionize.
  tumbling_window_agg. Late rows beyond the watermark are dropped and
  window state is evicted, so state size is bounded by (watermark span ×
  active keys), not by stream length — the property that matters on an
  unbounded 100 TB/day stream.
- ``streaming_sessionize``: gap-based sessions via
  ``applyInPandasWithState`` — the custom stateful operator pattern
  (per-key state = open session accumulator; timeout closes sessions).
  Batch twin: operators/sessionize.sessionize (lag + cumsum).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def session_schema(key_name: str = "user_id", key_type: T.DataType | None = None) -> T.StructType:
    """Output schema parameterized by the session key (name AND type
    must match the grouping column or Arrow conversion fails)."""
    return T.StructType(
        [
            T.StructField(key_name, key_type or T.LongType(), False),
            T.StructField("session_start", T.TimestampType(), True),
            T.StructField("session_end", T.TimestampType(), True),
            T.StructField("n_events", T.LongType(), False),
        ]
    )


SESSION_SCHEMA = session_schema()

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("end_ms", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def streaming_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time window aggregate (count + decimal-summed
    total, mirroring the batch tumbling_window_agg output)."""
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n", "total")
    )


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful operator: per-user gap sessions with
    applyInPandasWithState.

    State per user = the open session (start, end, count). An event
    within ``gap_minutes`` of the open session extends it; a later event
    closes it (emits a row) and opens a new one. The processing-time
    timeout flushes sessions for users that go quiet. State is O(1) per
    active user — the bounded-state property the flag-polling reference
    loop lacks.
    """
    gap_ms = gap_minutes * 60 * 1000

    def handle(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_key = key[0]
        if state.hasTimedOut:
            if state.exists:
                start_ms, end_ms, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        user_col: [user_key],
                        "session_start": [pd.Timestamp(start_ms, unit="ms")],
                        "session_end": [pd.Timestamp(end_ms, unit="ms")],
                        "n_events": [n],
                    }
                )
            return

        ts = pd.concat([p[ts_col] for p in pdfs]).sort_values()
        ms = (ts.astype("int64") // 1_000_000).tolist()
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            cur_start, cur_end, cur_n = state.get
        else:
            cur_start, cur_end, cur_n = None, None, 0
        for t in ms:
            if cur_start is None:
                cur_start, cur_end, cur_n = t, t, 1
            elif t - cur_end <= gap_ms:
                # extend; late (out-of-order) events must never shrink
                # the open session's bounds
                cur_start = min(cur_start, t)
                cur_end = max(cur_end, t)
                cur_n += 1
            else:
                closed.append((cur_start, cur_end, cur_n))
                cur_start, cur_end, cur_n = t, t, 1
        state.update((cur_start, cur_end, cur_n))
        state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [user_key] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    out_schema = session_schema(user_col, events.schema[user_col].dataType)
    return events.select(user_col, ts_col).groupBy(user_col).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
