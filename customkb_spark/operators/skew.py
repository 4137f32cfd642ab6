"""Skew mitigation — salted aggregation and salted join helpers.

AQE's skew-join splitting (enabled in session.py) handles moderate
skew at runtime; these helpers are for the pathological cases a
100 TB corpus actually produces — a groupBy key held by 1% of all rows
(empty-string text hash, boilerplate LSH bucket, one mega-document's
sourcedoc), where a single reducer would own the partition regardless
of AQE.

Pattern: two-phase aggregation. Phase 1 groups on (key, salt) —
``n_salts`` reducers share each hot key; phase 2 merges the partials on
the key alone. Correct for any algebraic aggregate (sum/count/min/max
given here); AVG composes from sum+count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def with_salt(
    df: DataFrame,
    n_salts: int = 16,
    col_name: str = "_salt",
    deterministic: bool = True,
) -> DataFrame:
    """Uniform int salt for two-phase aggregation.

    ``deterministic=True`` (default): salt = xxhash64 over every input
    column — recompute-safe. A shuffle-fetch failure that re-runs part
    of the map stage re-derives identical salts, so no row is counted
    twice or lost (monotonically_increasing_id is NOT safe here: its
    value depends on partition/row order, the same indeterminacy class
    as Spark's repartition correctness issue). Caveat: rows that are
    byte-identical across ALL columns share a salt, so a hot key whose
    rows are *literal duplicates* still lands on one reducer.

    ``deterministic=False``: salt from a per-row counter — spreads even
    fully-duplicate rows, but the input must be recompute-stable
    (checkpointed / freshly-scanned parquet, no upstream wide shuffle)
    or partial-stage retries can double-count.
    """
    if deterministic:
        return df.withColumn(
            col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        )
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: {out_col: (fn, in_col)} with fn ∈ sum|count|min|max.
    Example: salted_agg(df, ["k"], {"n": ("count", "*"),
    "total": ("sum", "v")}). Phase 1 fans each hot key over ``n_salts``
    reducers; phase 2 merges ≤ n_salts partial rows per key.
    """
    for fn, _ in aggs.values():
        if fn not in _MERGEABLE:
            raise ValueError(f"unsupported agg {fn}; use sum/count/min/max")
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (
                F.count("*")
                if fn == "count" and col == "*"
                else F.count(col)
                if fn == "count"
                else getattr(F, fn)(col)
            ).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGEABLE[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join_skewed_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, REPLICATE the small side
    across all salts (explode), join on (key, salt). Use when one key
    dominates the big side and the small side is modest but above the
    broadcast threshold; with a broadcastable small side just use
    F.broadcast instead.
    """
    b = with_salt(big, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")
