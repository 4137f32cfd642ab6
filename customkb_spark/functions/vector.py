"""Vector expressions over ArrayType(Float/Double) columns.

The hot path (dot product / cosine over an embeddings column) uses
``F.zip_with`` + ``F.aggregate`` — JVM-side higher-order functions, no
Python serde. This is the exact-scoring primitive under the brute-force
top-k oracle and the IVF probe (SURVEY.md §4 item 1).

r9 measurement note: an experiment replacing the fold with unrolled
``element_at`` chains (hand-built and SQL-scalar-function forms) was
REVERTED — with norms pre-bound per row (see below) the HOF fold was
faster at every measured scale (sf0.1, sf1, 213k-row kb100k), while
the chains added ~0.5-1.5 s of per-action driver/planning cost and
showed no executor-side win (the scoring projection sits above a
broadcast nested-loop join, outside whole-stage codegen).

What actually made scoring joins cheap is PRE-NORMED cosine: norms are
bound to per-ROW attributes before the join (``norm`` per side +
``py_norm`` for driver-known query vectors), so the per-PAIR expression
is a single dot fold instead of three (sf1 knn_join 52.7 s → ~6 s).
The capture trap matters for the same reason in ``l2_normalize``:
``transform(a, x / norm(a))`` re-evaluates the captured norm aggregate
on EVERY element under interpreted HOF evaluation — O(dims²) per row —
so the bulk form ``l2_normalized_frame`` binds the norm to an attribute
first (238 s → ~1 s for 213k × 64 at the kb100k index build).

All math is performed in double precision (inputs cast up from float32)
so scores are bit-comparable with the DuckDB oracle after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def py_norm(vec) -> float:
    """Driver-side L2 norm with the EXACT fold order of ``norm(col)``:
    ``((0.0 + x1·x1) + x2·x2) …`` then sqrt, in Python floats (IEEE
    doubles) — so a literal built from it is bit-identical to the
    Column form. Used to pre-fold the query-side norm of a driver-known
    query vector (brute_force_topk) instead of evaluating the norm
    fold per scanned row."""
    import math

    acc = 0.0
    for x in vec:
        xd = float(x)
        acc = acc + xd * xd
    return math.sqrt(acc)


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.when(n > 0, F.transform(_dbl(a), lambda x: x / n)).otherwise(_dbl(a))


def l2_normalized_frame(df, vec_col: str):
    """``df`` with ``vec_col`` L2-normalized (array<double>), all other
    columns preserved — the bulk form of :func:`l2_normalize`.

    Two-phase projection binds the row's norm to an ATTRIBUTE first, so
    the per-element division references a row field. The Column form's
    ``transform(a, x / norm(a))`` captures the norm aggregate inside
    the lambda, and interpreted HOF evaluation (transform/aggregate are
    CodegenFallback) re-evaluates the capture on EVERY element —
    O(dims²) interpreted work per row, measured 238 s of the kb100k
    index build's 320 s for 213k × 64-dim vectors; this form measures
    ~1 s. Same norm, same divisions, bit-identical output (the n > 0
    guard and NULL propagation are preserved)."""
    tmp = df.withColumn("__l2n", norm(F.col(vec_col)))
    src = _dbl(F.col(vec_col))
    scaled = F.transform(src, lambda x: x / F.col("__l2n"))
    out = F.when(F.col("__l2n") > 0, scaled).otherwise(src)
    return tmp.withColumn(vec_col, out).drop("__l2n")


def l2_to_similarity(dist: Column) -> Column:
    """Reference similarity conversion for L2 indexes
    (query/search.py:246-258): sim = 1/(1+d)."""
    return F.lit(1.0) / (F.lit(1.0) + dist)


def mean_pool(df, group_col: str, vec_col: str, dims: int | None = None):
    """Element-wise mean vector per group — the chunk→document pooling
    step (doc vectors from chunk embeddings feed the ANN tiers at doc
    granularity; also the map-reduce half of k-means, index.py).

    One partial-aggregated shuffle on ``group_col``: each dimension is
    its own JVM avg aggregate (combines map-side), so cost is
    O(rows·dims) scan + a groups-sized exchange — no collect_list of
    whole vectors through the shuffle. ``dims`` defaults to probing one
    row (a bounded driver action).

    Vectors are assumed fixed-dimension (the embedding-column
    contract); NULL vectors are dropped up front so ``n_members``
    always equals each mean's denominator. Returns ``group_col,
    n_members, vec_col`` (float array).
    """
    df = df.filter(F.col(vec_col).isNotNull())
    if dims is None:
        row = df.select(vec_col).first()
        if row is None:
            raise ValueError(
                "mean_pool: no non-null vectors to probe dims from; pass dims="
            )
        dims = len(row[0])
    avgs = [
        F.avg(F.col(vec_col).getItem(i).cast("double")).alias(f"_d{i}")
        for i in range(dims)
    ]
    pooled = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n_members"), *avgs)
    vec = F.array(*[F.col(f"_d{i}").cast("float") for i in range(dims)])
    return pooled.select(group_col, "n_members", vec.alias(vec_col))
