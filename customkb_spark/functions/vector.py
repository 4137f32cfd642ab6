"""Vector expressions over ArrayType(Float/Double) columns.

The hot path (dot product / cosine over an embeddings column) uses
``F.zip_with`` + ``F.aggregate`` — JVM-side higher-order functions, no
Python serde. This is the exact-scoring primitive under the brute-force
top-k oracle and the IVF probe (SURVEY.md §4 item 1).

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


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.when(n > 0, F.transform(_dbl(a), lambda x: x / n)).otherwise(_dbl(a))


def l2_to_similarity(dist: Column) -> Column:
    """Reference similarity conversion for L2 indexes
    (query/search.py:246-258): sim = 1/(1+d)."""
    return F.lit(1.0) / (F.lit(1.0) + dist)
