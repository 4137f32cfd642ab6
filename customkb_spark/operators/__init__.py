from customkb_spark.operators import (  # noqa: F401
    bm25,
    dedup,
    fusion,
    range_join,
    sessionize,
    topk,
    windows,
)
