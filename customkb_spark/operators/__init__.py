from customkb_spark.operators import (  # noqa: F401
    bm25,
    bpe,
    curation,
    dedup,
    fusion,
    multimodal,
    range_join,
    sessionize,
    topk,
    windows,
)
