from customkb_spark.embedding import cache, embedder, index  # noqa: F401
