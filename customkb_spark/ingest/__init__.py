from customkb_spark.ingest import chunker, filetype, pipeline  # noqa: F401
