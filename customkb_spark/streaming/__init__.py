from customkb_spark.streaming import incremental  # noqa: F401
