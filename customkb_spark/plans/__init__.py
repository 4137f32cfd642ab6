from customkb_spark.plans import formatters, hybrid  # noqa: F401
