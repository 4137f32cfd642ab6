from customkb_spark.functions import hashing, text, vector  # noqa: F401
