from valor_spark.streaming import validate_stream  # noqa: F401
