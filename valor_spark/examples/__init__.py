from valor_spark.examples import tutorial  # noqa: F401
