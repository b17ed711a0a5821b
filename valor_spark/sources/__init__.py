from valor_spark.sources import loaders, synthetic  # noqa: F401
