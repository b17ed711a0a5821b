from valor_spark.plans import engine  # noqa: F401
