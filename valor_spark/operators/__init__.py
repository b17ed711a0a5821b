from valor_spark.operators import audio, constraints, drift  # noqa: F401
