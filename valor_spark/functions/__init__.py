from valor_spark.functions import errtypes, rules  # noqa: F401
