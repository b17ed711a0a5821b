from valor_spark.operators import (  # noqa: F401
    audio,
    constraints,
    dedup,
    drift,
    multimodal,
    similarity,
    text,
)
