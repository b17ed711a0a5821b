"""Thin shim: the plain-Python generator spec lives in the package now."""

from valor_spark.sources.rowspec import (  # noqa: F401
    ClipSpec,
    expected_clips,
    joins_ref,
    ref_present,
    ref_transcript,
)
