"""Multimodal binary-column plumbing: image / video frames as opaque bytes.

Audio is fully real (``valor_spark.operators.audio`` decodes PCM/WAV with
numpy/stdlib).  Image/video decoding needs libraries this container doesn't
ship (Pillow, ffmpeg), so the *decode step* is stubbed behind an import-try
with a deterministic fake — but the Spark-side plumbing is real and tested:
typed metadata struct, Arrow-batched ``mapInPandas`` with a stable output
schema, batch-shape handling, and partition sizing by byte volume.

Scale notes: payload passes should ``repartition`` by id before the UDF so
Arrow batches have balanced byte sizes, and tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep a batch ~64-128 MB.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FEATURE_SCHEMA = (
    "id bigint, n_bytes int, content_sha1 string, "
    "mean_intensity double, feature_dim int, features array<float>, error string"
)


def _decode_image_real(raw: bytes):  # pragma: no cover - lib not installed
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed in this "
            "container; the deterministic fake decoder is used instead"
        ) from exc
    raise NotImplementedError("real decode path is intentionally stubbed")


def fake_decode(raw: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded pixels': bytes -> sha1 -> seeded uniform
    array.  Stands in for Pillow/ffmpeg so the UDF plumbing (batching,
    schema, partitioning) is fully exercised and reproducible."""
    seed = int.from_bytes(hashlib.sha1(raw).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def image_features(df: DataFrame, bytes_col: str = "bytes", id_col: str = "id",
                   dim: int = 8, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over an opaque binary column.

    Output: per-row digest + pseudo-intensity + a ``dim``-float feature
    vector (fake-decoded; swap ``fake_decode`` for a real decoder when the
    imaging libs exist)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "id": pdf[id_col].astype("int64"),
                "n_bytes": np.zeros(n, dtype=np.int32),
                "content_sha1": [""] * n,
                "mean_intensity": np.zeros(n),
                "feature_dim": np.full(n, dim, dtype=np.int32),
                "features": [None] * n,
                "error": [None] * n,
            }
            for i, raw in enumerate(pdf[bytes_col]):
                if raw is None:
                    out["error"][i] = "null_bytes"
                    continue
                raw = bytes(raw)
                out["n_bytes"][i] = len(raw)
                out["content_sha1"][i] = hashlib.sha1(raw).hexdigest()
                try:
                    if use_real_decoder:
                        _decode_image_real(raw)
                    feats = fake_decode(raw, dim)
                    out["features"][i] = feats
                    out["mean_intensity"][i] = float(feats.mean())
                except NotImplementedError as exc:
                    out["error"][i] = f"decoder_unavailable:{exc}"
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias(id_col), F.col(bytes_col)).mapInPandas(
        gen, FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, n_frames_col: str, every_k: int) -> DataFrame:
    """Video frame-sampling *plan*: expands (id, n_frames) to one row per
    sampled frame index — pure Column ops (sequence + explode); the actual
    frame decode would plug into :func:`image_features`."""
    return df.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_k))
        ).alias("frame_idx"),
    )
