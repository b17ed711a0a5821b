"""Audio payload checks: Arrow-batched decode + SNR invariant.

north_rule / input_hint contract: decode PCM inside Arrow UDF batches and
assert SNR >= 30 dB allclose against reference decodes plus exact transcript
equality — never per-row Python UDFs.  (The reference library has no audio;
this is the engine-level payload check mandated by BASELINE.json — the rule
*algebra* consuming the decoded features is pure Valor semantics.)

Codecs supported without external audio libs (none are installed):
``pcm_s16le`` via ``numpy.frombuffer`` and ``wav`` via stdlib ``wave``.
Unknown codecs produce a decode error (and are separately flagged by the
codec-whitelist row rule).

Scale notes (100 TB of audio):

* the decode+SNR pass touches ``bytes`` exactly once, inside one
  ``pandas_udf`` evaluated per Arrow batch; tune
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch is ~64-128 MB;
* the clips↔ref join shuffles both sides on ``clip_id`` (sort-merge at this
  width — broadcasting a 100 TB ref is impossible); callers can pre-bucket
  both tables by ``clip_id`` to eliminate the shuffle entirely;
* columns are pruned before the join so only (clip_id, bytes, codec,
  transcript) move through the exchange.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SNR_DB_MIN = 30.0

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("snr_db", T.DoubleType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_one(raw: bytes | None, codec: str | None) -> tuple[np.ndarray | None, str | None]:
    """Decode one payload to int16 PCM; returns (samples, error)."""
    if raw is None:
        return None, "null_bytes"
    try:
        if codec == "pcm_s16le":
            if len(raw) % 2:
                return None, "odd_byte_length"
            return np.frombuffer(raw, dtype="<i2"), None
        if codec == "wav":
            with wave.open(io.BytesIO(raw), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    return None, "unsupported_wav_layout"
                frames = w.readframes(w.getnframes())
            return np.frombuffer(frames, dtype="<i2"), None
        return None, f"unsupported_codec:{codec}"
    except Exception as exc:  # malformed container
        return None, f"decode_failed:{type(exc).__name__}"


def snr_db(sig: np.ndarray, ref: np.ndarray) -> float:
    """10*log10(P_ref / P_noise) with noise = sig - ref; inf when identical."""
    if len(sig) != len(ref):
        return float("nan")
    if len(ref) == 0:
        return float("inf")
    r = ref.astype(np.float64)
    d = sig.astype(np.float64) - r
    p_noise = float(np.dot(d, d))
    if p_noise == 0.0:
        return float("inf")
    p_ref = float(np.dot(r, r))
    if p_ref == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_ref / p_noise)


@pandas_udf(_DECODE_SCHEMA)
def _decode_snr_udf(
    raw: pd.Series, codec: pd.Series, ref_raw: pd.Series
) -> pd.DataFrame:
    """Arrow-batched: decode clip bytes per codec, decode the reference PCM
    (always raw s16le), compute SNR.  numpy math per element inside the
    batch; data crosses Python<->JVM once per Arrow batch, not per row."""
    n = len(raw)
    snrs = np.full(n, np.nan)
    counts = np.zeros(n, dtype=np.int32)
    errors: list[str | None] = [None] * n
    # list iteration, not .iloc — per-element iloc dominates batch runtime
    for k, (rw, cod, rr) in enumerate(
        zip(raw.tolist(), codec.tolist(), ref_raw.tolist())
    ):
        sig, err = decode_one(rw, cod)
        if err is not None:
            errors[k] = err
            continue
        if rr is None:
            errors[k] = "missing_reference"
            continue
        ref = np.frombuffer(rr, dtype="<i2")
        counts[k] = len(sig)
        if len(sig) != len(ref):
            errors[k] = f"length_mismatch:{len(sig)}!={len(ref)}"
            continue
        snrs[k] = snr_db(sig, ref)
    return pd.DataFrame(
        {"snr_db": snrs, "n_samples": counts, "decode_error": errors}
    )


def with_audio_invariant(
    clips: DataFrame,
    clips_ref: DataFrame,
    repartition: int | None = None,
) -> DataFrame:
    """Join clips to reference decodes on ``clip_id`` and attach the decoded
    invariant columns ``snr_db / n_samples / decode_error / transcript_ref``.

    Inner join: rows without a reference are the referential-integrity
    check's concern (anti-join, see constraints), not the SNR check's.
    """
    left = clips.select("clip_id", "bytes", "codec", "transcript", *(
        [c for c in ("shard",) if c in clips.columns]
    ))
    right = clips_ref.select("clip_id", "pcm_ref", "transcript_ref")
    if repartition:
        left = left.repartition(repartition, "clip_id")
        right = right.repartition(repartition, "clip_id")
    joined = left.join(right, on="clip_id", how="inner")
    dec = _decode_snr_udf(F.col("bytes"), F.col("codec"), F.col("pcm_ref"))
    return joined.withColumn("__audio", dec).select(
        "clip_id",
        *([c for c in ("shard",) if c in joined.columns]),
        "transcript",
        "transcript_ref",
        F.col("__audio.snr_db").alias("snr_db"),
        F.col("__audio.n_samples").alias("n_samples"),
        F.col("__audio.decode_error").alias("decode_error"),
    )


def audio_rules(snr_db_min: float = SNR_DB_MIN) -> dict:
    """Row rules over the invariant columns (pure Valor combinators)."""
    from valor_spark import EArray, conN, fail_col, make, fail_if, adapt, field

    EA = EArray()
    decode_rule = make(
        lambda row: F.when(
            row.getField("decode_error").isNotNull(),
            F.array(F.concat(F.lit("DecodeError:"), row.getField("decode_error"))),
        ),
        EA,
    )
    snr_rule = make(
        lambda row: F.when(
            row.getField("decode_error").isNull()
            & (row.getField("snr_db") < F.lit(snr_db_min)),
            F.array(
                F.concat(
                    F.lit("SnrBelowThreshold:"),
                    F.round(row.getField("snr_db"), 2).cast("string"),
                )
            ),
        ),
        EA,
    )
    transcript_rule = make(
        lambda row: F.when(
            ~(row.getField("transcript").eqNullSafe(row.getField("transcript_ref"))),
            EA.lit(["TranscriptMismatch"]),
        ),
        EA,
    )
    return {
        "audio_decode": decode_rule,
        "audio_snr": snr_rule,
        "transcript_equal": transcript_rule,
    }
