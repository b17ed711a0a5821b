"""Deterministic synthetic generator for the input_hint clips table.

Schema (BASELINE.json input_hint): ``(clip_id:string, bytes:binary,
sr_hz:int, dur_ms:int, codec:string, transcript:string)`` plus an explicit
``shard`` partition key.  Violations are *planted* at deterministic id
positions (FIXTURES.md §1-2) so tests can assert exact violation sets.

Everything is derived from ``spark.range(n)`` — fully distributed, no
driver-side materialization, reproducible under any partitioning because
every field is a pure function of ``(seed, id)``:

* non-binary columns: JVM-side arithmetic on ``id`` (whole-stage codegen);
* ``bytes``: Arrow-batched ``mapInPandas`` synthesizing PCM with numpy from
  a per-row seed — batch-level Python, never per-row UDFs.

At 10^12-clip scale this generator stands in for the Iceberg scan behind the
``load_clips`` seam (see ``valor_spark.sources.loaders``).
"""

from __future__ import annotations

import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# planted-violation strides (co-prime so plants don't collide)
DUP_STRIDE = 997          # duplicate clip_id (copies the previous id)
HOT_STRIDE = 101          # skewed hot key: ~1% of rows share one clip_id
BAD_SR_STRIDE = 1009      # invalid sample rate
BAD_DUR_STRIDE = 1013     # dur_ms <= 0
BAD_CODEC_STRIDE = 1019   # unknown codec
EMPTY_TRANSCRIPT_STRIDE = 1021
MISMATCH_TRANSCRIPT_STRIDE = 1031
TRUNCATED_STRIDE = 1033   # bytes shorter than sr*dur implies
CORRUPTED_STRIDE = 1039   # noisy PCM -> SNR < 30 dB vs reference
ORPHAN_STRIDE = 1049      # present in clips, absent from clips_ref
DANGLING_REF_COUNT = 7    # ref-only rows (present in clips_ref only)

SAMPLE_RATES = [8000, 16000, 44100]
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliett", "kilo", "lima", "mike", "november",
]


def _base_columns(spark: SparkSession, n: int, n_shards: int, max_dur_ms: int) -> DataFrame:
    """All non-binary columns as pure Column arithmetic over ``id``.

    Planted duplicates (``id % DUP_STRIDE == 0``) are EXACT copies of the
    previous row: all content derives from ``gen_id = id - 1`` so dedup and
    SNR checks see a true duplicate.  The hot key keeps its own content
    (realistic skew)."""
    df = spark.range(n).withColumn("shard", (F.col("id") % n_shards).cast("int"))
    raw = F.col("id")
    is_dup = (raw % DUP_STRIDE == 0) & (raw > 0)
    df = df.withColumn("gen_id", F.when(is_dup, raw - 1).otherwise(raw))
    i = F.col("gen_id")

    clip_id = F.concat(F.lit("clip_"), F.lpad(i.cast("string"), 10, "0"))
    clip_id = F.when(
        (raw % HOT_STRIDE == 0) & (raw > 0), F.lit("clip_hotkey")
    ).otherwise(clip_id)

    sr = F.element_at(
        F.array(*[F.lit(s) for s in SAMPLE_RATES]), (i % 3 + 1).cast("int")
    )
    sr = (
        F.when(i % BAD_SR_STRIDE == 1, F.element_at(F.array(F.lit(0), F.lit(-1), F.lit(96001)), (i % 3 + 1).cast("int")))
        .otherwise(sr)
    ).cast("int")

    dur = (F.lit(200) + (i * 37) % 801).cast("int")  # 200..1000 ms
    dur = F.when(i % BAD_DUR_STRIDE == 2, ((i % 2) * -50).cast("int")).otherwise(dur)

    codec = F.when(i % 2 == 0, F.lit("pcm_s16le")).otherwise(F.lit("wav"))
    codec = F.when(i % BAD_CODEC_STRIDE == 3, F.lit("mp3")).otherwise(codec)

    # seeded word sequence
    w = F.array(*[F.lit(w) for w in WORDS])
    transcript = F.concat_ws(
        " ",
        F.element_at(w, (i % 14 + 1).cast("int")),
        F.element_at(w, ((i * 7 + 3) % 14 + 1).cast("int")),
        F.element_at(w, ((i * 11 + 5) % 14 + 1).cast("int")),
    )
    transcript = F.when(i % EMPTY_TRANSCRIPT_STRIDE == 4, F.lit("")).otherwise(transcript)

    return df.select(
        F.col("id"),
        F.col("gen_id"),
        F.col("shard"),
        clip_id.alias("clip_id"),
        sr.alias("sr_hz"),
        dur.alias("dur_ms"),
        codec.alias("codec"),
        transcript.alias("transcript"),
    )


def _expected_samples(sr_hz: int, dur_ms: int) -> int:
    return max(0, int(sr_hz) * int(dur_ms) // 1000) if sr_hz > 0 and dur_ms > 0 else 0


def synth_pcm(row_id: int, sr_hz: int, dur_ms: int, max_samples: int,
              corrupted: bool) -> np.ndarray:
    """Deterministic reference signal for a clip: a sine whose frequency is a
    function of the id; corruption adds a second deterministic tone at 1/4
    amplitude (SNR ≈ 12 dB < 30 dB threshold)."""
    n = min(_expected_samples(sr_hz, dur_ms), max_samples)
    if n <= 0:
        return np.zeros(0, dtype=np.int16)
    t = np.arange(n, dtype=np.float64)
    freq = 100.0 + (row_id % 400)
    sig = 0.4 * np.sin(2 * np.pi * freq * t / max(sr_hz, 1))
    if corrupted:
        sig = sig + 0.1 * np.sin(2 * np.pi * (freq * 2.7 + 13) * t / max(sr_hz, 1))
    return np.clip(sig * 32767.0, -32768, 32767).astype("<i2")


def wrap_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(max(sr_hz, 1))
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _bytes_generator(max_samples: int, ref: bool):
    """mapInPandas generator: batch-level numpy synthesis of the audio bytes.

    ``ref=True`` produces the clean reference PCM (always raw s16le, never
    truncated/corrupted) for the clips_ref table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for row_id, sr, dur, codec in zip(
                pdf["gen_id"], pdf["sr_hz"], pdf["dur_ms"], pdf["codec"]
            ):
                rid = int(row_id)
                corrupted = (not ref) and rid % CORRUPTED_STRIDE == 7
                pcm = synth_pcm(rid, int(sr), int(dur), max_samples, corrupted)
                if not ref and rid % TRUNCATED_STRIDE == 6 and len(pcm) > 8:
                    pcm = pcm[: len(pcm) // 2]
                if ref or codec != "wav":
                    b = pcm.tobytes()
                else:
                    b = wrap_wav(pcm, int(sr))
                out_bytes.append(b)
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            yield pdf

    return gen


def clips(
    spark: SparkSession,
    n: int = 1000,
    n_shards: int = 8,
    max_samples: int = 2048,
    with_audio: bool = True,
) -> DataFrame:
    """The primary input table (FIXTURES.md §1)."""
    base = _base_columns(spark, n, n_shards, max_dur_ms=1000)
    if not with_audio:
        out = base.withColumn("bytes", F.lit(None).cast("binary"))
    else:
        schema = (
            "id bigint, gen_id bigint, shard int, clip_id string, sr_hz int, "
            "dur_ms int, codec string, transcript string, bytes binary"
        )
        out = base.mapInPandas(_bytes_generator(max_samples, ref=False), schema)
    # drop orphan-marker rows from REF, not from clips; here just order columns
    return out.select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "shard", "id"
    )


def clips_ref(
    spark: SparkSession,
    n: int = 1000,
    n_shards: int = 8,
    max_samples: int = 2048,
    with_audio: bool = True,
) -> DataFrame:
    """Reference decodes + transcripts (FIXTURES.md §2).

    * rows whose ``id % ORPHAN_STRIDE == 8`` are ABSENT (orphan clips);
    * ``DANGLING_REF_COUNT`` extra ``ref_only_k`` rows exist only here;
    * ``transcript_ref`` differs from clips' transcript at the
      MISMATCH_TRANSCRIPT_STRIDE plants (the *clips* side is what mutated).
    """
    raw = F.col("id")
    base = _base_columns(spark, n, n_shards, max_dur_ms=1000).filter(
        # keep clip_id unique in the ref: drop orphan plants AND the rows
        # whose clip_id was mutated into a duplicate / hot key
        ~((raw % ORPHAN_STRIDE == 8) & (raw > 0))
        & ~((raw % DUP_STRIDE == 0) & (raw > 0))
        & ~((raw % HOT_STRIDE == 0) & (raw > 0))
    )
    # clips_ref carries the canonical transcript; at MISMATCH plants it
    # differs from the clips side (equality check must flag those rows)
    base = base.withColumn(
        "transcript_ref",
        F.when(
            F.col("id") % MISMATCH_TRANSCRIPT_STRIDE == 5,
            F.concat(F.col("transcript"), F.lit(" extra")),
        ).otherwise(F.col("transcript")),
    )
    if with_audio:
        schema = (
            "id bigint, gen_id bigint, shard int, clip_id string, sr_hz int, "
            "dur_ms int, codec string, transcript string, transcript_ref string, "
            "bytes binary"
        )
        base = base.mapInPandas(_bytes_generator(max_samples, ref=True), schema)
        pcm_col = F.col("bytes").alias("pcm_ref")
    else:
        pcm_col = F.lit(None).cast("binary").alias("pcm_ref")
    ref = base.select(
        "clip_id", pcm_col, F.col("transcript_ref"), "shard", "id"
    )
    dangling = spark.range(DANGLING_REF_COUNT).select(
        F.concat(F.lit("ref_only_"), F.col("id").cast("string")).alias("clip_id"),
        F.lit(None).cast("binary").alias("pcm_ref"),
        F.lit("dangling").alias("transcript_ref"),
        F.lit(0).cast("int").alias("shard"),
        (F.col("id") - 1000000).alias("id"),
    )
    return ref.unionByName(dangling)
