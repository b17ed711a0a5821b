"""Multimodal binary-column operators: image / video frames as typed bytes.

Audio is fully real (``valor_spark.operators.audio`` decodes PCM/WAV with
numpy/stdlib).  Images: uncompressed **BMP (8/24-bit)** and binary **netpbm
(PGM/PPM)** are REAL decoders here — both formats are fixed-layout and
parse with numpy alone, no Pillow needed — with real mean-intensity and
block-average feature extraction.  Compressed formats (JPEG/PNG) and video
need libraries this container doesn't ship (Pillow, ffmpeg), so those fall
back to a deterministic fake decoder (documented, not hidden); the
Spark-side plumbing — typed metadata struct, Arrow-batched ``mapInPandas``
with a stable output schema, batch-shape handling — is identical for both
paths and fully tested.

Scale notes: payload passes should ``repartition`` by id before the UDF so
Arrow batches have balanced byte sizes, and tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep a batch ~64-128 MB.
"""

from __future__ import annotations

import hashlib
import struct
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
    "id bigint, n_bytes int, content_sha1 string, format string, "
    "width int, height int, channels int, "
    "mean_intensity double, feature_dim int, features array<float>, error string"
)


# ---------------------------------------------------------------------------
# real decoders (pure numpy — fixed-layout formats)
# ---------------------------------------------------------------------------

def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 8-bit-gray / 24-bit-BGR BMP -> (H, W, C) uint8 array.
    Raises ValueError on anything this decoder doesn't support."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise ValueError("not_bmp")
    pixel_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError("bmp_header_unsupported")
    width = struct.unpack_from("<i", raw, 18)[0]
    height = struct.unpack_from("<i", raw, 22)[0]
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp not in (8, 24) or width <= 0 or height == 0:
        raise ValueError(f"bmp_unsupported:bpp={bpp},comp={compression}")
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3  # rows pad to 4 bytes
    need = pixel_off + stride * height
    if len(raw) < need:
        raise ValueError(f"bmp_truncated:{len(raw)}<{need}")
    data = np.frombuffer(raw, dtype=np.uint8, count=stride * height, offset=pixel_off)
    rows = data.reshape(height, stride)[:, : width * channels]
    img = rows.reshape(height, width, channels)
    if flipped:
        img = img[::-1]
    if channels == 3:
        img = img[:, :, ::-1]  # BGR -> RGB
    else:
        # 8-bit BMP pixels are PALETTE INDICES, not gray levels: resolve
        # through the color table (BGRX entries after the info header).  A
        # grayscale palette collapses back to one channel; a color palette
        # expands to RGB — decoding indices as intensities would silently
        # produce garbage features for real-world palettized files.
        n_pal = struct.unpack_from("<I", raw, 46)[0] or 256
        pal_off = 14 + hdr_size
        if pal_off + n_pal * 4 > pixel_off or pal_off + n_pal * 4 > len(raw):
            raise ValueError("bmp_palette_truncated")
        lut = (
            np.frombuffer(raw, np.uint8, count=n_pal * 4, offset=pal_off)
            .reshape(-1, 4)[:, :3][:, ::-1]  # BGR -> RGB
        )
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("bmp_palette_index_out_of_range")
        if np.all(lut[:, 0] == lut[:, 1]) and np.all(lut[:, 1] == lut[:, 2]):
            img = lut[idx, 0][:, :, None]  # grayscale palette -> 1 channel
        else:
            img = lut[idx]  # color palette -> RGB
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> uncompressed BMP bytes (the
    synthesis side for tests/fixtures — exact inverse of :func:`decode_bmp`)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    assert c in (1, 3)
    stride = (w * c + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256)) if c == 1 else b""
    pixel_off = 54 + len(palette)
    size = pixel_off + stride * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pixel_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, c * 8, 0, stride * h, 2835, 2835,
                       256 if c == 1 else 0, 0)
    rows = []
    src = img[::-1]  # bottom-up
    for r in range(h):
        row = src[r]
        row = row[:, ::-1] if c == 3 else row  # RGB -> BGR
        line = row.tobytes()
        rows.append(line + b"\x00" * (stride - len(line)))
    return hdr + palette + b"".join(rows)


def decode_pnm(raw: bytes) -> np.ndarray:
    """Binary netpbm: P5 (gray) / P6 (RGB), maxval <= 255 -> (H, W, C) uint8."""
    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not_pnm")
    channels = 1 if raw[:2] == b"P5" else 3
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comments '#...' allowed); pixel data starts after the single
    # whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    # maxval != 255 would need per-sample rescaling (and 2-byte samples when
    # > 255) — reject rather than silently decode mis-scaled intensities
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"pnm_unsupported:maxval={maxval}")
    need = w * h * channels
    if len(raw) - pos < need:
        raise ValueError(f"pnm_truncated:{len(raw)-pos}<{need}")
    return np.frombuffer(raw, np.uint8, count=need, offset=pos).reshape(h, w, channels)


def decode_image(raw: bytes):
    """-> (pixels (H,W,C) uint8 | None, format, error).  Real decode for
    BMP/PGM/PPM; unknown magic -> (None, 'opaque', None) so callers can fall
    back to the deterministic fake featurizer."""
    try:
        if raw[:2] == b"BM":
            return decode_bmp(raw), "bmp", None
        if raw[:2] in (b"P5", b"P6"):
            return decode_pnm(raw), "pgm" if raw[:2] == b"P5" else "ppm", None
    except ValueError as exc:
        fmt = "bmp" if raw[:2] == b"BM" else "pnm"
        return None, fmt, f"decode_failed:{exc}"
    return None, "opaque", None


def block_features(img: np.ndarray, dim: int) -> np.ndarray:
    """Real features: grayscale block-average over ``dim`` horizontal bands
    (a 1-D 'thumbnail') normalized to [0, 1] — deterministic, resolution-
    independent, and cheap (pure numpy views)."""
    gray = img.mean(axis=2, dtype=np.float64)
    h = gray.shape[0]
    bounds = np.linspace(0, h, dim + 1).astype(int)
    return np.array(
        [
            gray[bounds[i] : max(bounds[i + 1], bounds[i] + 1)].mean() / 255.0
            for i in range(dim)
        ],
        dtype=np.float32,
    )


def fake_decode(raw: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded pixels': bytes -> sha1 -> seeded uniform
    array.  Stands in for Pillow/ffmpeg so the UDF plumbing (batching,
    schema, partitioning) is fully exercised and reproducible."""
    seed = int.from_bytes(hashlib.sha1(raw).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def image_features(df: DataFrame, bytes_col: str = "bytes", id_col: str = "id",
                   dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over a binary image column.

    BMP/PGM/PPM payloads are REALLY decoded (numpy-only, see
    :func:`decode_image`) with true width/height/channels metadata, mean
    intensity, and block-average features; unknown/compressed formats
    (format='opaque') get the deterministic fake featurizer so the pipeline
    shape is identical with or without imaging libs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "id": pdf[id_col].astype("int64"),
                "n_bytes": np.zeros(n, dtype=np.int32),
                "content_sha1": [""] * n,
                "format": [None] * n,
                "width": [None] * n,
                "height": [None] * n,
                "channels": [None] * n,
                # object dtype: failed rows stay NULL — a 0.0 placeholder
                # reads as a plausible "all-black image" to consumers that
                # filter on intensity without joining error
                "mean_intensity": [None] * n,
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
                img, fmt, err = decode_image(raw)
                out["format"][i] = fmt
                if err is not None:
                    out["error"][i] = err
                    continue
                if img is not None:
                    out["width"][i] = int(img.shape[1])
                    out["height"][i] = int(img.shape[0])
                    out["channels"][i] = int(img.shape[2])
                    feats = block_features(img, dim)
                    out["features"][i] = feats
                    out["mean_intensity"][i] = float(
                        img.mean(dtype=np.float64) / 255.0
                    )
                else:  # opaque payload: deterministic fake featurizer
                    feats = fake_decode(raw, dim)
                    out["features"][i] = feats
                    out["mean_intensity"][i] = float(feats.mean())
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).alias(id_col), F.col(bytes_col)).mapInPandas(
        gen, FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, n_frames_col: str, every_k: int) -> DataFrame:
    """Video frame-sampling *plan*: expands (id, n_frames) to one row per
    sampled frame index — pure Column ops (sequence + explode); the actual
    frame decode would plug into :func:`image_features`.  Videos with zero
    or NULL frame counts yield NO sample rows (explode drops empty/NULL
    arrays) — a frame_idx=0 row for an empty video would drive a decode of
    a frame that does not exist."""
    n = F.col(n_frames_col)
    seq = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_k))
    # slice(seq, 1, 0) = empty array of seq's own element type (works for
    # int and bigint frame counts alike)
    return df.select(
        "*",
        F.explode(F.when(n >= 1, seq).otherwise(F.slice(seq, 1, 0))).alias(
            "frame_idx"
        ),
    )


def dhash_hex(img: np.ndarray) -> str:
    """Difference hash (dHash) of decoded pixels: grayscale, nearest-sample
    to an 8x9 grid with pure integer index math ((i*dim)//target — no
    float resize, so every engine lands on identical pixels), then one bit
    per horizontal neighbor comparison -> 64 bits as 16 lowercase hex.
    Perceptually identical images (any resolution) collide; unrelated ones
    differ in ~32 bits."""
    gray = img.mean(axis=2, dtype=np.float64)
    h, w = gray.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(9) * w) // 9
    m = gray[np.ix_(ri, ci)]
    bits = (m[:, 1:] > m[:, :-1]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return format(val, "016x")


def image_dhash(df: DataFrame, bytes_col: str = "bytes", id_col: str = "id") -> DataFrame:
    """Perceptual image hashing over a binary column -> ``(id, dhash,
    format, error)``: BMP/PGM/PPM payloads are really decoded and dHashed;
    opaque/undecodable payloads carry a NULL hash (their pixels are
    unknown — a fake hash would manufacture false duplicate groups).  Same
    Arrow-batched shape as :func:`image_features`: no shuffle, the binary
    column is read exactly once."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "id": pdf[id_col].astype("int64"),
                "dhash": [None] * n,
                "format": [None] * n,
                "error": [None] * n,
            }
            for i, raw in enumerate(pdf[bytes_col]):
                if raw is None:
                    out["error"][i] = "null_bytes"
                    continue
                img, fmt, err = decode_image(bytes(raw))
                out["format"][i] = fmt
                if err is not None:
                    out["error"][i] = err
                elif img is not None:
                    out["dhash"][i] = dhash_hex(img)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        gen, "id bigint, dhash string, format string, error string"
    )


def image_dhash_groups(df: DataFrame, bytes_col: str = "bytes", id_col: str = "id") -> DataFrame:
    """Perceptual-duplicate groups ``(dhash, n, first_id)`` — every dHash
    held by more than one decodable image; one hash-agg over 16-hex keys
    (map-side partial combine), NULL hashes excluded."""
    hashes = image_dhash(df, bytes_col, id_col).filter(F.col("dhash").isNotNull())
    return (
        hashes.groupBy("dhash")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("first_id"))
        .filter(F.col("n") > 1)
    )
