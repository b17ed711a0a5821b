"""Multimodal binary-column operators: image / video frames as typed bytes.

Audio is fully real (``valor_spark.operators.audio`` decodes PCM/WAV with
numpy/stdlib).  Images: uncompressed **BMP (8/24-bit)**, binary **netpbm
(PGM/PPM)**, **PNG** (gray / RGB / palette / gray+alpha / RGBA, bit
depths 1/2/4/8/16, all five scanline filters, null AND Adam7 interlace;
stdlib ``zlib`` + numpy unfiltering), and **JPEG** — sequential baseline
SOF0 (4:4:4/4:2:2/4:2:0, restart markers, per-component multi-scan) AND
progressive SOF2 (spectral selection + successive approximation, EOB
runs) — via ``valor_spark.operators.jpeg`` (pure numpy + stdlib); all
are REAL decoders with real mean-intensity and block-average feature
extraction.  Video and the remaining exotic still formats (WebP, ...) need
libraries this container doesn't ship (Pillow, ffmpeg), so those fall
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
import zlib
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel in the IDAT stream
_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(kind: int, line: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """One PNG scanline filter inverse (filters 0-4, RFC 2083 §6).  ``line``
    is the filtered row, ``prev`` the RECONSTRUCTED previous row (zeros for
    row 0), ``bpp`` = bytes per complete pixel.  Filters 0/1/2 are fully
    vectorized (Sub is a per-lane mod-256 prefix sum); Average/Paeth carry a
    true left-neighbor recurrence, so those loop per PIXEL with numpy doing
    the per-channel math — bounded by image width, inside an Arrow batch."""
    if kind == 0:  # None
        return line.copy()
    if kind == 2:  # Up
        return line + prev  # uint8 wraps mod 256
    if kind == 1:  # Sub: out[x] = line[x] + out[x-bpp] -> prefix sum per lane
        lanes = line.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
    # Average/Paeth carry a true left-neighbor recurrence.  Round 6: the
    # recurrence runs over PLAIN PYTHON INTS on the flattened row — numpy
    # ops on bpp-sized arrays per pixel were overhead-dominated (~8x slower
    # measured); the integer math mod 256 is identical either way.
    lfl = line.tolist()
    lpl = prev.tolist()
    n = len(lfl)
    out_l = [0] * n
    if kind == 3:  # Average: out[i] = line[i] + (out[i-bpp] + prev[i]) >> 1
        for i in range(n):
            a = out_l[i - bpp] if i >= bpp else 0
            out_l[i] = (lfl[i] + ((a + lpl[i]) >> 1)) & 0xFF
        return np.frombuffer(bytes(out_l), dtype=np.uint8)
    if kind == 4:  # Paeth
        for i in range(n):
            if i >= bpp:
                a = out_l[i - bpp]
                c = lpl[i - bpp]
            else:
                a = 0
                c = 0
            b = lpl[i]
            p = a + b - c
            pa = p - a
            if pa < 0:
                pa = -pa
            pb = p - b
            if pb < 0:
                pb = -pb
            pc = p - c
            if pc < 0:
                pc = -pc
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out_l[i] = (lfl[i] + pred) & 0xFF
        return np.frombuffer(bytes(out_l), dtype=np.uint8)
    raise ValueError(f"png_bad_filter:{kind}")


#: Adam7 pass layout: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

#: legal bit depths per color type (PNG spec table 11.1)
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}


def _unfilter_region(stream: bytes, off: int, w: int, h: int, nch: int,
                     depth: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub-)image region of ``w`` x ``h`` pixels starting at
    ``off`` in the inflated stream -> ((h, w, nch) uint8 samples, bytes
    consumed).  Filters operate on BYTES with bpp = max(1, nch*depth/8)
    (PNG spec: sub-byte depths filter at bpp=1); 16-bit samples keep their
    high byte (8-bit downscale), sub-byte samples unpack MSB-first
    (palette indices and un-rescaled gray levels come out raw)."""
    stride = -(-w * nch * depth // 8)
    bpp = max(1, nch * depth // 8)
    need = h * (stride + 1)
    if len(stream) - off < need:
        raise ValueError(f"png_truncated:{len(stream) - off}<{need}")
    rows = np.frombuffer(stream, np.uint8, count=need, offset=off).reshape(
        h, stride + 1
    )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _png_unfilter(int(rows[y, 0]), rows[y, 1:], prev, bpp)
        out[y] = prev
    if depth == 16:
        img = out.reshape(h, w * nch, 2)[:, :, 0]  # big-endian high byte
        return np.ascontiguousarray(img).reshape(h, w, nch), need
    if depth == 8:
        return out.reshape(h, w, nch), need
    # depth 1/2/4: MSB-first bit groups within each scanline byte
    bits = np.unpackbits(out, axis=1)[:, : w * nch * depth]
    samples = bits.reshape(h, w * nch, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (samples * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, nch), need


def decode_png(raw: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 array via stdlib ``zlib``
    + numpy unfiltering.  Color types: 0 gray, 2 RGB, 3 palette (resolved
    through PLTE — grayscale palettes collapse to 1 channel, color palettes
    expand to RGB, mirroring the BMP palette path), 4 gray+alpha and 6 RGBA
    (alpha is STRIPPED from the returned pixels: features/metadata describe
    color channels, matching the other decoders).  Full baseline depth
    matrix — 1/2/4/8/16 bits per sample (16-bit keeps the high byte;
    sub-byte gray rescales to [0, 255]) — and BOTH interlace methods (null
    and Adam7: each of the 7 sub-images unfilters independently and
    scatters into place).  A missing IEND (truncation) raises ValueError;
    chunk CRCs are not verified (decode robustness, not integrity
    checking)."""
    if raw[:8] != _PNG_MAGIC:
        raise ValueError("not_png")
    pos, idat, plte, ihdr, saw_iend = 8, [], None, None, False
    while pos + 8 <= len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("png_truncated:chunk")
        if typ == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"png_bad_ihdr:{len(data)}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8)[: (ln // 3) * 3].reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            saw_iend = True
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None:
        raise ValueError("png_truncated:no_ihdr")
    if not saw_iend:
        raise ValueError("png_truncated:no_iend")
    w, h, depth, ctype, comp, fmeth, interlace = ihdr
    if ctype not in _PNG_NCH or depth not in _PNG_DEPTHS[ctype] or comp != 0 \
            or fmeth != 0:
        raise ValueError(f"png_unsupported:depth={depth},ctype={ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"png_unsupported:interlace={interlace}")
    if w <= 0 or h <= 0 or not idat:
        raise ValueError("png_truncated:no_idat")
    try:
        stream = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"png_bad_deflate:{exc}") from None
    nch = _PNG_NCH[ctype]
    if interlace == 0:
        img, _ = _unfilter_region(stream, 0, w, h, nch, depth)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        img = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            sub, used = _unfilter_region(stream, off, pw, ph, nch, depth)
            off += used
            img[y0::dy, x0::dx] = sub
    if ctype == 0 and depth in (1, 2, 4):  # rescale gray to full range
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    if ctype == 3:  # palette indices -> colors through PLTE
        if plte is None:
            raise ValueError("png_palette_missing")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("png_palette_index_out_of_range")
        if np.all(plte[:, 0] == plte[:, 1]) and np.all(plte[:, 1] == plte[:, 2]):
            img = plte[idx, 0][:, :, None]  # grayscale palette -> 1 channel
        else:
            img = plte[idx]
    elif ctype in (4, 6):  # strip alpha: keep color channels only
        img = img[:, :, : nch - 1]
    return np.ascontiguousarray(img)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_scanlines(region: np.ndarray, filter_type: int) -> bytearray:
    """(H, W, C) uint8 region -> filtered scanline bytes, every row
    carrying ``filter_type`` (0-4)."""
    h, w, c = region.shape
    stream = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = region[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - np.concatenate([np.zeros(c, np.int32), line[:-c]])
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            filt = line - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = left + prev - ul
            pa, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            filt = line - pred
        stream.append(filter_type)
        stream.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = line
    return stream


def encode_png(img: np.ndarray, filter_type: int = 0,
               alpha: np.ndarray | None = None,
               interlace: bool = False) -> bytes:
    """(H, W) / (H, W, 1) gray or (H, W, 3) RGB uint8 -> 8-bit PNG bytes,
    every scanline carrying ``filter_type`` (0-4) — the synthesis side for
    tests/fixtures, exercising each unfilter path of :func:`decode_png`.
    ``alpha`` (H, W) uint8 adds an alpha plane (color types 4/6), which
    the decoder strips back off.  ``interlace=True`` emits Adam7 (each of
    the 7 sub-images filtered independently)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    assert c in (1, 3) and 0 <= filter_type <= 4
    if alpha is not None:
        img = np.concatenate([img, alpha[:, :, None]], axis=2)
        c += 1
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if interlace:
        stream = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                stream += _filter_scanlines(np.ascontiguousarray(sub),
                                            filter_type)
    else:
        stream = _filter_scanlines(img, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_image(raw: bytes):
    """-> (pixels (H,W,C) uint8 | None, format, error).  Real decode for
    BMP/PGM/PPM/PNG; unknown magic -> (None, 'opaque', None) so callers can
    fall back to the deterministic fake featurizer."""
    try:
        if raw[:2] == b"BM":
            return decode_bmp(raw), "bmp", None
        if raw[:2] in (b"P5", b"P6"):
            return decode_pnm(raw), "pgm" if raw[:2] == b"P5" else "ppm", None
        if raw[:8] == _PNG_MAGIC:
            return decode_png(raw), "png", None
        if raw[:2] == b"\xff\xd8":
            from valor_spark.operators.jpeg import decode_jpeg

            return decode_jpeg(raw), "jpeg", None
    # struct.error: a mutated header passed the magic check but broke a
    # fixed-layout unpack — same contract as any other malformed payload
    except (ValueError, struct.error) as exc:
        fmt = ("bmp" if raw[:2] == b"BM"
               else "png" if raw[:8] == _PNG_MAGIC
               else "jpeg" if raw[:2] == b"\xff\xd8" else "pnm")
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

    BMP/PGM/PPM/PNG payloads are REALLY decoded (numpy-only, see
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

    src = df.select(F.col(id_col).alias(id_col), F.col(bytes_col))
    return _spread_narrow(src).mapInPandas(gen, FEATURE_SCHEMA)


def _spread_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input is narrower than the
    cluster: a single parquet file scans as 1-2 partitions and the decode
    pass then runs on 1-2 cores (measured 108 imgs/s at local[32] on a 5k-
    JPEG frame — effectively serial).  Well-partitioned inputs pass through
    untouched, so no payload bytes are shuffled at real scale."""
    npart = df.sparkSession.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() >= npart:
        return df
    return df.repartition(npart)


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
    format, error)``: BMP/PGM/PPM/PNG payloads are really decoded and dHashed;
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

    return _spread_narrow(df.select(F.col(id_col), F.col(bytes_col))).mapInPandas(
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
