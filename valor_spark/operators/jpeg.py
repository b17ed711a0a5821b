"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

No Pillow/libjpeg in this container, but baseline sequential JPEG is a
fully-public, fixed algorithm (ITU-T T.81, 1992) — so the last decode path
that fell back to ``multimodal.fake_decode`` can be REAL:

* :func:`decode_jpeg` — baseline sequential DCT (SOF0), 8-bit, grayscale
  or YCbCr with per-component sampling factors in {1, 2} (covers 4:4:4,
  4:2:2, 4:2:0), restart markers (DRI/RSTn), Huffman tables read from the
  file's own DHT segments (NOT from built-in constants, so decoding does
  not depend on any table transcription here).  Progressive (SOF2),
  arithmetic coding, 12-bit, and hierarchical modes raise ``ValueError``.
* :func:`encode_jpeg` — baseline sequential 4:4:4 (or grayscale) with the
  Annex K quantization + Huffman tables and the libjpeg quality scaling —
  the synthesis side for tests/fixtures.

Verification strategy (tests/test_training_ops.py): the encoder+decoder
share table constants, so a pure round-trip could mask a mirrored bug —
the tests therefore also (a) decode a HAND-BUILT single-block bitstream
with known coefficients (decoder-independent ground truth), and (b) assert
round-trip PSNR against the SOURCE pixels (any systematic transform error
shows up as reconstruction loss).

Performance: entropy decode is a per-symbol Python loop (baseline Huffman
is inherently sequential); the DCT/IDCT and color transforms are
vectorized over all blocks at once.  Inside the Arrow batch operators
this bounds per-image cost by pixel count — fine for thumbnails/fixtures;
a production 100 TB image pass would bind a native codec at this seam
(the operator contract stays identical).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants (ITU-T T.81 Annex K) and helpers
# ---------------------------------------------------------------------------

#: raster index for each zigzag position (generated, not transcribed)
ZIGZAG = []
for _d in range(15):
    _rs = range(max(0, _d - 7), min(_d, 7) + 1)
    for _r in (_rs if _d % 2 else reversed(list(_rs))):
        ZIGZAG.append(_r * 8 + (_d - _r))
ZIGZAG = np.array(ZIGZAG)
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K Huffman specs: (bits-per-length[1..16], symbol list)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: dct = T @ block @ T.T
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _T[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(length, code) pairs in symbol order from a BITS table (T.81 C.2)."""
    out, code = [], 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code))
            code += 1
        code <<= 1
    return out


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex K base table (quality 1-100)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """-> (category, raw bits): T.81 F.1.2.1 variable-length integer."""
    if v == 0:
        return 0, 0
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t, (v if v > 0 else v + (1 << t) - 1)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already padded to multiples of 8) -> (n, 8, 8)
    blocks in raster MCU order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _emit_block(row: np.ndarray, prev_dc: int, dc_codes, ac_codes,
                bw: _BitWriter) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    t, bits = _magnitude(int(row[0]) - prev_dc)
    ln, code = dc_codes[t]
    bw.write(code, ln)
    bw.write(bits, t)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        ln, code = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last < 63:
        ln, code = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(row[0])


def _quant_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Padded level-shifted plane -> (blocks_y, blocks_x, 64) zigzagged
    quantized coefficients (DCT vectorized over every block at once)."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = _blocks_of(plane)
    coef = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
    return np.round(coef / qtab).astype(np.int64).reshape(by, bx, 64)[
        :, :, ZIGZAG
    ]


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """(H, W) / (H, W, 1) gray or (H, W, 3) RGB uint8 -> baseline JFIF
    bytes (Annex K tables scaled by ``quality``).  ``subsampling``:
    ``"4:4:4"`` (one block per component per MCU) or ``"4:2:0"`` (chroma
    2x2-averaged; MCU = 4 Y + Cb + Cr blocks).  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (DC
    predictors reset) — exercising the decoder's restart path."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    assert c in (1, 3) and h > 0 and w > 0
    assert subsampling in ("4:4:4", "4:2:0")
    sub = subsampling == "4:2:0" and c == 3
    rgb = img.astype(np.float64)
    if c == 3:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [rgb[:, :, 0]]

    qlum = scaled_quant(QUANT_LUM, quality)
    qchrom = scaled_quant(QUANT_CHROM, quality)
    dc_lum = dict(zip(DC_LUM_VALS, _canonical_codes(DC_LUM_BITS)))
    ac_lum = dict(zip(AC_LUM_VALS, _canonical_codes(AC_LUM_BITS)))
    dc_chrom = dict(zip(DC_CHROM_VALS, _canonical_codes(DC_CHROM_BITS)))
    ac_chrom = dict(zip(AC_CHROM_VALS, _canonical_codes(AC_CHROM_BITS)))

    mcu_px = 16 if sub else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px

    def padded(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        return np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        ) - 128.0

    if sub:
        ylum = padded(planes[0], ph, pw)
        # chroma: 2x2 block average on the padded grid, then half-res
        halves = []
        for p in planes[1:]:
            pp = padded(p, ph, pw) + 128.0
            hres = (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2]
                    + pp[1::2, 1::2]) / 4.0
            halves.append(hres - 128.0)
        zz = [_quant_zigzag(ylum, qlum)] + [
            _quant_zigzag(hp, qchrom) for hp in halves
        ]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        zz = [
            _quant_zigzag(padded(p, ph, pw), qlum if ci == 0 else qchrom)
            for ci, p in enumerate(planes)
        ]
        samp = [(1, 1)] * c
    mcuy, mcux = ph // mcu_px, pw // mcu_px
    codes = [(dc_lum, ac_lum)] + [(dc_chrom, ac_chrom)] * (c - 1)

    bw = _BitWriter()
    prev = [0] * c
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes((0xFF, 0xD0 + rst_n))
                rst_n = (rst_n + 1) % 8
                prev = [0] * c
            mcu_count += 1
            for ci in range(c):
                hi, vi = samp[ci]
                dc_codes, ac_codes = codes[ci]
                for by in range(vi):
                    for bx in range(hi):
                        row = zz[ci][my * vi + by, mx * hi + bx]
                        prev[ci] = _emit_block(
                            row, prev[ci], dc_codes, ac_codes, bw
                        )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if c == 3:
        out += seg(
            0xFFDB, b"\x01" + bytes(qchrom.reshape(-1)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci in range(c):
        hi, vi = samp[ci]
        sof += bytes((ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1))
    out += seg(0xFFC0, sof)

    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if c == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([c]) + b"".join(
        bytes((ci + 1, 0x00 if ci == 0 else 0x11)) for ci in range(c)
    ) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                raise ValueError("jpeg_truncated:marker_in_scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume the RSTn marker at an aligned boundary."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1  # skip pad bits/bytes before the marker
        self.pos += 2


class _RestartHit(ValueError):
    """A restart marker reached mid-symbol: corrupt/truncated scan data
    (well-formed streams only hit RSTn at the aligned boundaries the
    decoder consumes explicitly)."""

    def __init__(self) -> None:
        super().__init__("jpeg_unexpected_restart")


def _huff_decode(reader: _BitReader, lut: dict) -> int:
    length, code = 0, 0
    while length < 17:
        code = (code << 1) | reader.read(1)
        length += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg_bad_huffman_code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(raw: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, C) uint8 (C = 1 gray / 3 RGB)."""
    try:
        return _decode_jpeg_inner(raw)
    except (IndexError, struct.error):
        # ran off the end of a segment/scan: uniform truncation error (the
        # UDF error path contracts on ValueError)
        raise ValueError("jpeg_truncated:unexpected_eof") from None


def _decode_jpeg_inner(raw: bytes) -> np.ndarray:
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not_jpeg")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(raw):
            raise ValueError("jpeg_truncated:no_sos")
        if raw[pos] != 0xFF:
            raise ValueError("jpeg_bad_marker")
        marker = raw[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        body = raw[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("jpeg_truncated:segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("jpeg_unsupported:16bit_quant")
                tab = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int32)
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = tab  # de-zigzag
                qtabs[tid] = q.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            b = 0
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nval = sum(bits)
                vals = list(body[b + 17 : b + 17 + nval])
                lut = {
                    lc: sym for sym, lc in zip(vals, _canonical_codes(bits))
                }
                hufs[(tclass, tid)] = lut
                b += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"jpeg_unsupported:precision={prec}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"jpeg_unsupported:sampling={hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            sof = (hh, ww, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg_unsupported:sof=0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("jpeg_truncated:sos_before_sof")
            ns = body[0]
            if ns != len(sof[2]):
                # per-component scans (legal baseline, rare) would need a
                # multi-scan loop — reject rather than mis-decode
                raise ValueError(f"jpeg_unsupported:multi_scan:{ns}")
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2], body[2 + si * 2]
                matches = [c for c in sof[2] if c["id"] == cs]
                if not matches:
                    raise ValueError(f"jpeg_bad_scan_component:{cs}")
                scan.append((matches[0], tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            break
        elif marker == 0xD9:
            raise ValueError("jpeg_truncated:eoi_before_sos")
        pos += 2 + seglen

    hh, ww, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-ww // (8 * hmax))
    mcuy = -(-hh // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    reader = _BitReader(raw, pos)
    prev_dc = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                prev_dc = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for comp, tdc, tac in scan:
                dc_lut = hufs.get((0, tdc))
                ac_lut = hufs.get((1, tac))
                qtab = qtabs.get(comp["tq"])
                if dc_lut is None or ac_lut is None or qtab is None:
                    raise ValueError("jpeg_missing_table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int64)
                        t = _huff_decode(reader, dc_lut)
                        if t > 15:
                            # only possible via a corrupt DHT: spec DC
                            # categories stop at 11; an unchecked t would
                            # read t bits into an unbounded magnitude
                            raise ValueError(f"jpeg_bad_dc_category:{t}")
                        diff = _extend(reader.read(t), t) if t else 0
                        prev_dc[comp["id"]] += diff
                        zz[0] = prev_dc[comp["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_lut)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise ValueError("jpeg_coef_overflow")
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz  # de-zigzag
                        block = coef.reshape(8, 8) * qtab
                        pix = _T.T @ block @ _T + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix

    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:hh, :ww])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
