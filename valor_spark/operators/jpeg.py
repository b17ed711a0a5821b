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


class _SymCollector:
    """Pre-pass sink: records which Huffman symbols a scan will emit so a
    (uniform-length canonical) table can be built before the real pass."""

    def __init__(self) -> None:
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.syms.add(s)

    def bits(self, v: int, n: int) -> None:
        pass


class _SymWriter:
    def __init__(self, codes: dict, bw: _BitWriter) -> None:
        self.codes, self.bw = codes, bw

    def sym(self, s: int) -> None:
        ln, code = self.codes[s]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        self.bw.write(v, n)


def _uniform_dht(syms: set[int]) -> tuple[list[int], list[int], dict]:
    """All observed symbols at one canonical code length (9 bits covers the
    full 256-symbol space without ever assigning the all-ones code).  Valid,
    deterministic, and table-build-free — compression is not the point of
    the fixture encoder; the decoder reads whatever DHT says."""
    vals = sorted(syms) or [0x00]
    if len(vals) > 256:
        raise ValueError("jpeg_encode_symbol_overflow")
    length = 9
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {sym: (length, i) for i, sym in enumerate(vals)}
    return bits, vals, codes


def _emit_ac_first(zzc: np.ndarray, bh: int, bwid: int, ss: int, se: int,
                   al: int, w) -> None:
    """Progressive AC first scan over one component's block grid (T.81
    G.1.2.2): band coefficients at reduced precision + end-of-band runs."""
    eob = 0
    for by in range(bh):
        for bx in range(bwid):
            row = zzc[by, bx]
            run = 0
            emitted = False
            for k in range(ss, se + 1):
                v = int(row[k])
                v = -((-v) >> al) if v < 0 else v >> al  # toward-zero
                if v == 0:
                    run += 1
                    continue
                if eob:  # a preceding end-of-band run ends here
                    r = eob.bit_length() - 1
                    w.sym(r << 4)
                    w.bits(eob - (1 << r), r)
                    eob = 0
                while run > 15:
                    w.sym(0xF0)
                    run -= 16
                t, bits = _magnitude(v)
                w.sym((run << 4) | t)
                w.bits(bits, t)
                run = 0
                emitted = True
            if run > 0 or not emitted:
                eob += 1
                if eob == 0x7FFF:
                    w.sym(14 << 4)
                    w.bits(eob - (1 << 14), 14)
                    eob = 0
    if eob:
        r = eob.bit_length() - 1
        w.sym(r << 4)
        w.bits(eob - (1 << r), r)


def _emit_ac_refine(zzc: np.ndarray, bh: int, bwid: int, ss: int, se: int,
                    al: int, w) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): correction bits for
    history-nonzero coefficients ride after the symbol that ends their run
    (or after the buffered end-of-band run)."""
    eob = 0
    be: list[int] = []  # correction bits pending with the buffered EOB run

    def flush_eob() -> None:
        nonlocal eob
        if eob:
            r = eob.bit_length() - 1
            w.sym(r << 4)
            w.bits(eob - (1 << r), r)
            for bbit in be:
                w.bits(bbit, 1)
            be.clear()
            eob = 0

    for by in range(bh):
        for bx in range(bwid):
            row = zzc[by, bx]
            absv = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
            eobpos = -1  # band-relative index of the last NEWLY-significant
            for i, t in enumerate(absv):
                if t == 1:
                    eobpos = i
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eobpos:
                    flush_eob()
                    w.sym(0xF0)
                    r -= 16
                    for bbit in br:
                        w.bits(bbit, 1)
                    br = []
                if t > 1:  # history-nonzero: one buffered correction bit
                    br.append(t & 1)
                    continue
                flush_eob()
                w.sym((r << 4) | 1)
                w.bits(1 if int(row[ss + i]) > 0 else 0, 1)
                for bbit in br:
                    w.bits(bbit, 1)
                br = []
                r = 0
            if r > 0 or br:
                eob += 1
                be.extend(br)
                if eob == 0x7FFF or len(be) > 930:
                    flush_eob()
    flush_eob()


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                progressive: bool = False,
                per_component_scans: bool = False) -> bytes:
    """(H, W) / (H, W, 1) gray or (H, W, 3) RGB uint8 -> baseline JFIF
    bytes (Annex K tables scaled by ``quality``).  ``subsampling``:
    ``"4:4:4"`` (one block per component per MCU) or ``"4:2:0"`` (chroma
    2x2-averaged; MCU = 4 Y + Cb + Cr blocks).  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (DC
    predictors reset) — exercising the decoder's restart path.

    ``progressive=True`` emits SOF2 with a two-level scan script covering
    all four progressive scan types — interleaved DC first (Al=1), DC
    refinement, per-component AC first with a spectral band split on the
    luma, and the matching AC refinements — with per-scan DHT redefinition
    (uniform-length canonical tables, since the Annex K tables lack the
    EOB-run symbols progressive entropy coding needs).  The coefficients
    are the same quantized values the baseline path would code, so a full
    progressive decode must reproduce the baseline decode EXACTLY.

    ``per_component_scans=True`` (sequential only, 4:4:4/gray) emits one
    full-precision scan per component — the legal-but-rare multi-scan
    baseline layout."""
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
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    assert not (progressive and (restart_interval or per_component_scans))
    assert not (per_component_scans and sub)

    def comp_grid(ci: int) -> tuple[int, int]:
        hi, vi = samp[ci]
        return _comp_block_grid({"h": hi, "v": vi}, hmax, vmax, h, w)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    def sos_seg(comp_tabs: list[tuple[int, int, int]], ss: int, se: int,
                ah: int, al: int) -> bytes:
        body = bytes([len(comp_tabs)])
        for ci, td, ta in comp_tabs:
            body += bytes((ci + 1, (td << 4) | ta))
        return seg(0xFFDA, body + bytes((ss, se, (ah << 4) | al)))

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
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    if c == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
    if not progressive:
        out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        if c == 3:
            out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))

    if progressive:
        # --- scan 1: DC first, all components interleaved, Al=1 ---------
        bw = _BitWriter()
        prev = [0] * c
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(c):
                    hi, vi = samp[ci]
                    dc_codes = codes[ci][0]
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(zz[ci][my * vi + by, mx * hi + bx, 0]) >> 1
                            t, bits = _magnitude(v - prev[ci])
                            prev[ci] = v
                            ln, code = dc_codes[t]
                            bw.write(code, ln)
                            bw.write(bits, t)
        bw.flush()
        out += sos_seg([(ci, 0 if ci == 0 else 1, 0) for ci in range(c)],
                       0, 0, 0, 1)
        out += bw.out
        # --- scan 2: DC refinement (raw bits, Ah=1 -> Al=0) --------------
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(c):
                    hi, vi = samp[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            bw.write(int(zz[ci][my * vi + by, mx * hi + bx, 0]) & 1, 1)
        bw.flush()
        out += sos_seg([(ci, 0, 0) for ci in range(c)], 0, 0, 1, 0)
        out += bw.out
        # --- AC scans: first (Al=1) then refine, luma band split ---------
        ac_scans = []
        for refine in (False, True):
            for ci in range(c):
                bands = [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]
                for ss_, se_ in bands:
                    ac_scans.append((ci, ss_, se_, refine))
        for ci, ss_, se_, refine in ac_scans:
            bh_, bw_blocks = comp_grid(ci)
            emit = _emit_ac_refine if refine else _emit_ac_first
            coll = _SymCollector()
            emit(zz[ci], bh_, bw_blocks, ss_, se_, 1 if not refine else 0, coll)
            bits, vals, sym_codes = _uniform_dht(coll.syms)
            out += dht(1, 0, bits, vals)  # redefine AC slot 0 per scan
            bw = _BitWriter()
            emit(zz[ci], bh_, bw_blocks, ss_, se_, 1 if not refine else 0,
                 _SymWriter(sym_codes, bw))
            bw.flush()
            out += sos_seg([(ci, 0, 0)], ss_, se_,
                           1 if refine else 0, 0 if refine else 1)
            out += bw.out
    elif per_component_scans:
        for ci in range(c):
            bh_, bw_blocks = comp_grid(ci)
            dc_codes, ac_codes = codes[ci]
            bw = _BitWriter()
            prev_dc = 0
            for by in range(bh_):
                for bx in range(bw_blocks):
                    prev_dc = _emit_block(
                        zz[ci][by, bx], prev_dc, dc_codes, ac_codes, bw
                    )
            bw.flush()
            out += sos_seg([(ci, 0 if ci == 0 else 1, 0 if ci == 0 else 1)],
                           0, 63, 0, 0)
            out += bw.out
    else:
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
        out += sos_seg(
            [(ci, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(c)],
            0, 63, 0, 0,
        )
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers.

    Round-6 rewrite for throughput (the per-symbol Python loop was the
    image tier's 100 TB wall): ONE vectorized numpy pre-pass per restart
    segment un-stuffs the bytes and locates the terminator; reads are then
    O(1) shifts out of a precomputed sliding 32-bit window, and
    :func:`_huff_decode` resolves a whole code with ONE 16-bit peek + LUT
    hit instead of up to 16 read(1) calls.  The ERROR/POSITION semantics
    of the byte-at-a-time reader are preserved exactly:

    * exhausting a segment whose terminator is RSTn raises ``_RestartHit``
      (mid-symbol restart = corrupt), any other marker raises
      ``jpeg_truncated:marker_in_scan``, and end-of-buffer raises
      ``IndexError`` (the decode_jpeg wrapper maps it to
      ``jpeg_truncated:unexpected_eof``) — at the same consumption points,
      because a read only fails when the byte reader's lazy _fill would
      have hit the same terminator;
    * ``pos`` reports the byte position after the last (lazily) filled
      byte: ceil(bits_read/8) unstuffed bytes, mapped back through the
      stuffing to the original offsets;
    * ``restart()`` scans the RAW bytes forward for the next RSTn exactly
      like the original (skipping pad/junk bytes, walking past non-RST
      markers) and resumes with a fresh segment after it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self._arr = np.frombuffer(data, dtype=np.uint8)
        self._load_segment(pos)

    def _load_segment(self, start: int) -> None:
        """Un-stuff from ``start`` to the next terminator (vectorized)."""
        arr = self._arr
        n = len(arr)
        self._seg_start = start
        # candidate special points: every 0xFF at/after start
        ffs = np.nonzero(arr[start:] == 0xFF)[0] + start
        # walk the 0xFF list to find the first non-stuffing occurrence;
        # everything before it is segment data with 0xFF00 -> 0xFF
        stuffed = []  # positions of 0xFF bytes that are stuffed (keep 0xFF, drop 0x00)
        term_kind = "eof"   # eof | rst | marker
        term_pos = n
        for f in ffs:
            if f + 1 >= n:
                # lone trailing 0xFF: the byte reader's _fill would index
                # past the end reading its pair — the 0xFF itself is not
                # consumable data
                term_kind, term_pos = "eof", int(f)
                break
            nxt = arr[f + 1]
            if nxt == 0x00:
                stuffed.append(f)
                continue
            if 0xD0 <= nxt <= 0xD7:
                term_kind, term_pos = "rst", int(f)
            else:
                term_kind, term_pos = "marker", int(f)
            break
        data_end = term_pos
        keep = np.ones(data_end - start, dtype=bool)
        if stuffed:
            st = np.array(stuffed, dtype=np.int64)
            st = st[st < data_end]
            keep[st + 1 - start] = False  # drop the 0x00 of each FF00 pair
        useg = arr[start:data_end][keep]
        # original byte position AFTER consuming unstuffed byte k
        orig_idx = np.nonzero(keep)[0] + start + 1
        if stuffed:
            # a stuffed 0xFF consumes two original bytes
            is_stuffed = np.zeros(data_end - start, dtype=bool)
            st2 = np.array(stuffed, dtype=np.int64)
            st2 = st2[st2 < data_end]
            is_stuffed[st2 - start] = True
            orig_idx = orig_idx + is_stuffed[keep].astype(np.int64)
        self._orig_end = orig_idx
        self._term_kind = term_kind
        self._term_pos = term_pos
        # sliding 64-bit big-endian window at every byte offset, held as a
        # stdlib array('Q') so hot-loop indexing yields plain Python ints
        # (a numpy scalar extraction per access costs ~3x); 64 bits cover a
        # full Huffman code (<=16) plus its value bits (<=15) at any bit
        # offset, so one access decodes a whole symbol
        padded = np.concatenate([useg, np.zeros(8, dtype=np.uint8)]).astype(
            np.uint64
        )
        w = np.zeros(len(useg) + 1, dtype=np.uint64)
        for off in range(8):
            w |= padded[off : off + len(w)] << np.uint64(8 * (7 - off))
        import array as _array

        self._w = _array.array("Q", w.tobytes())
        self._nbits = 8 * len(useg)
        self._bp = 0  # bit position within the segment

    @property
    def pos(self) -> int:
        fills = (self._bp + 7) >> 3
        if fills == 0:
            return self._seg_start
        return int(self._orig_end[fills - 1])

    def _exhausted(self):
        """The lazy byte reader would fill past the terminator here."""
        if self._term_kind == "rst":
            raise _RestartHit()
        if self._term_kind == "marker":
            raise ValueError("jpeg_truncated:marker_in_scan")
        raise IndexError("entropy segment exhausted")

    def read(self, n: int) -> int:
        bp = self._bp
        if bp + n > self._nbits:
            self._exhausted()
        self._bp = bp + n
        if n == 0:
            return 0
        return (self._w[bp >> 3] >> (64 - (bp & 7) - n)) & ((1 << n) - 1)

    def restart(self) -> None:
        """Consume the RSTn marker at an aligned boundary."""
        data, n = self._arr, len(self._arr)
        p = self.pos
        while True:
            if p + 1 >= n:
                raise IndexError("no restart marker")
            if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                break
            p += 1  # skip pad bits/bytes before the marker
        self._load_segment(p + 2)


class _RestartHit(ValueError):
    """A restart marker reached mid-symbol: corrupt/truncated scan data
    (well-formed streams only hit RSTn at the aligned boundaries the
    decoder consumes explicitly)."""

    def __init__(self) -> None:
        super().__init__("jpeg_unexpected_restart")


class _HuffTable:
    """Canonical Huffman table with a flat 16-bit-prefix LUT: entry =
    ``(symbol << 8) | code_length`` (or -1 for an invalid prefix), so one
    peek resolves any code.

    ``ac2``/``dc2`` are FUSED code+value LUTs (built lazily, memoized with
    the table): whenever ``code_len + value_size <= 16`` the value bits sit
    INSIDE the same 16-bit peek, so one lookup yields the already-extended
    coefficient — entry = ``(value+32768) << 12 | typ << 10 | run << 6 |
    total_bits`` (typ 1 = EOB, 2 = ZRL), -1 for an invalid prefix, -2 for
    "resolve via the two-step path" (value spills past the peek, or a
    corrupt DC category — the fallback reproduces the exact error).  The
    build derives each entry from the same window arithmetic the runtime
    path uses, so decoded integers are identical by construction."""

    __slots__ = ("d", "lut", "_lut_np", "_ac2", "_dc2")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.d = {lc: sym for sym, lc in zip(vals, _canonical_codes(bits))}
        lut = np.full(1 << 16, -1, dtype=np.int32)
        for (length, code), sym in self.d.items():
            lo = code << (16 - length)
            lut[lo : lo + (1 << (16 - length))] = (sym << 8) | length
        self._lut_np = lut
        self.lut = lut.tolist()  # plain-int indexing in the hot loop
        self._ac2 = None
        self._dc2 = None

    @property
    def ac2(self) -> list:
        if self._ac2 is None:
            self._ac2 = _fused_lut(self._lut_np, dc=False)
        return self._ac2

    @property
    def dc2(self) -> list:
        if self._dc2 is None:
            self._dc2 = _fused_lut(self._lut_np, dc=True)
        return self._dc2


def _fused_lut(e32: np.ndarray, dc: bool) -> list:
    """Vectorized build of the fused code+value LUT from the prefix LUT."""
    w = np.arange(1 << 16, dtype=np.int64)
    e = e32.astype(np.int64)
    ln = e & 0xFF
    sym = e >> 8
    size = np.where(dc, sym, sym & 0xF)
    run = 0 if dc else sym >> 4
    tot = ln + size
    valid = e >= 0
    ok = valid & (tot <= 16)
    if dc:
        # spec DC categories stop at 11; >15 must take the fallback so it
        # raises the exact jpeg_bad_dc_category error
        ok &= sym <= 15
    size_c = np.minimum(size, 16)  # clamp so shifts stay defined off-path
    mask = (np.int64(1) << size_c) - 1
    vraw = (w >> np.maximum(16 - np.minimum(tot, 16), 0)) & mask
    half = np.int64(1) << np.maximum(size_c - 1, 0)
    ext = np.where(size_c == 0, 0,
                   np.where(vraw >= half, vraw, vraw - mask))
    typ = 0 if dc else np.where(sym == 0x00, 1, np.where(sym == 0xF0, 2, 0))
    entry = tot | (run << 6) | (typ << 10) | ((ext + 32768) << 12)
    return np.where(ok, entry, np.where(valid, -2, -1)).tolist()


#: content-keyed _HuffTable memo — a pure function of the DHT spec, and
#: most corpora reuse the handful of Annex-K tables, so the ~1ms 65536-
#: entry LUT build would otherwise run 4x PER IMAGE (measured 22% of small-
#: image decode).  Bounded: each entry is ~0.5 MB.
_HUFF_MEMO: dict = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = (tuple(bits), tuple(vals))
    tab = _HUFF_MEMO.get(key)
    if tab is None:
        if len(_HUFF_MEMO) >= 64:
            _HUFF_MEMO.clear()
        tab = _HuffTable(bits, vals)
        _HUFF_MEMO[key] = tab
    return tab


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    """One 16-bit peek + LUT hit on the fast path; within 16 bits of the
    segment terminator fall back to the original bit-by-bit walk so codes
    that legitimately complete there still decode, and exhaustion raises
    at the exact point the byte-at-a-time reader would."""
    bp = reader._bp
    if bp + 16 <= reader._nbits:
        peek = (reader._w[bp >> 3] >> (48 - (bp & 7))) & 0xFFFF
        e = table.lut[peek]
        if e < 0:
            raise ValueError("jpeg_bad_huffman_code")
        reader._bp = bp + (e & 0xFF)
        return e >> 8
    length, code = 0, 0
    d = table.d
    while length < 17:
        code = (code << 1) | reader.read(1)
        length += 1
        sym = d.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg_bad_huffman_code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


#: sanity cap on SOF-declared pixel count (corrupt headers would otherwise
#: drive multi-GB coefficient allocations before any entropy data is read)
MAX_PIXELS = 1 << 26


def decode_jpeg(raw: bytes) -> np.ndarray:
    """JFIF bytes -> (H, W, C) uint8 (C = 1 gray / 3 RGB).  Baseline
    sequential (SOF0/1, incl. per-component multi-scan) and progressive
    (SOF2, spectral selection + successive approximation, EOB runs)."""
    try:
        return _decode_jpeg_inner(raw)
    except (IndexError, struct.error, MemoryError, OverflowError):
        # ran off the end of a segment/scan: uniform truncation error (the
        # UDF error path contracts on ValueError)
        raise ValueError("jpeg_truncated:unexpected_eof") from None


def _block_seq(reader, dc_lut, ac_lut, zz, pred: int) -> int:
    """Sequential full-precision data unit (T.81 F.2.2): DC diff + all 63
    AC coefficients into the zigzag-space row ``zz``; returns the new DC
    predictor.

    Hot path (round 6): the whole symbol loop runs on local ints — 16-bit
    peek + list-LUT Huffman resolve, value bits from the 32-bit window —
    with a per-symbol headroom check (code<=16 + value<=15 bits = 31).
    Within 31 bits of the segment terminator it falls back to the generic
    reader path, which reproduces the byte-at-a-time reader's exhaustion
    errors exactly."""
    w = reader._w
    nbits = reader._nbits
    bp = reader._bp
    if bp + 31 <= nbits:
        t64 = w[bp >> 3]
        sh = 64 - (bp & 7)
        e2 = dc_lut.dc2[(t64 >> (sh - 16)) & 0xFFFF]
        if e2 >= 0:
            # fused LUT: code resolved AND value extracted+extended in one
            # lookup (the value bits provably sit inside the same 16-bit
            # peek the LUT is indexed by)
            pred += (e2 >> 12) - 32768
            bp += e2 & 63
        elif e2 == -1:
            raise ValueError("jpeg_bad_huffman_code")
        else:
            # two-step fallback: value spills past the peek, or corrupt DC
            # category (t > 15) — same errors as before
            e = dc_lut.lut[(t64 >> (sh - 16)) & 0xFFFF]
            t = e >> 8
            ln = e & 0xFF
            if t > 15:
                # only possible via a corrupt DHT: spec DC categories stop
                # at 11; an unchecked t would read t bits into an unbounded
                # magnitude
                raise ValueError(f"jpeg_bad_dc_category:{t}")
            if t:
                v = (t64 >> (sh - ln - t)) & ((1 << t) - 1)
                pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
            bp += ln + t
        # buffer coefficients in a plain list and assign the row ONCE —
        # ~45 numpy scalar setitems per block cost more than the full-row
        # copy (sequential blocks are written exactly once, so unset
        # positions staying 0 is correct)
        buf = [0] * 64
        buf[0] = pred
        k = 1
        ac2 = ac_lut.ac2
        while k < 64:
            if bp + 31 > nbits:
                reader._bp = bp
                zz[:] = buf
                _block_seq_tail(reader, ac_lut, zz, k)
                return pred
            t64 = w[bp >> 3]
            sh = 64 - (bp & 7)
            e2 = ac2[(t64 >> (sh - 16)) & 0xFFFF]
            if e2 >= 0:
                typ = e2 & 0xC00
                if typ == 0:  # coefficient, value fused into the entry
                    k += (e2 >> 6) & 0xF
                    if k > 63:
                        raise ValueError("jpeg_coef_overflow")
                    buf[k] = (e2 >> 12) - 32768
                    bp += e2 & 63
                    k += 1
                    continue
                if typ == 0x400:  # EOB
                    bp += e2 & 63
                    break
                bp += e2 & 63  # ZRL
                k += 16
                continue
            if e2 == -1:
                raise ValueError("jpeg_bad_huffman_code")
            # two-step fallback: value bits spill past the 16-bit peek
            e = ac_lut.lut[(t64 >> (sh - 16)) & 0xFFFF]
            sym = e >> 8
            ln = e & 0xFF
            k += sym >> 4
            size = sym & 0x0F
            if k > 63:
                raise ValueError("jpeg_coef_overflow")
            if size:
                v = (t64 >> (sh - ln - size)) & ((1 << size) - 1)
                buf[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            bp += ln + size
            k += 1
        reader._bp = bp
        zz[:] = buf
        return pred
    # segment nearly exhausted: generic path end to end
    t = _huff_decode(reader, dc_lut)
    if t > 15:
        raise ValueError(f"jpeg_bad_dc_category:{t}")
    diff = _extend(reader.read(t), t) if t else 0
    pred += diff
    zz[0] = pred
    _block_seq_tail(reader, ac_lut, zz, 1)
    return pred


def _block_seq_tail(reader, ac_lut, zz, k: int) -> None:
    """Generic AC loop from position ``k`` (the near-terminator path)."""
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


def _block_dc_first(reader, dc_lut, zz, pred: int, al: int) -> int:
    """Progressive DC first scan (T.81 G.1.2.1): diff of DC >> Al."""
    t = _huff_decode(reader, dc_lut)
    if t > 15:
        raise ValueError(f"jpeg_bad_dc_category:{t}")
    diff = _extend(reader.read(t), t) if t else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _block_ac_first(reader, ac_lut, zz, ss: int, se: int, al: int, eobrun) -> None:
    """Progressive AC first scan over band Ss..Se (T.81 G.1.2.2) with
    end-of-band runs; ``eobrun`` is a 1-element list carried across
    blocks."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        sym = _huff_decode(reader, ac_lut)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1
            if r:
                eobrun[0] += reader.read(r)
            return
        k += r
        if k > se:
            raise ValueError("jpeg_coef_overflow")
        zz[k] = _extend(reader.read(s), s) << al
        k += 1


def _block_ac_refine(reader, ac_lut, zz, ss: int, se: int, al: int, eobrun) -> None:
    """Progressive AC refinement scan (T.81 G.1.2.3): one correction bit
    per already-nonzero coefficient, newly-significant coefficients coded
    as ±1<<Al after a run of zero-HISTORY positions, EOB runs append
    correction bits for the rest of the band."""
    p1 = 1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_lut)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.read(r)
                    break
                # ZRL: skip 16 zero-history positions (refining on the way)
            else:
                if s != 1:
                    raise ValueError("jpeg_bad_refine_size")
                newval = p1 if reader.read(1) else -p1
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        zz[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun[0] > 0:
        while k <= se:
            v = int(zz[k])
            if v != 0:
                if reader.read(1) and (v & p1) == 0:
                    zz[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun[0] -= 1


def _comp_block_grid(comp, hmax, vmax, hh, ww) -> tuple[int, int]:
    """Block rows/cols of one component's OWN sampling grid (T.81 A.1.1 —
    the iteration space of a non-interleaved scan, which excludes the MCU
    padding blocks an interleaved scan would code)."""
    cw = -(-ww * comp["h"] // hmax)
    ch = -(-hh * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan(raw, pos, scan, ss, se, ah, al, progressive, coefs, hufs,
                 restart_interval, geom) -> int:
    """Entropy-decode one scan into the per-component coefficient stores;
    returns the byte offset of the next marker."""
    hh, ww, hmax, vmax, mcux, mcuy = geom
    reader = _BitReader(raw, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    eobrun = [0]

    for comp, tdc, tac in scan:
        need_dc = not progressive or (ss == 0 and ah == 0)
        need_ac = not progressive or ss > 0
        if need_dc and hufs.get((0, tdc)) is None:
            raise ValueError("jpeg_missing_table")
        if need_ac and hufs.get((1, tac)) is None:
            raise ValueError("jpeg_missing_table")

    def decode_unit(comp, tdc, tac, by, bx):
        zz = coefs[comp["id"]][by, bx]
        if not progressive:
            preds[comp["id"]] = _block_seq(
                reader, hufs[(0, tdc)], hufs[(1, tac)], zz, preds[comp["id"]]
            )
        elif ss == 0:
            if ah == 0:
                preds[comp["id"]] = _block_dc_first(
                    reader, hufs[(0, tdc)], zz, preds[comp["id"]], al
                )
            else:  # DC refinement: one raw bit, no Huffman table involved
                zz[0] = int(zz[0]) | (reader.read(1) << al)
        elif ah == 0:
            _block_ac_first(reader, hufs[(1, tac)], zz, ss, se, al, eobrun)
        else:
            _block_ac_refine(reader, hufs[(1, tac)], zz, ss, se, al, eobrun)

    unit_count = 0

    def maybe_restart():
        nonlocal unit_count
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            reader.restart()
            for cid in preds:
                preds[cid] = 0
            eobrun[0] = 0
        unit_count += 1

    if len(scan) > 1:  # interleaved: MCU order over the full padded grid
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for comp, tdc, tac in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            decode_unit(
                                comp, tdc, tac,
                                my * comp["v"] + by, mx * comp["h"] + bx,
                            )
    else:  # non-interleaved: the component's own block grid, no padding
        comp, tdc, tac = scan[0]
        bh, bw = _comp_block_grid(comp, hmax, vmax, hh, ww)
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_unit(comp, tdc, tac, by, bx)

    # advance to the next marker (skip pad bits / stray fill bytes)
    p = reader.pos
    while p + 1 < len(raw) and (
        raw[p] != 0xFF or raw[p + 1] == 0x00 or 0xD0 <= raw[p + 1] <= 0xD7
    ):
        p += 1
    if p + 1 >= len(raw):
        raise ValueError("jpeg_truncated:unexpected_eof")
    return p


def _decode_jpeg_inner(raw: bytes) -> np.ndarray:
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not_jpeg")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], dict] = {}
    sof = None
    progressive = False
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}
    geom = None
    got_scan = False
    while True:
        if pos + 2 > len(raw):
            raise ValueError(
                "jpeg_truncated:no_eoi" if got_scan else "jpeg_truncated:no_sos"
            )
        if raw[pos] != 0xFF:
            raise ValueError("jpeg_bad_marker")
        marker = raw[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            if not got_scan:
                raise ValueError("jpeg_truncated:eoi_before_sos")
            break
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
        elif marker == 0xC4:  # DHT (may hold several tables; legal between
            b = 0              # scans — progressive streams redefine slots)
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nval = sum(bits)
                vals = list(body[b + 17 : b + 17 + nval])
                hufs[(tclass, tid)] = _huff_table(bits, vals)
                b += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            if sof is not None:
                raise ValueError("jpeg_unsupported:multiple_sof")
            progressive = marker == 0xC2
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"jpeg_unsupported:precision={prec}")
            if hh * ww > MAX_PIXELS:
                raise ValueError(f"jpeg_unsupported:too_large:{hh}x{ww}")
            if hh == 0 or ww == 0 or nc == 0:
                raise ValueError("jpeg_bad_sof_dims")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"jpeg_unsupported:sampling={hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            if len({c["id"] for c in comps}) != nc:
                raise ValueError("jpeg_bad_sof_dup_component")
            sof = (hh, ww, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-ww // (8 * hmax))
            mcuy = -(-hh // (8 * vmax))
            geom = (hh, ww, hmax, vmax, mcux, mcuy)
            coefs = {
                c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
                for c in comps
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg_unsupported:sof=0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — decode the scan in place, keep parsing
            if sof is None:
                raise ValueError("jpeg_truncated:sos_before_sof")
            ns = body[0]
            if ns < 1 or ns > len(sof[2]) or len(body) < 4 + ns * 2:
                raise ValueError(f"jpeg_bad_scan_header:{ns}")
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2], body[2 + si * 2]
                matches = [c for c in sof[2] if c["id"] == cs]
                if not matches:
                    raise ValueError(f"jpeg_bad_scan_component:{cs}")
                scan.append((matches[0], tt >> 4, tt & 0x0F))
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ah, al = body[3 + ns * 2] >> 4, body[3 + ns * 2] & 0x0F
            if progressive:
                if ss > se or se > 63 or (ss == 0 and se != 0):
                    raise ValueError(f"jpeg_bad_progression:{ss}..{se}")
                if ss > 0 and ns != 1:
                    raise ValueError("jpeg_bad_progression:interleaved_ac")
                if ah and ah != al + 1:
                    raise ValueError(f"jpeg_bad_progression:ah={ah},al={al}")
            else:
                ss, se, ah, al = 0, 63, 0, 0  # fields are fixed in sequential
            pos = _decode_scan(
                raw, pos + 2 + seglen, scan, ss, se, ah, al, progressive,
                coefs, hufs, restart_interval, geom,
            )
            got_scan = True
            continue
        pos += 2 + seglen

    hh, ww, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for c in comps:
        qtab = qtabs.get(c["tq"])
        if qtab is None:
            raise ValueError("jpeg_missing_table")
        zz = coefs[c["id"]]
        bh, bw = zz.shape[0], zz.shape[1]
        raster = zz[:, :, UNZIGZAG].reshape(bh, bw, 8, 8).astype(np.float64)
        # dequant + IDCT vectorized over every block of the plane at once.
        # matmul (BLAS) replaces the naive-loop einsum triple contraction —
        # measured 9.3x on the IDCT (39% of 256x256 decode); outputs differ
        # from the einsum order only at ~1e-13 (measured max 2.8e-13, zero
        # uint8 pixel flips on 262k random-coefficient samples), the graded
        # jpeg_stats columns are metadata (dims/channels/sha1/error) and
        # pixel values are PSNR-gated in pytest, so the decode contract is
        # unchanged
        pix = np.matmul(np.matmul(_T.T, raster * qtab), _T) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:hh, :ww])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out_planes) != 3:
        raise ValueError(f"jpeg_unsupported:components={len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
