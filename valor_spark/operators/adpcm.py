"""IMA/DVI ADPCM codec (WAV format tag 0x11) — pure numpy, no audio libs.

The third real compressed-audio codec in the engine (after G.711 mu-law /
A-law): 4-bit adaptive differential PCM per the IMA Digital Audio Pack
"Recommended Practices for Enhancing Digital Audio Compatibility" rev 3.00
(the step/index tables every implementation shares; also IETF RFC 3551
§4.5.1 DVI4 and the Microsoft WAVE tag-0x11 block layout).

Why it vectorizes despite being a feedback codec: every ADPCM *block*
starts with its own (predictor, step-index) header, so blocks are mutually
independent.  The decoder therefore loops only over the WITHIN-BLOCK sample
position (``samples_per_block`` iterations, ~505 for the common 256-byte
block) while each iteration is a numpy op vectorized across ALL blocks of
the clip — per-sample Python cost is amortized 1/n_blocks, and at Arrow
batch level the same matrix shape lets a whole batch of equal-block clips
share one loop.  This is the sanctioned "bounded numpy work per row" shape:
no per-sample Python in the hot path, no state across rows.

Block layout (mono, tag 0x11): 4-byte header — predictor int16 LE, step
index uint8 (clamped to 0..88 on read; corrupt headers decode rather than
raise), reserved byte — then ``block_align - 4`` data bytes, two nibbles
each, LOW nibble first.  ``samples_per_block = (block_align - 4) * 2 + 1``
(the header predictor IS the first output sample).

Robustness contract (shared with the image decoders' fuzz gate): any
byte-level corruption — truncated blocks, out-of-range step indexes, sizes
not a multiple of block_align — decodes what is decodable or reports an
error string; it never raises out of ``decode_one``.
"""

from __future__ import annotations

import struct

import numpy as np

# fmt: off
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
# fmt: on
INDEX_ADJUST = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def samples_per_block(block_align: int) -> int:
    return (block_align - 4) * 2 + 1


def _decode_nibbles(nib: np.ndarray, pred0: np.ndarray, idx0: np.ndarray) -> np.ndarray:
    """Core IMA decode: ``nib`` is (B, L) uint8 nibbles, ``pred0``/``idx0``
    are the (B,) per-block header state.  Returns (B, L+1) int16 — column 0
    is the header predictor.  Loops over L; every op inside is vectorized
    over the B blocks."""
    B, L = nib.shape
    out = np.empty((B, L + 1), dtype=np.int16)
    pred = pred0.astype(np.int32)
    idx = np.clip(idx0.astype(np.int32), 0, 88)
    out[:, 0] = pred
    for t in range(L):
        n = nib[:, t]
        step = STEP_TABLE[idx]
        diff = step >> 3
        diff = diff + np.where(n & 4, step, 0)
        diff = diff + np.where(n & 2, step >> 1, 0)
        diff = diff + np.where(n & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(n & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + INDEX_ADJUST[n & 7], 0, 88)
        out[:, t + 1] = pred
    return out


def decode_ima_adpcm(
    data: bytes, block_align: int, total_samples: int | None = None
) -> np.ndarray:
    """Decode a mono tag-0x11 payload (concatenated blocks) to int16 PCM.

    Full blocks decode as one (n_blocks, block_align) matrix; a trailing
    partial block (>= 4 header bytes) decodes its available nibbles; fewer
    than 4 trailing bytes are unused padding.  ``total_samples`` (the WAV
    ``fact`` chunk) trims encoder padding in the final block."""
    if block_align < 5:
        raise ValueError(f"bad_block_align:{block_align}")
    buf = np.frombuffer(data, dtype=np.uint8)
    n_full = len(buf) // block_align
    pieces = []
    if n_full:
        blocks = buf[: n_full * block_align].reshape(n_full, block_align)
        pred0 = blocks[:, :2].copy().view("<i2").reshape(n_full).astype(np.int32)
        body = blocks[:, 4:]
        nib = np.empty((n_full, body.shape[1] * 2), dtype=np.uint8)
        nib[:, 0::2] = body & 0x0F  # low nibble first
        nib[:, 1::2] = body >> 4
        pieces.append(_decode_nibbles(nib, pred0, blocks[:, 2]).reshape(-1))
    tail = buf[n_full * block_align :]
    if len(tail) >= 4:
        (p0,) = struct.unpack_from("<h", tail.tobytes(), 0)
        body = tail[4:]
        nib = np.empty((1, len(body) * 2), dtype=np.uint8)
        nib[0, 0::2] = body & 0x0F
        nib[0, 1::2] = body >> 4
        pieces.append(
            _decode_nibbles(nib, np.array([p0]), tail[2:3]).reshape(-1)
        )
    if not pieces:
        raise ValueError("adpcm_no_blocks")
    pcm = np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
    if total_samples is not None and 0 <= total_samples <= len(pcm):
        pcm = pcm[:total_samples]
    return pcm


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 256) -> bytes:
    """int16 PCM -> mono tag-0x11 block stream (fixture/test synthesis
    side; scalar loop is fine at fixture scale).  The final block is padded
    by repeating the last sample; pair with a ``fact`` count to trim."""
    x = np.asarray(samples, dtype=np.int64)
    if len(x) == 0:
        return b""
    spb = samples_per_block(block_align)
    out = bytearray()
    idx = 0
    for start in range(0, len(x), spb):
        blk = x[start : start + spb]
        if len(blk) < spb:  # pad with the last sample (near-zero deltas)
            blk = np.concatenate([blk, np.full(spb - len(blk), blk[-1])])
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in blk[1:]:
            step = int(STEP_TABLE[idx])
            delta = int(s) - pred
            n = 0
            if delta < 0:
                n = 8
                delta = -delta
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            # reconstruct exactly as the decoder will
            diff = step >> 3
            if n & 4:
                diff += step
            if n & 2:
                diff += step >> 1
            if n & 1:
                diff += step >> 2
            pred = max(-32768, min(32767, pred + (-diff if n & 8 else diff)))
            idx = max(0, min(88, idx + int(INDEX_ADJUST[n & 7])))
            nibbles.append(n)
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out)


def wav_ima_adpcm(
    samples: np.ndarray, rate: int = 8000, block_align: int = 256
) -> bytes:
    """Wrap int16 PCM as a RIFF/WAVE tag-0x11 container (fmt extension with
    samples_per_block + a ``fact`` chunk carrying the true sample count, as
    compressed WAVs require)."""
    payload = encode_ima_adpcm(samples, block_align)
    spb = samples_per_block(block_align)
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(samples))
    chunks = b""
    for cid, body in ((b"fmt ", fmt), (b"fact", fact), (b"data", payload)):
        chunks += cid + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
