"""Sample-rate canonicalization: polyphase rational resampling.

A 10^12-clip corpus arrives at whatever rates the sources recorded
(8/22.05/44.1/48 kHz ...); every training consumer wants ONE rate.  This
operator converts int16 PCM between arbitrary integer rates with a
Kaiser-windowed-sinc polyphase filter — the textbook L-up / M-down
structure (Crochiere & Rabiner, "Multirate Digital Signal Processing"),
evaluated WITHOUT materializing the L-times upsampled signal:

    y[k] = L * sum_t  h[p + t*L] * x[s - t],   k*M + D = s*L + p

so the cost is ``taps_per_phase`` multiplies per OUTPUT sample
(a numpy gather + row-wise product-sum — vectorized across the whole
clip, never per-sample Python).  ``D`` centers the linear-phase filter so
the output aligns with the input timeline (no leading group-delay shift).

Spark surface: one shuffle-free ``mapInArrow`` pass over the pruned
payload projection, inheriting every ``decode_one`` codec; integer
outputs only (the resampled PCM itself stays executor-side — a 100 TB
re-rate job would write it straight back out per partition, which is
``audio_resample_stats``'s write-path twin).

Reference parity note: the reference engine (mastarija/valor,
lib/Data/Valor.hs) has no audio layer; this extends the graft's payload
canonicalization surface (operators/audio.py, loudness.py, defects.py).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame

#: taps per polyphase branch.  beta=8.6 buys ~90 dB stopband at ANY
#: length; the length buys TRANSITION WIDTH: ~5.7/N of the upsampled
#: rate.  64 keeps the transition ~700 Hz for an 8->16 kHz upsample, so
#: a 3.5 kHz tone passes at full gain while its 4.5 kHz folded image is
#: in full stopband — at 16 taps (transition ~2.8 kHz) the image leaked
#: at -16 dB, measured.  Cost is linear in this constant.
TAPS_PER_PHASE = 64
KAISER_BETA = 8.6


@lru_cache(maxsize=64)
def _polyphase_bank(l: int, m: int) -> np.ndarray:
    """(L, T) filter bank for L-up/M-down: row p holds h[p + t*L].

    Prototype: Kaiser(beta)-windowed ideal lowpass at
    ``fc = min(1/(2L), 1/(2M))`` cycles per upsampled sample (the tighter
    of input-image rejection and output anti-aliasing), unit DC gain
    before the L upsampling-gain correction applied at evaluation.

    The prototype must span ``TAPS_PER_PHASE`` periods of the CUTOFF, so
    its length scales with ``max(L, M)`` (a decimator's transition band
    is narrow relative to the upsampled rate; sizing by L alone leaves a
    16-tap filter for any pure downsample — measured ~14-24 dB SNR
    instead of >55).  The length is ODD (2K+1, center at integer K) so
    the group delay is a WHOLE number of upsampled samples — an
    even-length bank centers at a half-sample, which for small L is a
    large fraction of an input sample and reads as ~10-24 dB of pure
    phase error against an aligned reference.  Zero-padding the tail to
    a multiple of L (for the reshape) changes neither response nor
    delay."""
    k = (TAPS_PER_PHASE // 2) * max(l, m)
    n_taps = 2 * k + 1
    n = np.arange(n_taps, dtype=np.float64)
    fc = min(1.0 / (2 * l), 1.0 / (2 * m))
    h = 2.0 * fc * np.sinc(2.0 * fc * (n - k))
    h *= np.kaiser(n_taps, KAISER_BETA)
    h /= h.sum()  # exact unit DC gain
    per_phase = -((-n_taps) // l)
    h = np.concatenate([h, np.zeros(per_phase * l - n_taps)])
    return np.ascontiguousarray(h.reshape(per_phase, l).T)


def resample_poly(sig: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Resample one int16 signal from ``sr_in`` to ``sr_out``; returns
    int16 of length ``ceil(n * L / M)``.  Identity (same object) when the
    rates match; empty in -> empty out."""
    if sr_in == sr_out:
        return sig
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError(f"bad rates {sr_in}->{sr_out}")
    n = len(sig)
    if n == 0:
        return np.empty(0, np.int16)
    g = math.gcd(sr_in, sr_out)
    l, m = sr_out // g, sr_in // g
    bank = _polyphase_bank(l, m)
    t = bank.shape[1]
    n_out = -((-n * l) // m)
    # group delay of the odd-length prototype: exactly K upsampled samples
    d = (TAPS_PER_PHASE // 2) * max(l, m)
    j = np.arange(n_out, dtype=np.int64) * m + d
    s = j // l
    p = (j - s * l).astype(np.int64)
    # x[s - t'] for t' in 0..T-1, with front pad T-1 and enough tail pad
    # to cover s_max = (n_out*m + d)//l
    tail = int(s[-1]) - (n - 1) + 1 if int(s[-1]) >= n else 1
    xp = np.concatenate(
        [
            np.zeros(t - 1, np.float64),
            sig.astype(np.float64),
            np.zeros(max(tail, 1), np.float64),
        ]
    )
    idx = (s + (t - 1))[:, None] - np.arange(t, dtype=np.int64)[None, :]
    y = np.einsum("kt,kt->k", xp[idx], bank[p]) * l
    return np.clip(np.rint(y), -32768, 32767).astype(np.int16)


def audio_resample_stats(clips: DataFrame, target_sr: int = 16000) -> DataFrame:
    """Per-clip re-rate pass: decode -> polyphase resample to
    ``target_sr`` -> integer summary ``(clip_id, src_sr, out_sr, n_in,
    n_out, dom_hz, decode_error)`` where ``dom_hz`` is the dominant
    spectral peak of the RESAMPLED signal (operators/audio.py::
    spectral_ints against ``target_sr``) — the end-to-end witness that
    the tone a clip carried survived the rate change at the right
    frequency.  ONE mapInArrow pass, no shuffle."""
    from valor_spark.operators.audio import (
        _binary_views,
        decode_one,
        spectral_ints,
    )

    sel = clips.select("clip_id", "bytes", "codec", "sr_hz")
    out_schema = (
        "clip_id string, src_sr int, out_sr int, n_in int, n_out int, "
        "dom_hz int, decode_error string"
    )

    def gen(batches):
        import pyarrow as pa

        for b in batches:
            nrows = b.num_rows
            get_bytes = _binary_views(b.column(1))
            codecs = b.column(2).to_pylist()
            rates = b.column(3).to_pylist()
            src_sr = np.zeros(nrows, np.int32)
            n_in = np.zeros(nrows, np.int32)
            n_out = np.zeros(nrows, np.int32)
            dom_hz = np.zeros(nrows, np.int32)
            errors: list[str | None] = [None] * nrows
            for i in range(nrows):
                rw = get_bytes(i)
                sr = rates[i] if rates[i] is not None else 0
                src_sr[i] = sr
                if rw is None:
                    errors[i] = "null_bytes"
                    continue
                if sr <= 0:
                    errors[i] = "bad_rate"
                    continue
                cod = codecs[i]
                if cod == "pcm_s16le":
                    if len(rw) % 2:
                        errors[i] = "odd_byte_length"
                        continue
                    sig = rw.view("<i2")
                else:
                    sig, _rate, err = decode_one(rw.tobytes(), cod)
                    if err is not None:
                        errors[i] = err
                        continue
                n_in[i] = len(sig)
                out = resample_poly(np.asarray(sig), sr, target_sr)
                n_out[i] = len(out)
                dom_hz[i] = spectral_ints(out, target_sr)[2]
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    pa.array(src_sr, pa.int32()),
                    pa.array(
                        np.full(nrows, target_sr, np.int32), pa.int32()
                    ),
                    pa.array(n_in, pa.int32()),
                    pa.array(n_out, pa.int32()),
                    pa.array(dom_hz, pa.int32()),
                    pa.array(errors, pa.string()),
                ],
                names=[
                    "clip_id",
                    "src_sr",
                    "out_sr",
                    "n_in",
                    "n_out",
                    "dom_hz",
                    "decode_error",
                ],
            )

    return sel.mapInArrow(gen, out_schema)
