"""Polyphase resampler: kernel quality landmarks (SNR vs analytically
synthesized tones, alias/image rejection, length/delay contracts) and the
Spark pass against the fixture's spec-derived expected rows."""

import math

import numpy as np

from valor_spark.operators.resample import (
    TAPS_PER_PHASE,
    _polyphase_bank,
    audio_resample_stats,
    resample_poly,
)
from valor_spark.sources.audio_fixture import build_audio_resample_fixture


def _tone(f, sr, n, amp=20000.0, phase=0.3):
    t = np.arange(n) / sr
    return np.clip(
        np.rint(amp * np.sin(2 * np.pi * f * t + phase)), -32768, 32767
    ).astype(np.int16)


def _snr(y, ref):
    err = y.astype(np.float64) - ref.astype(np.float64)
    ps = float(np.mean(ref.astype(np.float64) ** 2))
    pe = float(np.mean(err ** 2))
    return 10 * math.log10(ps / pe) if pe > 0 else math.inf


def test_tone_snr_across_rate_pairs():
    """Every whitelist rate pair reconstructs a mid-band tone at >= 70 dB
    against the analytic tone at the TARGET rate — i.e. frequency, phase
    (integer group delay), and amplitude (unit DC gain) all survive."""
    for sr_in, sr_out, f in [
        (44100, 16000, 1000),
        (48000, 16000, 997),
        (8000, 16000, 440),
        (22050, 16000, 2500),
        (24000, 16000, 3000),
        (16000, 48000, 1000),
        (16000, 8000, 1500),
    ]:
        y = resample_poly(_tone(f, sr_in, sr_in), sr_in, sr_out)
        ref = _tone(f, sr_out, len(y))
        s = _snr(y[512:-512], ref[512:-512])
        assert s >= 70.0, (sr_in, sr_out, f, s)


def test_band_edge_tone_still_reconstructs():
    # 15 kHz against a 22.05 kHz source Nyquist: inside the passband but
    # in the droop region — quality degrades gracefully, not off a cliff
    y = resample_poly(_tone(15000, 44100, 44100), 44100, 48000)
    s = _snr(y[512:-512], _tone(15000, 48000, len(y))[512:-512])
    assert s >= 55.0, s


def test_alias_rejection():
    """A 10 kHz tone is OUT of band for a 16 kHz target: after 44.1k->16k
    it must be attenuated to noise (>= 35 dB below its in-band RMS)."""
    y = resample_poly(_tone(10000, 44100, 44100), 44100, 16000)
    rms = float(np.sqrt(np.mean(y[512:-512].astype(np.float64) ** 2)))
    assert rms < 14142 / 50, rms  # >= ~34 dB down


def test_image_rejection_on_upsample():
    """Upsampling 8k->16k must kill the 12.5 kHz spectral image of a
    3.5 kHz tone, or every downstream spectrum reads the image."""
    from valor_spark.operators.audio import spectral_ints

    y = resample_poly(_tone(3500, 8000, 8000), 8000, 16000)
    n, dom_bin, dom_hz, second, impurity = spectral_ints(y, 16000)
    assert dom_hz == 3500
    assert impurity < 50  # image < 5% of the tone


def test_length_identity_empty_and_errors():
    x = _tone(500, 16000, 1600)
    assert resample_poly(x, 16000, 16000) is x
    assert len(resample_poly(np.empty(0, np.int16), 8000, 16000)) == 0
    for n in (1, 7, 100, 32193):
        y = resample_poly(_tone(300, 44100, n), 44100, 16000)
        assert len(y) == -((-n * 160) // 441), n
    try:
        resample_poly(x, 0, 16000)
        raise AssertionError("bad rate accepted")
    except ValueError:
        pass


def test_bank_properties():
    """Odd-length prototype: unit DC gain splits exactly across phases;
    the padded reshape keeps every original tap."""
    for l, m in [(1, 3), (2, 1), (160, 441), (320, 441)]:
        bank = _polyphase_bank(l, m)
        assert bank.shape[0] == l
        # sum of ALL taps = 1 (unit DC gain): each phase ~1/l
        assert abs(bank.sum() - 1.0) < 1e-12
        k = (TAPS_PER_PHASE // 2) * max(l, m)
        assert bank.shape[1] * l >= 2 * k + 1


def test_audio_resample_stats_matches_fixture(spark, tmp_path):
    paths = build_audio_resample_fixture(str(tmp_path))
    got = (
        audio_resample_stats(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 12
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id
