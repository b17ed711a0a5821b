"""BS.1770-4 K-weighted gated loudness: spec landmarks (48 kHz coefficient
table, 997 Hz calibration), gating semantics, and the Spark mapInArrow pass
against the fixture's locally-derived expected rows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valor_spark.operators.loudness import (
    k_biquads,
    loudness_ints,
    audio_loudness,
)


def test_k_biquads_match_published_48k_table():
    """The any-rate analog-prototype derivation must reproduce the
    BS.1770-4 published 48 kHz coefficient table (the spec's only
    normative coefficient set) to float64 round-off."""
    b1, a1, b2, a2 = k_biquads(48000)
    np.testing.assert_allclose(
        b1, [1.53512485958697, -2.69169618940638, 1.19839281085285],
        rtol=0, atol=1e-10,
    )
    np.testing.assert_allclose(
        a1, [1.0, -1.69065929318241, 0.73248077421585], rtol=0, atol=1e-10
    )
    np.testing.assert_allclose(b2, [1.0, -2.0, 1.0], rtol=0, atol=0)
    np.testing.assert_allclose(
        a2, [1.0, -1.99004745483398, 0.99007225036621], rtol=0, atol=1e-10
    )


def _sine(freq, sr, dur_s, amp=32767.0):
    t = np.arange(int(sr * dur_s))
    return np.clip(
        np.round(amp * np.sin(2.0 * np.pi * freq * t / sr)), -32768, 32767
    ).astype(np.int16)


def test_997hz_calibration_point():
    """Spec calibration: a 0 dBFS 997 Hz sine reads -3.01 LKFS at 48 kHz
    (BS.1770-4 Annex; the K-filter's 997 Hz gain is +0.691 dB-ish offset
    by the -0.691 constant).  Allow 10 milli-LU for the int16 quantize +
    circular-block approximation."""
    n, nb, gb, lufs, peak, tp = loudness_ints(_sine(997, 48000, 2.0), 48000)
    assert n == 96000 and nb == 17 and gb == 17
    assert abs(lufs - (-3010)) <= 10
    assert peak == 0  # 0 dBFS sample peak
    assert 0 <= tp <= 60  # true peak >= sample peak, within interpolator ripple


def test_level_linearity_and_rate_consistency():
    """-20 dB input level drops integrated loudness by 20 LU exactly, and
    the 440 Hz reading agrees across sample rates within 0.25 LU (the
    filter derivation is rate-parametric, not table-lookup; the residual
    is bilinear frequency warping, largest at 8 kHz)."""
    ref = loudness_ints(_sine(440, 48000, 1.5), 48000)[3]
    low = loudness_ints(_sine(440, 48000, 1.5, amp=3276.7), 48000)[3]
    assert abs((ref - low) - 20000) <= 12
    for sr in (8000, 16000, 44100):
        other = loudness_ints(_sine(440, sr, 1.5), sr)[3]
        assert abs(other - ref) <= 250, sr


def test_two_stage_gate_recovers_head_level():
    """A 1 s program at -20 dB followed by 4 s of -80 dB near-silence must
    gate the tail out: integrated loudness stays within 1.5 LU of the
    head-alone reading instead of averaging ~7 dB lower."""
    sr = 16000
    head = _sine(440, sr, 1.0, amp=3276.7)
    tail = _sine(440, sr, 4.0, amp=3.2767)
    n, nb, gb, lufs, _p, _tp = loudness_ints(np.concatenate([head, tail]), sr)
    head_only = loudness_ints(head, sr)[3]
    assert gb < nb  # gate actually dropped blocks
    assert abs(lufs - head_only) <= 1500


def test_degenerate_inputs():
    sr = 16000
    # true silence: blocks exist, all under the absolute gate, NULL lufs
    n, nb, gb, lufs, peak, tp = loudness_ints(np.zeros(sr, np.int16), sr)
    assert nb > 0 and gb == 0 and lufs is None and peak is None and tp is None
    # below the absolute gate (-80 dB tone): NULL lufs, real peak
    n, nb, gb, lufs, peak, tp = loudness_ints(_sine(440, sr, 1.0, amp=3.2767), sr)
    assert gb == 0 and lufs is None and peak is not None
    # shorter than one 400 ms block: no blocks, NULL lufs
    n, nb, gb, lufs, peak, tp = loudness_ints(_sine(440, sr, 0.2), sr)
    assert nb == 0 and lufs is None
    # empty / bad rate
    assert loudness_ints(np.empty(0, np.int16), sr) == (0, 0, 0, None, None, None)
    assert loudness_ints(_sine(440, sr, 1.0), 0)[3] is None


def test_audio_loudness_spark_matches_fixture(spark, tmp_path):
    """End-to-end mapInArrow pass over the loudness fixture equals the
    locally-derived expected table row-for-row (codec dispatch, error
    plants, NULL propagation included)."""
    from valor_spark.sources.audio_fixture import build_audio_loudness_fixture

    paths = build_audio_loudness_fixture(str(tmp_path))
    got = (
        audio_loudness(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) and len(got) >= 30
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id


def test_true_peak_sees_intersample_overs():
    """The canonical inter-sample over: a full-scale fs/4 sine sampled 45
    degrees off its crest has sample peak -3.01 dBFS but TRUE peak ~0
    dBTP — the 4x polyphase reconstruction must recover it within the
    interpolator's ripple; for a crest-sampled tone both peaks agree."""
    from valor_spark.operators.loudness import loudness_ints, true_peak

    sr = 48000
    n = np.arange(sr)
    off = np.clip(
        np.round(32767.0 * np.sin(2.0 * np.pi * n / 4.0 + np.pi / 4.0)),
        -32768, 32767,
    ).astype(np.int16)
    _m, _nb, _gb, _lufs, peak, tp = loudness_ints(off, sr)
    assert abs(peak - (-3010)) <= 5       # sample peak misses the crest
    assert abs(tp) <= 150                 # true peak recovers ~0 dBTP
    # crest-sampled 997 Hz tone: true peak within ripple of sample peak
    crest = _sine(997, sr, 1.0)
    _m, _nb, _gb, _lufs, peak2, tp2 = loudness_ints(crest, sr)
    assert tp2 >= peak2 - 5 and tp2 - peak2 <= 100
    assert true_peak(np.zeros(16, np.float64)) == 0.0


def test_loudness_rules_fire_per_plant(spark, tmp_path):
    """Every rule in the R128-style gate fires on its designed plant:
    decode errors, unmeasurable silence/short rows, TooQuiet/TooLoud
    window breaches, and the hot row's ClippingRisk; the -20 dB tones
    pass clean."""
    from valor_spark.plans.pipeline import loudness_rules
    from valor_spark.plans.engine import validate
    from valor_spark.sources.audio_fixture import build_audio_loudness_fixture

    paths = build_audio_loudness_fixture(str(tmp_path))
    loud = audio_loudness(spark.read.parquet(paths["data"]))
    res = validate(loud, loudness_rules(), key_cols=["clip_id"])
    rows = {(r.clip_id, r.rule, r.error) for r in
            res.violations().select("clip_id", "rule", "error").collect()}
    by_clip = {}
    for cid, rule, err in rows:
        by_clip.setdefault(cid, set()).add((rule, err.split(":")[0]))
    assert ("audio_decode", "DecodeError") in by_clip["badcodec"]
    assert ("audio_decode", "DecodeError") in by_clip["trunc"]
    assert ("loudness_measurable", "Unmeasurable") in by_clip["silence"]
    assert ("loudness_measurable", "Unmeasurable") in by_clip["too_short"]
    assert ("loudness_measurable", "Unmeasurable") in by_clip["all_quiet"]
    assert ("loudness_range", "TooQuiet") in by_clip["tone_440_40"]
    assert ("loudness_range", "TooLoud") in by_clip["tone_440_3"]
    assert ("true_peak", "ClippingRisk") in by_clip["hot"]
    # the -20 dB tones sit inside every window: no violations at all
    assert "tone_440_20" not in by_clip and "gate_0" not in by_clip
