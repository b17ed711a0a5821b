"""Effective-bandwidth operator: analytic rolloff landmarks, the
upsample-plant contract, degenerate inputs, and the Spark pass against
the fixture's expected rows."""

import numpy as np

from valor_spark.operators.bandwidth import audio_bandwidth, bandwidth_ints
from valor_spark.sources.audio_fixture import build_audio_bandwidth_fixture


def test_single_tone_rolloff_is_tone_freq():
    """Analytic anchor: a pure tone's rolloff sits inside the tone's main
    lobe at BOTH fractions, at any rate."""
    for sr, f in ((48000, 6000.0), (16000, 1000.0)):
        t = np.arange(2 * sr)
        sig = (9000 * np.sin(2 * np.pi * f * t / sr)).astype(np.int16)
        _n, r95, r99, hf = bandwidth_ints(sig, sr)
        lobe = 2.5 * (1.0 / 0.064)  # Hann main lobe in Hz
        assert abs(r95 - f) <= lobe and abs(r99 - f) <= lobe
        assert hf == 0  # tone below sr/4 in both cases


def test_brickwall_plant_detected():
    """The upsample plant: 48 kHz container, content brickwalled at 4 kHz
    -> rolloff99 lands at/below the wall (windowing only ever moves power
    DOWN in frequency here) and within a lobe of it, hf_permille = 0;
    honest full-band noise keeps rolloff99 near Nyquist and a large
    hf_permille."""
    rng = np.random.default_rng(5)
    sr = 48000
    x = 9000 * rng.standard_normal(sr * 2)
    spec = np.fft.rfft(x)
    freqs = np.arange(spec.size) * (sr / len(x))
    spec[freqs > 4000] = 0.0
    lim = np.clip(np.round(np.fft.irfft(spec, n=len(x))), -32768, 32767).astype(np.int16)
    _n, r95, r99, hf = bandwidth_ints(lim, sr)
    assert r99 <= 4000 + 40 and r95 <= r99
    assert hf == 0
    full = np.clip(np.round(x), -32768, 32767).astype(np.int16)
    _n, fr95, fr99, fhf = bandwidth_ints(full, sr)
    assert fr99 > 0.95 * (sr / 2) and fhf > 400


def test_degenerate_inputs():
    assert bandwidth_ints(np.empty(0, np.int16), 48000) == (0, None, None, None)
    assert bandwidth_ints(np.zeros(48000, np.int16), 48000) == (
        48000, None, None, None,
    )
    assert bandwidth_ints(np.ones(100, np.int16), 0) == (100, None, None, None)
    # sub-frame clip still analyzes via the zero-padded single frame
    sr = 48000
    t = np.arange(1000)
    sig = (9000 * np.sin(2 * np.pi * 6000 * t / sr)).astype(np.int16)
    _n, r95, r99, hf = bandwidth_ints(sig, sr)
    assert r95 is not None and abs(r99 - 6000) <= 500


def test_audio_bandwidth_spark_matches_fixture(spark, tmp_path):
    paths = build_audio_bandwidth_fixture(str(tmp_path))
    got = (
        audio_bandwidth(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 10
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id
    by_id = {r.clip_id: r for r in got}
    # the gate's reason to exist: the 48k container with 4k content
    assert by_id["bw_up4000"].rolloff99_hz <= 4100
    assert by_id["bw_up4000"].hf_permille == 0
    assert by_id["bw_full48"].rolloff99_hz > 20000


def test_bandwidth_rules_violations(spark, tmp_path):
    """bandwidth_rules over the fixture: the three upsample plants fire
    (including the ADPCM low-band row), silence is unmeasurable, decode
    errors surface, and honest full-band/telephony rows pass."""
    from valor_spark.plans.engine import validate
    from valor_spark.plans.pipeline import bandwidth_rules

    paths = build_audio_bandwidth_fixture(str(tmp_path))
    bw = audio_bandwidth(spark.read.parquet(paths["data"]))
    res = validate(bw, bandwidth_rules(), key_cols=["clip_id"])
    viol = {
        (r.clip_id, r.rule): r.error
        for r in res.violations().select("clip_id", "rule", "error").collect()
    }
    ups = {k[0] for k in viol if k[1] == "upsample_provenance"}
    assert ups == {"bw_up4000", "bw_up8000", "bw_adpcm"}
    assert viol[("bw_silence", "bandwidth_unmeasurable")] == "Unmeasurable"
    assert ("bw_full48", "upsample_provenance") not in viol
    assert ("bw_tele8k", "upsample_provenance") not in viol
    assert viol[("bw_trunc", "audio_decode")].startswith("DecodeError:")
