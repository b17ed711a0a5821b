"""Perceptual audio fingerprinting (landmark constellation): determinism,
transcode/gain/rate robustness, negative controls, the boilerplate
frequency cap, and the Spark near-dup join against the ANALYTIC
plant-structure oracle."""

import numpy as np
import pytest

from valor_spark.operators.audio_fp import (
    audio_fingerprints,
    audio_near_dup_fp,
    fingerprint_ints,
)
from valor_spark.sources.audio_fixture import (
    _fp_programs,
    _fp_synth,
    build_audio_fp_fixture,
)


def _aligned_matches(h1, t1, h2, t2) -> int:
    """Reference offset-histogram vote in plain python."""
    from collections import Counter

    by_hash = {}
    for h, t in zip(h2.tolist(), t2.tolist()):
        by_hash.setdefault(h, []).append(t)
    votes = Counter()
    for h, t in zip(h1.tolist(), t1.tolist()):
        for tb in by_hash.get(h, ()):
            votes[t - tb] += 1
    return max(votes.values()) if votes else 0


def test_fingerprints_deterministic_and_nonempty():
    notes = list(_fp_programs().values())[0]
    pcm = _fp_synth(notes, 16000)
    h1, t1 = fingerprint_ints(pcm, 16000)
    h2, t2 = fingerprint_ints(pcm.copy(), 16000)
    assert h1.size > 50
    assert np.array_equal(h1, h2) and np.array_equal(t1, t2)


def test_gain_and_transcode_invariance():
    """The same program at -10 dB gain, after G.711 mu-law companding, and
    after IMA ADPCM must keep a dominant aligned-offset vote; a different
    program must not."""
    from valor_spark.operators import adpcm as AD
    from valor_spark.operators.audio import (
        ULAW_DECODE_LUT,
        decode_one,
        encode_g711,
    )

    progs = _fp_programs()
    names = list(progs)
    pcm = _fp_synth(progs[names[0]], 16000)
    h0, t0 = fingerprint_ints(pcm, 16000)

    quiet = np.round(pcm.astype(np.float64) * 0.316).astype(np.int16)
    ulaw = ULAW_DECODE_LUT[np.frombuffer(encode_g711(pcm, "mulaw"), np.uint8)]
    adp, _r, err = decode_one(
        AD.wav_ima_adpcm(pcm, rate=16000, block_align=256), "wav"
    )
    assert err is None
    for variant in (quiet, ulaw, adp):
        h, t = fingerprint_ints(np.asarray(variant), 16000)
        assert _aligned_matches(h0, t0, h, t) >= 20
    other = _fp_synth(progs[names[1]], 16000)
    ho, to = fingerprint_ints(other, 16000)
    assert _aligned_matches(h0, t0, ho, to) < 8


def test_rate_portability():
    """Hz-quantized landmarks: the same program synthesized at 16 kHz and
    48 kHz shares an aligned constellation (frame/hop scale with sr, so
    both the Hz bins and the frame clock line up)."""
    notes = list(_fp_programs().values())[2]
    h16, t16 = fingerprint_ints(_fp_synth(notes, 16000), 16000)
    h48, t48 = fingerprint_ints(_fp_synth(notes, 48000), 48000)
    assert _aligned_matches(h16, t16, h48, t48) >= 20


def test_degenerate_inputs():
    assert fingerprint_ints(np.empty(0, np.int16), 16000)[0].size == 0
    assert fingerprint_ints(np.zeros(16000, np.int16), 16000)[0].size == 0
    assert fingerprint_ints(np.zeros(100, np.int16), 16000)[0].size == 0
    assert fingerprint_ints(np.ones(16000, np.int16), 0)[0].size == 0


def test_near_dup_matches_analytic_oracle(spark, tmp_path):
    """End-to-end: pairs == every unordered pair within a plant variant
    group, nothing across groups, nothing involving noise/silence/error
    rows — the oracle is pure combinatorics over the plant spec."""
    paths = build_audio_fp_fixture(str(tmp_path))
    clips = spark.read.parquet(paths["data"])
    got = {
        (r.clip_a, r.clip_b)
        for r in audio_near_dup_fp(clips).select("clip_a", "clip_b").collect()
    }
    exp = {
        (r.clip_a, r.clip_b)
        for r in spark.read.parquet(paths["expected"]).collect()
    }
    assert got == exp
    assert len(exp) == 6 * 15  # 6 programs x C(6,2) variants


def test_frequency_cap_drops_boilerplate(spark, tmp_path):
    """A landmark shared by more clips than max_fp_freq contributes no
    candidates: with the cap below the variant-group size, every pair
    disappears (all fixture landmarks are group-wide)."""
    paths = build_audio_fp_fixture(str(tmp_path))
    clips = spark.read.parquet(paths["data"])
    assert audio_near_dup_fp(clips, max_fp_freq=2).count() == 0
