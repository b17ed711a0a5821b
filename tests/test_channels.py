"""Inter-channel QC operator: stereo WAV decode, integer-moment
landmarks, numpy-vs-pure-python oracle agreement, rule-algebra gating,
and the Spark pass against the fixture's expected rows."""

import numpy as np

from valor_spark.operators.channels import (
    audio_channels,
    channel_frames,
    channel_ints,
)
from valor_spark.sources.audio_fixture import (
    _channels_clip_set,
    _py_channels,
    _wav_multi,
    build_audio_channels_fixture,
)


def test_channel_ints_analytic():
    # exact inversion: dot = -ssq, phase = -1000, balance = 500
    l = np.array([100, -200, 300, -50], np.int16)
    frames = np.stack([l, -l], axis=1)
    nch, n, l2, r2, dot, dual, bal, phase = channel_ints(frames)
    assert (nch, n) == (2, 4)
    assert l2 == r2 == 100**2 + 200**2 + 300**2 + 50**2
    assert dot == -l2 and phase == -1000 and bal == 500 and dual == 0
    # bit-identical: dual_mono, phase = +1000
    nch, n, l2, r2, dot, dual, bal, phase = channel_ints(np.stack([l, l], axis=1))
    assert dual == 1 and phase == 1000 and bal == 500 and dot == l2
    # dead right: balance 1000, phase NULL (no energy to correlate)
    z = np.zeros(4, np.int16)
    nch, n, l2, r2, dot, dual, bal, phase = channel_ints(np.stack([l, z], axis=1))
    assert (r2, dot, bal, phase, dual) == (0, 0, 1000, None, 0)
    # mono: pair metrics NULL, ssq_l carries the energy
    assert channel_ints(l.reshape(-1, 1)) == (
        1, 4, int(np.sum(l.astype(np.int64) ** 2)), None, None, None, None, None,
    )
    # both-silent stereo: balance undefined, dual-mono trivially true
    nch, n, l2, r2, dot, dual, bal, phase = channel_ints(
        np.zeros((8, 2), np.int16)
    )
    assert (l2, r2, bal, phase, dual) == (0, 0, None, None, 1)


def test_channel_frames_layouts():
    li = [100, -100, 200, -200]
    ri = [50, -50, 25, -25]
    frames, err = channel_frames(_wav_multi([li, ri], 16000), "wav")
    assert err is None and frames.shape == (4, 2)
    assert frames[:, 0].tolist() == li and frames[:, 1].tolist() == ri
    # 3-channel de-interleave keeps channel identity
    frames, err = channel_frames(_wav_multi([li, ri, li], 16000), "wav")
    assert err is None and frames.shape == (4, 3)
    assert frames[:, 2].tolist() == li
    # raw PCM -> mono column
    frames, err = channel_frames(np.asarray(li, np.int16).tobytes(), "pcm_s16le")
    assert err is None and frames.shape == (4, 1)
    # errors propagate
    assert channel_frames(None, "wav")[1] == "null_bytes"
    assert channel_frames(b"\x00" * 10, "wav")[1] is not None
    assert channel_frames(b"\x00\x01" * 8, "opus")[1].startswith(
        "unsupported_codec"
    )


def test_numpy_matches_pure_python_on_every_plant():
    """The engine's decode->numpy path and the fixture's pure-python
    arbitrary-precision arithmetic agree on every decodable plant."""
    for cid, raw, _sr, codec, chans in _channels_clip_set():
        if chans is None:
            continue
        frames, err = channel_frames(raw, codec)
        assert err is None, cid
        assert channel_ints(frames) == _py_channels(chans), cid


def test_channel_rules_violations(spark, tmp_path):
    """channel_rules over the fixture: polarity inversion, dead-channel
    imbalance, dual-mono and decode errors fire on exactly their plants;
    true stereo, mono and 3-channel rows pass; mono NULLs keep the
    stereo rules inert."""
    from valor_spark.plans.engine import validate
    from valor_spark.plans.pipeline import channel_rules

    paths = build_audio_channels_fixture(str(tmp_path))
    ch = audio_channels(spark.read.parquet(paths["data"]))
    res = validate(ch, channel_rules(), key_cols=["clip_id"])
    viol = {
        (r.clip_id, r.rule): r.error
        for r in res.violations().select("clip_id", "rule", "error").collect()
    }
    assert viol[("ch_inverted", "phase_inversion")] == "PhaseInverted:-1000"
    assert viol[("ch_left_only", "channel_imbalance")] == "Imbalance:1000"
    assert ("ch_dead_right", "channel_imbalance") in viol
    assert viol[("ch_dual_mono", "dual_mono")] == "DualMono"
    assert viol[("ch_trunc", "audio_decode")].startswith("DecodeError:")
    assert viol[("ch_null", "audio_decode")] == "DecodeError:null_bytes"
    clean = {"ch_stereo_ok", "ch_mono_wav", "ch_raw_pcm", "ch_3ch", "ch_g711_wav"}
    assert not {k for k in viol if k[0] in clean}
    # the rule tree stays one shuffle-free stage over the mapInArrow pass
    # barrier=False: default violations() checkpoints the slim frame,
    # which replaces the upstream plan with an RDD scan — the plan
    # property lives in the lazy chain underneath
    plan = res.violations(barrier=False)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_audio_channels_spark_matches_fixture(spark, tmp_path):
    paths = build_audio_channels_fixture(str(tmp_path))
    got = (
        audio_channels(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 12
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id
    by_id = {r.clip_id: r for r in got}
    assert by_id["ch_3ch"].n_channels == 3
    assert by_id["ch_mono_wav"].n_channels == 1
    assert by_id["ch_mono_wav"].ssq_r is None
    assert by_id["ch_g711_wav"].n_channels == 1  # non-PCM tag, mono fallback
    assert by_id["ch_dual_mono"].dual_mono == 1
    assert by_id["ch_stereo_ok"].dual_mono == 0
