"""Waveform-defect operator: run-length landmarks, numpy-vs-pure-python
oracle agreement, and the Spark pass against the fixture's expected rows."""

import numpy as np

from valor_spark.operators.defects import _max_run, audio_defects, defect_ints
from valor_spark.sources.audio_fixture import (
    _defects_clip_set,
    _py_defects,
    build_audio_defects_fixture,
)


def test_max_run_landmarks():
    assert _max_run(np.array([], bool)) == 0
    assert _max_run(np.zeros(5, bool)) == 0
    assert _max_run(np.ones(5, bool)) == 5
    assert _max_run(np.array([1, 0, 1, 1, 0, 1, 1, 1], bool)) == 3
    assert _max_run(np.array([1, 1, 0, 0, 1], bool)) == 2


def test_defect_ints_analytic():
    sig = np.array(
        [1200] * 3 + [32767] * 4 + [0] * 5 + [-32768] * 2 + [100], np.int16
    )
    n, clipped, mcr, mzr, zms, dc = defect_ints(sig, 16000)
    assert (n, clipped, mcr, mzr) == (15, 6, 4, 5)
    assert zms == 5 * 1000 // 16000
    # all-zero: one long zero run, no clipping, zero DC
    assert defect_ints(np.zeros(16000, np.int16), 16000) == (
        16000, 0, 0, 16000, 1000, 0,
    )
    # constant +10% offset
    sig = np.full(1000, 3277, np.int16)
    assert defect_ints(sig, 16000)[5] == 100
    assert defect_ints(np.empty(0, np.int16), 16000) == (0, 0, 0, 0, 0, 0)


def test_numpy_matches_pure_python_on_every_plant():
    """The engine's numpy path and the fixture's pure-python arithmetic
    agree on every decodable plant (including the codec rows' decoded
    sample lists)."""
    for cid, _raw, sr, _codec, vals in _defects_clip_set():
        if vals is None:
            continue
        got = defect_ints(np.asarray(vals, np.int16), sr)
        assert got == _py_defects(vals, sr), cid


def test_transcode_hides_pins():
    """mu-law decode tops out below int16 full scale, so a hard-clipped
    source reads clipped_samples=0 after transcoding — the documented
    reason defect screening must run before lossy re-encoding."""
    rows = {r[0]: r for r in _defects_clip_set()}
    vals = rows["def_ulaw"][4]
    assert max(vals) < 32767 and min(vals) > -32768
    assert _py_defects(vals, 16000)[1] == 0


def test_defect_rules_violations(spark, tmp_path):
    """defect_rules over the fixture: decode errors, the hard-clip run
    gate, silence-vs-dropout disambiguation, and the DC line each fire on
    exactly their plants; the clean and single-peak rows pass."""
    from valor_spark.plans.engine import validate
    from valor_spark.plans.pipeline import defect_rules

    paths = build_audio_defects_fixture(str(tmp_path))
    det = audio_defects(spark.read.parquet(paths["data"]))
    res = validate(det, defect_rules(), key_cols=["clip_id"])
    viol = {
        (r.clip_id, r.rule): r.error
        for r in res.violations().select("clip_id", "rule", "error").collect()
    }
    assert viol[("def_clip", "clipping")] == "HardClipped:37"
    assert viol[("def_dropout", "dropout")] == "Dropout:30"
    assert viol[("def_silence", "silence")] == "AllSilence"
    assert ("def_silence", "dropout") not in viol  # silence is not a dropout
    assert viol[("def_dc", "dc_offset")] == "DCOffset:100"
    assert viol[("def_trunc", "audio_decode")].startswith("DecodeError:")
    assert viol[("def_badcodec", "audio_decode")].startswith("DecodeError:")
    clean = {"def_clean", "def_peak"}
    assert not {k for k in viol if k[0] in clean}
    # the rule tree stays one shuffle-free stage over the mapInArrow pass
    # barrier=False: default violations() checkpoints the slim frame,
    # which replaces the upstream plan with an RDD scan — the plan
    # property lives in the lazy chain underneath
    plan = res.violations(barrier=False)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_audio_defects_spark_matches_fixture(spark, tmp_path):
    paths = build_audio_defects_fixture(str(tmp_path))
    got = (
        audio_defects(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 10
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id
    by_id = {r.clip_id: r for r in got}
    assert by_id["def_clip"].max_clip_run == 37
    assert by_id["def_dropout"].max_zero_run == 480
    assert by_id["def_dropout"].max_zero_run_ms == 30
    assert by_id["def_dc"].dc_offset_permille == 100
    assert by_id["def_peak"].max_clip_run == 1
    assert by_id["def_clean"].clipped_samples == 0
