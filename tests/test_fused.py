"""Fused one-decode audio pass: equality-by-construction against the
five family operators, and the gate fixture's expected rows."""

from valor_spark.operators.fused import audio_all_stats
from valor_spark.sources.audio_fixture import build_audio_fused_fixture


def test_fused_matches_fixture(spark, tmp_path):
    paths = build_audio_fused_fixture(str(tmp_path))
    got = (
        audio_all_stats(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 12
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id


def test_fused_equals_join_of_family_operators(spark, tmp_path):
    """The fused row carries exactly the five family operators' values on
    the same clips — no drift between the fused pass and the operators it
    replaces (the kernels are shared; this pins the plumbing)."""
    from valor_spark.operators.audio import audio_profile, audio_spectrum
    from valor_spark.operators.bandwidth import audio_bandwidth
    from valor_spark.operators.defects import audio_defects
    from valor_spark.operators.loudness import audio_loudness

    paths = build_audio_fused_fixture(str(tmp_path))
    clips = spark.read.parquet(paths["data"])
    fused = {r.clip_id: r for r in audio_all_stats(clips).collect()}

    prof = {r.clip_id: r for r in audio_profile(clips).collect()}
    spec = {r.clip_id: r for r in audio_spectrum(clips).collect()}
    loud = {r.clip_id: r for r in audio_loudness(clips).collect()}
    bw = {r.clip_id: r for r in audio_bandwidth(clips).collect()}
    det = {r.clip_id: r for r in audio_defects(clips).collect()}

    for cid, f in fused.items():
        if f.decode_error is not None:
            for fam in (prof, spec, loud, bw, det):
                assert fam[cid].decode_error == f.decode_error, cid
            continue
        p = prof[cid]
        assert (f.n_samples, f.peak_abs, f.sum_sq, f.n_clipped,
                f.n_silent, f.lead_silence, f.trail_silence) == (
            p.n_samples, p.peak_abs, p.sum_sq, p.n_clipped,
            p.n_silent, p.lead_silence, p.trail_silence), cid
        s = spec[cid]
        assert (f.dom_hz, f.impurity_milli) == (
            s.dom_hz, s.impurity_milli), cid
        l = loud[cid]
        assert (f.n_blocks, f.gated_blocks, f.lufs_milli,
                f.peak_milli_dbfs, f.true_peak_milli_dbtp) == (
            l.n_blocks, l.gated_blocks, l.lufs_milli,
            l.peak_milli_dbfs, l.true_peak_milli_dbtp), cid
        w = bw[cid]
        assert (f.src_sr, f.rolloff95_hz, f.rolloff99_hz,
                f.hf_permille) == (
            w.src_sr, w.rolloff95_hz, w.rolloff99_hz, w.hf_permille), cid
        d = det[cid]
        assert (f.max_clip_run, f.max_zero_run, f.max_zero_run_ms,
                f.dc_offset_permille) == (
            d.max_clip_run, d.max_zero_run, d.max_zero_run_ms,
            d.dc_offset_permille), cid


def test_corpus_audio_rules_one_project(spark, tmp_path):
    """The merged three-family rule gate stays ONE shuffle-free stage on
    top of the single fused decode pass, and each family fires on its
    plants."""
    from valor_spark.plans.engine import validate
    from valor_spark.plans.pipeline import corpus_audio_rules

    paths = build_audio_fused_fixture(str(tmp_path))
    fused = audio_all_stats(spark.read.parquet(paths["data"]))
    res = validate(fused, corpus_audio_rules(), key_cols=["clip_id"])
    viol = res.violations().select("clip_id", "rule", "error")
    # barrier=False for the PLAN assertion: the default path checkpoints
    # the slim frame, replacing the upstream plan with an RDD scan
    plan = (res.violations(barrier=False).select("clip_id", "rule", "error")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert plan.count("MapInArrow") == 1
    rules = {(r.clip_id, r.rule) for r in viol.collect()}
    assert ("def_clip", "clipping") in rules
    assert ("def_dropout", "dropout") in rules
    assert ("fu_up4k", "upsample_provenance") in rules
    assert ("fu_cal997", "loudness_range") in rules
    assert ("def_trunc", "audio_decode") in rules
