"""Audio payload invariant: Arrow-batched decode + SNR>=30dB + transcript
equality, validated against the Python oracle of planted corruptions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from valor_spark.operators import audio as A
from valor_spark.sources import synthetic as S

from oracle_clips import expected_clips, ref_present

N = 2200
MAX_SAMPLES = 256


@pytest.fixture(scope="module")
def invariant(spark):
    clips = S.clips(spark, n=N, n_shards=8, max_samples=MAX_SAMPLES)
    ref = S.clips_ref(spark, n=N, n_shards=8, max_samples=MAX_SAMPLES)
    return A.with_audio_invariant(clips, ref).cache()


@pytest.fixture(scope="module")
def oracle():
    specs = expected_clips(N, MAX_SAMPLES)
    originals = {s.clip_id: s for s in specs if not s.is_dup and not s.is_hot}
    joined = [
        s
        for s in specs
        if not s.is_hot
        and s.clip_id in originals
        and ref_present(originals[s.clip_id])
    ]
    return joined


def test_decode_one_unit():
    pcm = np.arange(-4, 4, dtype="<i2")
    sig, rate, err = A.decode_one(pcm.tobytes(), "pcm_s16le")
    assert err is None and rate is None and np.array_equal(sig, pcm)
    wav = S.wrap_wav(pcm, 8000)
    sig, rate, err = A.decode_one(wav, "wav")
    assert err is None and rate == 8000 and np.array_equal(sig, pcm)
    _, _, err = A.decode_one(b"\x00\x01\x02", "pcm_s16le")
    assert err == "odd_byte_length"
    _, _, err = A.decode_one(b"whatever", "mp3")
    assert err == "unsupported_codec:mp3"
    _, _, err = A.decode_one(b"RIFFgarbage", "wav")
    assert err and err.startswith("decode_failed")
    _, _, err = A.decode_one(None, "wav")
    assert err == "null_bytes"


def test_g711_decode_unit():
    """G.711 mu-law / A-law decode against published table landmarks, full
    code-level round-trip through the encoder, and quantization SNR above
    the pipeline's 30 dB gate."""
    # landmarks (CCITT/Sun G.711 tables)
    assert A.ULAW_DECODE_LUT[0xFF] == 0
    assert A.ULAW_DECODE_LUT[0x00] == -32124
    assert A.ULAW_DECODE_LUT[0x80] == 32124
    assert A.ALAW_DECODE_LUT[0xD5] == 8
    assert A.ALAW_DECODE_LUT[0x55] == -8
    assert A.ALAW_DECODE_LUT[0xAA] == 32256
    for law, lut in (("mulaw", A.ULAW_DECODE_LUT), ("alaw", A.ALAW_DECODE_LUT)):
        # decode-level idempotence over EVERY code (mu-law +0/-0 alias)
        codes = np.arange(256, dtype=np.uint8)
        rt = np.frombuffer(A.encode_g711(lut[codes], law), np.uint8)
        assert np.array_equal(lut[rt], lut[codes]), law
        # a 997 Hz-ish sine at -10 dBFS survives companding >= 30 dB SNR
        t = np.arange(4000)
        sine = (10000 * np.sin(2 * np.pi * t * 997 / 16000)).astype(np.int16)
        dec, rate, err = A.decode_one(
            A.encode_g711(sine, law), "pcm_mulaw" if law == "mulaw" else "pcm_alaw"
        )
        assert err is None and rate is None and len(dec) == len(sine)
        assert A.snr_db(dec, sine) >= 33.0, law
    _, _, err = A.decode_one(b"anything", "amr")
    assert err == "unsupported_codec:amr"


def test_g711_wav_container_unit():
    """RIFF/WAVE with format tag 6 (A-law) / 7 (mu-law): stdlib wave
    rejects these, so the manual RIFF fallback must parse them — samples
    via the LUTs, header rate surfaced like PCM WAVs."""
    import struct

    def g711_wav(tag: int, payload: bytes, rate: int = 8000) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + b"data" + struct.pack("<I", len(payload)) + payload
                  + (b"\x00" if len(payload) % 2 else b""))
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    t = np.arange(400)
    src = (8000 * np.sin(2 * np.pi * t * 7 / 400)).astype(np.int16)
    for tag, law in ((7, "mulaw"), (6, "alaw")):
        raw = g711_wav(tag, A.encode_g711(src, law), rate=16000)
        sig, rate, err = A.decode_one(raw, "wav")
        assert err is None and rate == 16000 and len(sig) == 400
        assert A.snr_db(sig, src) >= 33.0, law
    # stereo / wrong-bits G.711 layouts rejected explicitly
    bad = g711_wav(7, b"\x00" * 10)
    bad = bad.replace(struct.pack("<HH", 7, 1), struct.pack("<HH", 7, 2), 1)
    _, _, err = A.decode_one(bad, "wav")
    assert err == "unsupported_wav_layout:tag=7,ch=2,bits=8"
    # truly unknown tag still errors
    _, _, err = A.decode_one(g711_wav(3, b"\x00" * 8), "wav")
    assert err == "unsupported_wav_layout:tag=3,ch=1,bits=8"


def test_g711_clip_passes_audio_invariant(spark):
    """The real re-containering scenario: a clip delivered as pcm_mulaw
    whose reference is the original int16 PCM passes the SNR >= 30 dB gate
    through the full mapInArrow invariant pass (decode_one fallback path —
    no operator changes needed for a new codec)."""
    t = np.arange(512)
    src = (9000 * np.sin(2 * np.pi * t * 5 / 512)).astype(np.int16)
    clips = spark.createDataFrame(
        [("m1", A.encode_g711(src, "mulaw"), 16000, 32, "pcm_mulaw", "hi", 0),
         ("a1", A.encode_g711(src, "alaw"), 16000, 32, "pcm_alaw", "hi", 0)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, shard int",
    )
    ref = spark.createDataFrame(
        [("m1", src.astype("<i2").tobytes(), "hi"),
         ("a1", src.astype("<i2").tobytes(), "hi")],
        "clip_id string, pcm_ref binary, transcript_ref string",
    )
    out = {r["clip_id"]: r for r in A.with_audio_invariant(clips, ref).collect()}
    for cid in ("m1", "a1"):
        assert out[cid]["decode_error"] is None
        assert out[cid]["n_samples"] == 512
        assert out[cid]["snr_db"] >= A.SNR_DB_MIN


def test_wav_header_rate_mismatch_flagged(spark):
    pcm = np.arange(0, 64, dtype="<i2")
    good = S.wrap_wav(pcm, 16000)
    bad = S.wrap_wav(pcm, 8000)  # header says 8000, column says 16000
    clips = spark.createDataFrame(
        [("c1", good, 16000, 4, "wav", "t", 0), ("c2", bad, 16000, 4, "wav", "t", 0)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, shard int",
    )
    ref = spark.createDataFrame(
        [("c1", pcm.tobytes(), "t"), ("c2", pcm.tobytes(), "t")],
        "clip_id string, pcm_ref binary, transcript_ref string",
    )
    inv = A.with_audio_invariant(clips, ref)
    from valor_spark.plans.engine import validate

    res = validate(inv, rules=A.audio_rules(), key_cols=["clip_id"])
    got = {
        (r["clip_id"], r["error"])
        for r in res.violations().collect()
    }
    assert got == {("c2", "SampleRateHeaderMismatch:8000!=16000")}


def test_snr_db_unit():
    ref = np.array([1000, -1000, 500], dtype=np.int16)
    assert A.snr_db(ref, ref) == float("inf")
    noisy = ref + np.array([10, -10, 5], dtype=np.int16)
    v = A.snr_db(noisy, ref)
    assert 35.0 < v < 45.0  # amplitude ratio 100 -> 40 dB
    assert np.isnan(A.snr_db(ref[:2], ref))


def test_join_excludes_orphans_and_hot(invariant, oracle):
    assert invariant.count() == len(oracle)


def test_corrupted_rows_fail_snr(invariant, oracle):
    corrupted = {
        s.clip_id for s in oracle
        if s.corrupted and not s.truncated and s.codec in ("pcm_s16le", "wav")
        and s.n_samples > 0
    }
    assert corrupted, "fixture must contain corrupted joined rows"
    got = {
        r["clip_id"]
        for r in invariant.filter(
            F.col("decode_error").isNull() & (F.col("snr_db") < A.SNR_DB_MIN)
        ).collect()
    }
    assert got == corrupted
    # corrupted SNR should sit near the designed ~12 dB, not at the margin
    vals = [
        r["snr_db"]
        for r in invariant.filter(
            F.col("decode_error").isNull() & (F.col("snr_db") < A.SNR_DB_MIN)
        ).collect()
    ]
    assert all(5.0 < v < 20.0 for v in vals)


def test_clean_rows_pass_snr(invariant, oracle):
    clean = {
        s.clip_id for s in oracle
        if not s.corrupted and not s.truncated and s.codec in ("pcm_s16le", "wav")
    }
    rows = invariant.filter(F.col("clip_id").isin(list(clean))).collect()
    for r in rows:
        assert r["decode_error"] is None, r
        assert r["snr_db"] >= A.SNR_DB_MIN


def test_truncated_rows_flag_length_mismatch(invariant, oracle):
    truncated = {
        s.clip_id for s in oracle
        if s.truncated and s.codec in ("pcm_s16le", "wav")
    }
    assert truncated, "fixture must contain truncated joined rows"
    got = {
        r["clip_id"]
        for r in invariant.filter(
            F.col("decode_error").startswith("length_mismatch")
        ).collect()
    }
    assert got == truncated


def test_bad_codec_rows_flag_unsupported(invariant, oracle):
    bad = {s.clip_id for s in oracle if s.codec == "mp3"}
    got = {
        r["clip_id"]
        for r in invariant.filter(
            F.col("decode_error").startswith("unsupported_codec")
        ).collect()
    }
    assert got == bad


def test_transcript_mismatch_detected(invariant, oracle):
    expected = {
        s.clip_id for s in oracle if s.i % S.MISMATCH_TRANSCRIPT_STRIDE == 5
    }
    got = {
        r["clip_id"]
        for r in invariant.filter(~F.col("transcript_ok")).collect()
    }
    assert got == expected


def test_audio_rules_emit_violations(spark, invariant, oracle):
    from valor_spark.plans.engine import validate

    res = validate(
        invariant,
        rules=A.audio_rules(),
        key_cols=["clip_id"],
        shard_col="shard",
    )
    vio = res.violations()
    by_rule = {
        r["rule"]: r["n"]
        for r in vio.groupBy("rule").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_corrupt = sum(
        1 for s in oracle
        if s.corrupted and not s.truncated and s.codec in ("pcm_s16le", "wav")
        and s.n_samples > 0
    )
    n_decode_err = sum(
        1 for s in oracle if s.codec == "mp3" or s.truncated
    )
    n_mismatch = sum(1 for s in oracle if s.i % S.MISMATCH_TRANSCRIPT_STRIDE == 5)
    assert by_rule.get("audio_snr", 0) == n_corrupt
    assert by_rule.get("audio_decode", 0) == n_decode_err
    assert by_rule.get("transcript_equal", 0) == n_mismatch


def test_audio_profile_hand_computed(spark):
    # clip A: [-32768, 32767, 0, 0, 100, 0] -> both rails clipped, silence
    # threshold 512: loud idx {0,1}, lead 0, trail 4 (idx 2..5 silent)
    a = np.array([-32768, 32767, 0, 0, 100, 0], dtype="<i2")
    # clip B: all below threshold -> fully silent, lead=trail=n
    b = np.array([1, -2, 3], dtype="<i2")
    # clip C: empty payload
    c = np.array([], dtype="<i2")
    rows = [
        ("A", a.tobytes(), "pcm_s16le"),
        ("B", b.tobytes(), "pcm_s16le"),
        ("C", c.tobytes(), "pcm_s16le"),
        ("W", S.wrap_wav(a, 16000), "wav"),
        ("ODD", b"\x01", "pcm_s16le"),
        ("BAD", a.tobytes(), "mp3"),
        ("NULL", None, "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: r.asDict() for r in A.audio_profile(df).collect()}

    exp_a = dict(
        n_samples=6, peak_abs=32768,
        sum_sq=32768**2 + 32767**2 + 100**2,
        n_clipped=2, n_silent=4, lead_silence=0, trail_silence=4,
        decode_error=None,
    )
    for k, v in exp_a.items():
        assert got["A"][k] == v, (k, got["A"])
        assert got["W"][k] == v, (k, got["W"])  # WAV wraps the same pcm
    assert got["B"]["n_silent"] == 3 and got["B"]["lead_silence"] == 3
    assert got["B"]["trail_silence"] == 3 and got["B"]["n_clipped"] == 0
    assert got["C"]["n_samples"] == 0 and got["C"]["decode_error"] is None
    assert got["ODD"]["decode_error"] == "odd_byte_length"
    assert got["BAD"]["decode_error"] == "unsupported_codec:mp3"
    assert got["NULL"]["decode_error"] == "null_bytes"


def test_audio_profile_derived_and_quality_rules(spark):
    from valor_spark.plans.engine import validate

    loud = np.full(100, 32767, dtype="<i2")       # 100% clipped
    quiet = np.zeros(100, dtype="<i2")            # zero signal + silent
    ok = (np.sin(np.arange(100)) * 20000).astype("<i2")
    df = spark.createDataFrame(
        [("L", loud.tobytes(), "pcm_s16le"),
         ("Q", quiet.tobytes(), "pcm_s16le"),
         ("OK", ok.tobytes(), "pcm_s16le")],
        "clip_id string, bytes binary, codec string",
    )
    prof = A.audio_profile(df)
    der = {r["clip_id"]: r.asDict() for r in A.audio_profile_derived(prof).collect()}
    assert der["L"]["clipping_ratio"] == 1.0
    assert der["L"]["rms"] == pytest.approx(32767.0)
    assert der["Q"]["silence_ratio"] == 1.0 and der["Q"]["peak_dbfs"] is None
    assert 0.0 < der["OK"]["rms"] < 20000.0

    res = validate(prof, rules=A.audio_quality_rules(), key_cols=["clip_id"])
    vio = {(r["clip_id"], r["rule"]) for r in res.violations().collect()}
    assert ("L", "audio_clipping") in vio
    assert ("Q", "audio_silence") in vio and ("Q", "audio_zero_signal") in vio
    assert not any(cid == "OK" for cid, _ in vio)


def test_audio_segments_hand_computed(spark):
    loud, quiet = 5000, 0
    # clip A: [loud x6][quiet x20][loud x8] with gap 20 > min_gap 16 -> 2 segs
    a = np.array([loud] * 6 + [quiet] * 20 + [loud] * 8, dtype="<i2")
    # clip B: [loud x5][quiet x10][loud x5] gap 10 <= 16 -> ONE bridged seg
    b = np.array([loud] * 5 + [quiet] * 10 + [loud] * 5, dtype="<i2")
    # clip C: [loud x2] -> shorter than min_len 4 -> dropped
    c = np.array([loud] * 2, dtype="<i2")
    # clip D: all silent -> no rows
    d = np.zeros(30, dtype="<i2")
    rows = [
        ("A", a.tobytes(), "pcm_s16le"),
        ("B", b.tobytes(), "pcm_s16le"),
        ("C", c.tobytes(), "pcm_s16le"),
        ("D", d.tobytes(), "pcm_s16le"),
        ("BAD", a.tobytes(), "mp3"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    segs = A.audio_segments(df, silence_threshold=512, min_gap=16, min_len=4)
    got = {}
    for r in segs.collect():
        got.setdefault(r["clip_id"], []).append(
            (r["seg_idx"], r["start_sample"], r["end_sample"])
        )
    assert sorted(got["A"]) == [(0, 0, 6), (1, 26, 34)]
    assert sorted(got["B"]) == [(0, 0, 20)]       # bridged across short gap
    assert "C" not in got and "D" not in got and "BAD" not in got


def test_spectral_ints_unit():
    sr, m = 8000, 1024
    t = np.arange(m)
    # pure 500 Hz tone: bin 64 exactly (500/8000*1024), negligible leakage
    pure = (10000 * np.sin(2 * np.pi * 500 * t / sr)).astype("<i2")
    n, dom, hz, sec, imp = A.spectral_ints(pure, sr)
    assert (n, dom, hz) == (m, 64, 500)
    assert imp <= 5  # Hann leakage floor is ~0 outside the main lobe

    # add a half-amplitude 2000 Hz tone: second peak at bin 256, ~500/1000
    mixed = (
        10000 * np.sin(2 * np.pi * 500 * t / sr)
        + 5000 * np.sin(2 * np.pi * 2000 * t / sr)
    ).astype("<i2")
    n, dom, hz, sec, imp = A.spectral_ints(mixed, sr)
    assert (dom, hz, sec) == (64, 500, 256)
    assert 450 <= imp <= 550

    # degenerate inputs
    assert A.spectral_ints(np.zeros(0, "<i2"), sr) == (0, 0, 0, 0, 0)
    assert A.spectral_ints(np.zeros(4, "<i2"), sr) == (4, 0, 0, 0, 0)
    assert A.spectral_ints(np.zeros(64, "<i2"), sr) == (64, 0, 0, 0, 0)
    assert A.spectral_ints(pure, 0) == (m, 0, 0, 0, 0)


def test_spectrum_dom_hz_matches_synth_spec_analytically(tmp_path):
    """ANALYTIC guard on the spectrum oracle: the gate fixture's expected
    dom_hz must sit within one FFT bin of the synth spec's closed-form tone
    frequency (synthetic.py: freq = 100 + g % 400) — no FFT runs on the
    checking side.  This is what keeps the honestly-shared derivation in
    audio_fixture._spectrum_for (which imports the engine's spectral_ints)
    from letting a shared spectral-arithmetic bug slip through the oracle
    gate."""
    import pyarrow.parquet as pq

    from valor_spark.sources import audio_fixture as AF

    path = AF.build_audio_spectrum_fixture(str(tmp_path))
    rows = pq.read_table(path).to_pylist()
    by_clip = {}
    for s in AF.expected_clips(AF.N_CLIPS, AF.MAX_SAMPLES):
        by_clip.setdefault(s.clip_id, s)  # hot key: first spec wins? skip dups below
    checked = 0
    for r in rows:
        s = by_clip.get(r["clip_id"])
        if (
            s is None
            or r["decode_error"] is not None
            or s.corrupted
            or s.truncated
            or s.is_hot
            or s.is_dup
            or s.sr_hz <= 0
            or r["n_samples"] < 32
        ):
            continue
        freq = 100.0 + (s.g % 400)
        bin_hz = s.sr_hz / r["n_samples"]
        if freq >= s.sr_hz / 2 - bin_hz:  # too close to Nyquist to resolve
            continue
        assert abs(r["dom_hz"] - freq) <= bin_hz + 0.5, (
            r["clip_id"], r["dom_hz"], freq, bin_hz
        )
        checked += 1
    assert checked > 500, checked  # the guard must actually cover the corpus


def test_audio_spectrum_flags_corrupted_clips(spark):
    """The planted second tone (0.1 amplitude vs 0.4) must raise
    impurity_milli well above the pure clips' leakage floor wherever the
    tone separation exceeds the exclusion lobe (low sample rates — at
    sr=8000 and 256 capped samples a bin is 31.25 Hz, the planted tone
    sits >= 5 bins away)."""
    clips = S.clips(spark, n=N, n_shards=8, max_samples=MAX_SAMPLES)
    out = A.audio_spectrum(clips).filter(
        (F.col("decode_error").isNull()) & (F.col("n_samples") == 256)
    )
    got = {r["clip_id"]: r["impurity_milli"] for r in out.collect()}
    by_id = {s.clip_id: s for s in expected_clips(len(got) + 200, 256)}
    sep_pure, sep_corr = [], []
    for cid, imp in got.items():
        s = by_id.get(cid)
        if s is None or s.sr_hz != 8000:
            continue
        (sep_corr if s.corrupted else sep_pure).append(imp)
    assert sep_pure and sep_corr
    assert max(sep_pure) < min(sep_corr), (max(sep_pure), min(sep_corr))


def test_audio_content_hash_survives_recontainering(spark):
    """The same samples as raw pcm_s16le and WAV-wrapped must produce the
    SAME content hash (raw-byte dedup can never see this), and different
    samples must not."""
    pcm = (1000 * np.sin(2 * np.pi * 440 * np.arange(256) / 8000)).astype("<i2")
    other = (pcm + 7).astype("<i2")
    rows = [
        ("raw", pcm.tobytes(), "pcm_s16le"),
        ("wav", S.wrap_wav(pcm, 8000), "wav"),
        ("oth", other.tobytes(), "pcm_s16le"),
        ("bad", b"\x00", "pcm_s16le"),          # odd byte length
        ("mp3", b"junk", "mp3"),                # unsupported codec
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    got = {r["clip_id"]: (r["content_hash"], r["decode_error"])
           for r in A.audio_content_hash(df).collect()}
    assert got["raw"][0] == got["wav"][0] is not None
    assert got["oth"][0] not in (None, got["raw"][0])
    assert got["bad"] == (None, "odd_byte_length")
    assert got["mp3"][0] is None and got["mp3"][1].startswith("unsupported_codec")

    groups = {r["content_hash"]: (r["n"], r["first_clip_id"])
              for r in A.audio_dedup_groups(df).collect()}
    assert groups == {got["raw"][0]: (2, "raw")}


def test_adpcm_decode_unit():
    """IMA/DVI ADPCM (WAV tag 0x11): the block-vectorized decoder agrees
    EXACTLY with a scalar per-sample reference on adversarial random
    payloads (random nibbles hit predictor clamping and both index-table
    edges constantly), and the encode->decode round trip clears codec-
    typical SNR on tones."""
    import struct

    from valor_spark.operators import adpcm as AD

    def scalar_decode(data, block_align):
        spb = AD.samples_per_block(block_align)
        out = []
        n_full = len(data) // block_align
        for start in range(0, n_full * block_align, block_align):
            blk = data[start : start + block_align]
            pred, idx, _ = struct.unpack_from("<hBB", blk, 0)
            idx = max(0, min(88, idx))
            out.append(pred)
            for b in blk[4:]:
                for n in (b & 0xF, b >> 4):
                    step = int(AD.STEP_TABLE[idx])
                    diff = step >> 3
                    if n & 4:
                        diff += step
                    if n & 2:
                        diff += step >> 1
                    if n & 1:
                        diff += step >> 2
                    pred = max(-32768, min(32767, pred + (-diff if n & 8 else diff)))
                    idx = max(0, min(88, idx + int(AD.INDEX_ADJUST[n & 7])))
                    out.append(pred)
        return np.array(out, np.int16)

    rng = np.random.default_rng(11)
    for trial in range(3):
        raw = rng.integers(0, 256, 128 * 4, dtype=np.uint8).tobytes()
        assert np.array_equal(AD.decode_ima_adpcm(raw, 128), scalar_decode(raw, 128))
    # table landmarks (IMA rev 3.00 / RFC 3551 DVI4)
    assert AD.STEP_TABLE[0] == 7 and AD.STEP_TABLE[88] == 32767
    assert AD.STEP_TABLE[44] == 494 and len(AD.STEP_TABLE) == 89
    assert list(AD.INDEX_ADJUST) == [-1, -1, -1, -1, 2, 4, 6, 8]
    # round-trip SNR: 4-bit adaptive delta tracks low-slope tones well
    t = np.arange(8000)
    for freq, rate, floor in ((440, 16000, 28.0), (120, 8000, 33.0)):
        sig = (20000 * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
        enc = AD.encode_ima_adpcm(sig, 256)
        dec = AD.decode_ima_adpcm(enc, 256, len(sig))
        assert len(dec) == len(sig)
        assert A.snr_db(dec.astype(np.float64), sig.astype(np.float64)) >= floor
    # fact-chunk trim: non-multiple-of-spb lengths come back exactly
    sig = (5000 * np.sin(2 * np.pi * 9 * np.arange(777) / 777)).astype(np.int16)
    dec = AD.decode_ima_adpcm(AD.encode_ima_adpcm(sig, 64), 64, 777)
    assert len(dec) == 777
    # corrupt header index (> 88) clamps instead of raising
    blk = bytearray(AD.encode_ima_adpcm(sig[:121], 64))
    blk[2] = 200
    assert len(AD.decode_ima_adpcm(bytes(blk), 64)) >= 121


def test_adpcm_wav_container_unit():
    """Tag-0x11 WAV containers decode through decode_one's RIFF fallback:
    header rate surfaced, fact-chunk sample count honored, stereo layouts
    rejected, truncation/corruption mapped to error strings (never an
    exception out of decode_one)."""
    import struct

    from valor_spark.operators import adpcm as AD

    sig = (18000 * np.sin(2 * np.pi * 300 * np.arange(5000) / 16000)).astype(
        np.int16
    )
    wav = AD.wav_ima_adpcm(sig, rate=16000, block_align=256)
    dec, rate, err = A.decode_one(wav, "wav")
    assert err is None and rate == 16000 and len(dec) == len(sig)
    assert A.snr_db(dec.astype(np.float64), sig.astype(np.float64)) >= 30.0
    # stereo ADPCM rejected explicitly
    bad = wav.replace(
        struct.pack("<HHI", 0x11, 1, 16000), struct.pack("<HHI", 0x11, 2, 16000), 1
    )
    _, _, err = A.decode_one(bad, "wav")
    assert err == "unsupported_wav_layout:tag=17,ch=2,bits=4"
    # fuzz: truncations and byte flips never escape as exceptions
    rng = np.random.default_rng(5)
    n_err = 0
    for trial in range(60):
        buf = bytearray(wav)
        if trial % 2:
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        sig2, _, err = A.decode_one(bytes(buf), "wav")
        if err is not None:
            n_err += 1
            assert sig2 is None and isinstance(err, str)
    assert n_err > 10


def test_adpcm_clip_passes_audio_invariant(spark):
    """A clip delivered as an IMA-ADPCM WAV whose reference is the original
    int16 PCM passes the SNR >= 30 dB gate through the full mapInArrow
    invariant pass — the lossy codec's quantization noise sits above the
    gate for speech-band content, so no operator changes were needed for
    the new codec (decode_one fallback only)."""
    from valor_spark.operators import adpcm as AD

    t = np.arange(4096)
    src = (15000 * np.sin(2 * np.pi * t * 60 / 4096)).astype(np.int16)
    clips = spark.createDataFrame(
        [("ad1", AD.wav_ima_adpcm(src, rate=16000, block_align=256),
          16000, 256, "wav", "hello adpcm", 0)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
        "transcript string, shard int",
    )
    ref = spark.createDataFrame(
        [("ad1", src.astype("<i2").tobytes(), "hello adpcm")],
        "clip_id string, pcm_ref binary, transcript_ref string",
    )
    out = {r["clip_id"]: r for r in A.with_audio_invariant(clips, ref).collect()}
    assert out["ad1"]["decode_error"] is None
    assert out["ad1"]["n_samples"] == 4096
    assert out["ad1"]["snr_db"] >= A.SNR_DB_MIN
