"""FLAC codec: published CRC check values, bit-exact handcrafted frames
for decoder-only paths (LPC, escape partitions, 5-bit Rice, wasted
bits), encode->decode roundtrips across subframe types / stereo modes /
block sizes, integrity failures, the claims probe, rule gating, and the
Spark fixture parity."""

import numpy as np
import pytest

from valor_spark.operators.flac import (
    BitReader,
    FlacError,
    _read_utf8_number,
    crc8,
    crc16,
    decode_flac,
    decode_frames,
    parse_streaminfo,
    pcm_md5,
    probe_one,
)
from valor_spark.sources.flac_fixture import (
    BitWriter,
    _flac_clip_set,
    _utf8_number,
    build_flac_fixture,
    encode_flac,
    encode_streaminfo_only,
)


def test_crc_published_check_values():
    """CRC-8/0x07 and CRC-16/0x8005 (BUYPASS) check values for the
    standard '123456789' vector, per the public CRC catalogues."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_utf8_number_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 36) - 1):
        br = BitReader(_utf8_number(v))
        assert _read_utf8_number(br) == v, v
    with pytest.raises(ValueError):
        _utf8_number(1 << 36)


def test_streaminfo_claims():
    raw = encode_streaminfo_only(44100, 2, 24, 123456, block_size=4096)
    info = parse_streaminfo(raw)
    assert info["sample_rate"] == 44100
    assert info["n_channels"] == 2
    assert info["bps"] == 24
    assert info["total_samples"] == 123456
    assert info["min_blocksize"] == info["max_blocksize"] == 4096
    assert info["md5"] == b"\x00" * 16
    with pytest.raises(FlacError):
        parse_streaminfo(b"NOPE" + raw[4:])


def _frame_bytes(subframe_bits, blocksize, info, ch_code=0, bps_code=4):
    """Assemble one frame around externally-written subframe bits."""
    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bs_code = 7
    bw.write(bs_code, 4)
    bw.write(0, 4)           # rate from streaminfo
    bw.write(ch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.write(0, 8)           # frame number 0
    bw.write(blocksize - 1, 16)
    bw.write(crc8(bytes(bw.buf)), 8)
    for v, n in subframe_bits:
        bw.write(v, n)
    bw.align()
    bw.write(crc16(bytes(bw.buf)), 16)
    return bw.getvalue()


def _mono_stream(frame: bytes, n: int) -> bytes:
    return encode_streaminfo_only(16000, 1, 16, n) + frame


def test_handcrafted_lpc_subframe():
    """An LPC order-2 subframe assembled bit by bit; expected samples
    from the spec's reconstruction formula computed inline — a path the
    fixture encoder never emits."""
    warmup = [100, 130]
    coeffs = [3, -1]         # precision 4, shift 1
    resid = [5, -3, 0, 7]
    n = len(warmup) + len(resid)
    bits = [(0, 1), (32 | (2 - 1), 6), (0, 1)]       # LPC, order 2
    bits += [(v, 16) for v in warmup]
    bits += [(4 - 1, 4), (1, 5)]                     # precision 4, shift 1
    bits += [(c & 0xF, 4) for c in coeffs]
    bits += [(0, 2), (0, 4)]                         # rice method 0, 1 partition
    k = 2
    bits.append((k, 4))
    for r in resid:
        u = (abs(r) << 1) - (r < 0)
        bits.append((1, (u >> k) + 1))               # unary quotient
        bits.append((u, k))
    frame = _frame_bytes(bits, n, None)
    frames, rate = decode_frames(
        _mono_stream(frame, n), parse_streaminfo(_mono_stream(frame, n))
    )
    exp = list(warmup)
    for r in resid:
        pred = (3 * exp[-1] - 1 * exp[-2]) >> 1
        exp.append(r + pred)
    assert frames[:, 0].tolist() == exp
    assert rate == 16000


def test_handcrafted_escape_partition_and_rice2():
    """Residual method 1 (5-bit Rice) with an ESCAPE partition: raw
    7-bit residuals — decoder-only paths."""
    warmup = [1000]
    resid = [-50, 33, -1, 0, 60, -33, 12]
    n = 8
    bits = [(0, 1), (8 | 1, 6), (0, 1)]              # FIXED order 1
    bits += [(warmup[0], 16)]
    bits += [(1, 2), (0, 4)]                         # method 1 (5-bit), 1 partition
    bits += [(0b11111, 5), (7, 5)]                   # escape, 7 raw bits each
    bits += [(r & 0x7F, 7) for r in resid]
    frame = _frame_bytes(bits, n, None)
    frames, _ = decode_frames(
        _mono_stream(frame, n), parse_streaminfo(_mono_stream(frame, n))
    )
    exp = list(warmup)
    for r in resid:
        exp.append(exp[-1] + r)
    assert frames[:, 0].tolist() == exp


def test_handcrafted_wasted_bits():
    """A CONSTANT subframe with 3 wasted bits: the decoded value is the
    coded value shifted left by 3."""
    n = 5
    bits = [(0, 1), (0, 6), (1, 1)]                  # CONSTANT, wasted flag
    bits += [(1, 3)]                                 # unary 2 -> wasted = 3
    bits += [(-25 & 0x1FFF, 13)]                     # 16 - 3 bits
    frame = _frame_bytes(bits, n, None)
    frames, _ = decode_frames(
        _mono_stream(frame, n), parse_streaminfo(_mono_stream(frame, n))
    )
    assert frames[:, 0].tolist() == [-25 << 3] * n


def test_roundtrip_matrix():
    rng = np.random.default_rng(11)
    sine = (9000 * np.sin(2 * np.pi * 440 * np.arange(1500) / 16000)).astype(
        np.int16
    )
    cases = [
        ("sine", sine.reshape(-1, 1)),
        ("noise", rng.integers(-32768, 32768, 1500).astype(np.int16).reshape(-1, 1)),
        ("const", np.full((1500, 1), 17, np.int16)),
        ("extremes", np.tile([[-32768], [32767]], (750, 1)).astype(np.int16)),
        ("short", np.array([[5], [9], [-3]], np.int16)),
    ]
    for name, x in cases:
        for bsz in (192, 576, 1000, 4096):
            raw = encode_flac(x, 16000, block_size=bsz)
            fr, rate, _ = decode_flac(raw)
            assert np.array_equal(fr, x), (name, bsz)
    st = np.stack(
        [sine, rng.integers(-20000, 20000, 1500).astype(np.int16)], axis=1
    )
    for mode in ("indep", "left_side", "mid_side"):
        fr, _, _ = decode_flac(encode_flac(st, 48000, stereo_mode=mode))
        assert np.array_equal(fr, st), mode
    three = np.stack([sine, sine // 2, -sine], axis=1).astype(np.int16)
    fr, _, _ = decode_flac(encode_flac(three, 16000))
    assert np.array_equal(fr, three)


def test_corruption_detected():
    sine = (9000 * np.sin(2 * np.pi * 440 * np.arange(2000) / 16000)).astype(
        np.int16
    )
    raw = bytearray(encode_flac(sine, 16000))
    # flip one bit inside frame audio data (past streaminfo + header)
    raw[80] ^= 0x10
    with pytest.raises(FlacError):
        decode_flac(bytes(raw))
    # truncation
    with pytest.raises(FlacError):
        decode_flac(bytes(raw[:60]))
    # md5 claim corruption alone (audio intact) -> md5_mismatch
    raw2 = bytearray(encode_flac(sine, 16000))
    raw2[42 - 16] ^= 0xFF  # first md5 byte (streaminfo ends at offset 42)
    with pytest.raises(FlacError, match="md5_mismatch"):
        decode_flac(bytes(raw2))


def test_pcm_md5_matches_hashlib_reference():
    import hashlib

    x = np.array([[1, -2], [300, -400]], np.int16)
    assert pcm_md5(x, 16) == hashlib.md5(x.astype("<i2").tobytes()).digest()


def test_probe_plants():
    by_id = {p["clip_id"]: probe_one(p["raw"]) for p in _flac_clip_set()}
    assert by_id["fl_sine"]["md5_ok"] == 1
    assert by_id["fl_sine"]["claim_sample_rate"] == 16000
    assert by_id["fl_noise"]["decoded_rate"] == 12345
    assert by_id["fl_md5_wrong"]["md5_ok"] == 0
    assert by_id["fl_md5_zero"]["md5_ok"] is None
    assert by_id["fl_md5_zero"]["has_md5"] == 0
    assert by_id["fl_rate_lie"]["claim_sample_rate"] == 8000
    assert by_id["fl_total_zero"]["decoded_samples"] == 2000
    assert by_id["fl_total_lie"]["decode_error"].endswith("sample_count_mismatch")
    assert by_id["fl_bps24"]["decode_error"].startswith("unsupported_flac_layout")
    assert by_id["fl_not_flac"]["decode_error"] == "decode_failed:not_flac"
    assert by_id["fl_null"]["decode_error"] == "null_bytes"


def test_decode_one_dispatches_flac():
    from valor_spark.operators.audio import decode_one

    sine = (9000 * np.sin(2 * np.pi * 440 * np.arange(1000) / 16000)).astype(
        np.int16
    )
    sig, rate, err = decode_one(encode_flac(sine, 16000), "flac")
    assert err is None and rate == 16000 and np.array_equal(sig, sine)
    st = np.stack([sine, sine // 3], axis=1).astype(np.int16)
    _, _, err = decode_one(encode_flac(st, 16000), "flac")
    assert err == "unsupported_flac_layout:ch=2"


def test_channel_frames_decodes_stereo_flac():
    from valor_spark.operators.channels import channel_frames

    sine = (9000 * np.sin(2 * np.pi * 440 * np.arange(1000) / 16000)).astype(
        np.int16
    )
    st = np.stack([sine, (-sine).astype(np.int16)], axis=1)
    frames, err = channel_frames(encode_flac(st, 16000, stereo_mode="mid_side"), "flac")
    assert err is None and np.array_equal(frames, st)


def test_val_flac_rules(spark, tmp_path):
    """flac_rules over the fixture: each violation fires on exactly its
    plant; clean lossless rows pass; NULL claims stay inert."""
    from valor_spark.operators.flac import probe_flac
    from valor_spark.plans.engine import validate
    from valor_spark.plans.pipeline import flac_rules

    paths = build_flac_fixture(str(tmp_path))
    probe = probe_flac(spark.read.parquet(paths["data"]))
    res = validate(probe, flac_rules(), key_cols=["clip_id"])
    viol = {
        (r.clip_id, r.rule): r.error
        for r in res.violations().select("clip_id", "rule", "error").collect()
    }
    assert viol[("fl_md5_wrong", "flac_md5")] == "Md5Mismatch"
    assert viol[("fl_rate_lie", "flac_rate_claim")] == "RateClaimMismatch:8000!=16000"
    assert viol[("fl_total_zero", "flac_unknown_length")] == "UnknownLength"
    assert viol[("fl_total_lie", "flac_decode")].endswith("sample_count_mismatch")
    assert viol[("fl_null", "flac_decode")] == "DecodeError:null_bytes"
    clean = {
        "fl_sine", "fl_noise", "fl_const", "fl_frames",
        "fl_st_indep", "fl_st_left_side", "fl_st_mid_side", "fl_md5_zero",
    }
    assert not {k for k in viol if k[0] in clean}
    # barrier=False: default violations() checkpoints the slim frame,
    # which replaces the upstream plan with an RDD scan — the plan
    # property lives in the lazy chain underneath
    plan = res.violations(barrier=False)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_probe_flac_spark_matches_fixture(spark, tmp_path):
    from valor_spark.operators.flac import probe_flac

    paths = build_flac_fixture(str(tmp_path))
    got = (
        probe_flac(spark.read.parquet(paths["data"]))
        .orderBy("clip_id")
        .collect()
    )
    exp = spark.read.parquet(paths["expected"]).orderBy("clip_id").collect()
    assert len(got) == len(exp) >= 16
    for g, e in zip(got, exp):
        assert g.asDict() == e.asDict(), g.clip_id
