"""Plain-Python oracle replicating the synthetic clips generator row-by-row.

This is the *specification* of the fixture (FIXTURES.md): tests derive the
expected violation sets from it and compare against the engine's output.
"""

from __future__ import annotations

from dataclasses import dataclass

from valor_spark.sources import synthetic as S


@dataclass
class ClipSpec:
    i: int              # raw id
    g: int              # gen id (content source; i-1 for planted duplicates)
    clip_id: str
    sr_hz: int
    dur_ms: int
    codec: str
    transcript: str
    is_dup: bool
    is_hot: bool
    corrupted: bool
    truncated: bool
    n_samples: int      # after max_samples cap, before truncation


def expected_clips(n: int, max_samples: int) -> list[ClipSpec]:
    out = []
    for i in range(n):
        is_dup = i % S.DUP_STRIDE == 0 and i > 0
        g = i - 1 if is_dup else i
        is_hot = i % S.HOT_STRIDE == 0 and i > 0
        clip_id = "clip_hotkey" if is_hot else f"clip_{g:010d}"
        sr = S.SAMPLE_RATES[g % 3]
        if g % S.BAD_SR_STRIDE == 1:
            sr = [0, -1, 96001][g % 3]
        dur = 200 + (g * 37) % 801
        if g % S.BAD_DUR_STRIDE == 2:
            dur = (g % 2) * -50
        codec = "pcm_s16le" if g % 2 == 0 else "wav"
        if g % S.BAD_CODEC_STRIDE == 3:
            codec = "mp3"
        w = S.WORDS
        tr = " ".join([w[g % 14], w[(g * 7 + 3) % 14], w[(g * 11 + 5) % 14]])
        if g % S.EMPTY_TRANSCRIPT_STRIDE == 4:
            tr = ""
        n_samp = sr * dur // 1000 if (sr > 0 and dur > 0) else 0
        n_samp = min(n_samp, max_samples)
        out.append(
            ClipSpec(
                i=i,
                g=g,
                clip_id=clip_id,
                sr_hz=sr,
                dur_ms=dur,
                codec=codec,
                transcript=tr,
                is_dup=is_dup,
                is_hot=is_hot,
                corrupted=g % S.CORRUPTED_STRIDE == 7,
                truncated=(g % S.TRUNCATED_STRIDE == 6) and n_samp > 8,
                n_samples=n_samp,
            )
        )
    return out


def ref_present(spec: ClipSpec) -> bool:
    """Is this clip's id represented in clips_ref? (orphan/dup/hot excluded)"""
    i = spec.i
    return not (
        (i % S.ORPHAN_STRIDE == 8 and i > 0)
        or (i % S.DUP_STRIDE == 0 and i > 0)
        or (i % S.HOT_STRIDE == 0 and i > 0)
    )


def ref_transcript(spec: ClipSpec) -> str:
    if spec.i % S.MISMATCH_TRANSCRIPT_STRIDE == 5:
        return spec.transcript + " extra"
    return spec.transcript


def joins_ref(spec: ClipSpec, specs_by_clip_id: dict) -> bool:
    """Does this clips row join clips_ref on clip_id? (duplicates join the
    original's ref row; hot/orphan rows have none)"""
    if spec.is_hot:
        return False
    # the ref row for this clip_id exists iff the ORIGINAL row (id == g,
    # where clip_id was not mutated) is ref_present
    orig = specs_by_clip_id.get(spec.clip_id)
    return orig is not None and ref_present(orig)
