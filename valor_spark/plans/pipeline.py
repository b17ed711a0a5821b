"""The full clips-validation pipeline (north_rule assembly).

Stages (SURVEY.md §2.6): (0) schema gate -> (1) vectorized row rules ->
(2) whole-table constraints (uniqueness, referential, stats) -> (3) audio
payload invariant -> (4) distribution drift -> (5) verdict assembly.  Every
stage emits violation rows in one uniform shape and per-shard metrics into
the checkpoint manifest; a resumed run skips completed shards/stages.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valor_spark import EArray, adapt, conN, field, make
from valor_spark.operators import constraints as C
from valor_spark.operators import drift as D
from valor_spark.operators.audio import audio_rules, with_audio_invariant
from valor_spark.plans.checkpoint import GLOBAL_SHARD, RunManifest, ShardRecord
from valor_spark.plans.engine import validate

EA = EArray()

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
    ]
)

ALLOWED_SR = [8000, 16000, 22050, 24000, 44100, 48000]
ALLOWED_CODECS = ["pcm_s16le", "wav"]

#: rows whose shard value is NULL (dirty metadata — exactly what a
#: validation engine must tolerate) group under this pseudo-shard instead of
#: crashing the fingerprint collect or silently escaping the resume filter
#: (NULL `isin` evaluates to NULL -> filtered out -> never re-validated)
UNSHARDED = -2


def _shard_col(has_shard: bool):
    if not has_shard:
        return F.lit(0).cast("int")
    return F.coalesce(F.col("shard").cast("int"), F.lit(UNSHARDED))


#: speech-rate plausibility window (words per minute).  Conversational
#: speech sits around 110-180 wpm; transcripts implying rates far outside
#: the window signal transcript/audio mismatch (wrong pairing, truncated
#: audio, machine-generated filler) — a cross-COLUMN consistency check the
#: single-field rules above cannot express.
MIN_WPM = 40
MAX_WPM = 400


def speech_rate_rules(min_wpm: int = MIN_WPM, max_wpm: int = MAX_WPM) -> dict:
    """Transcript-vs-duration consistency rule over the full row struct
    (the rule algebra's multi-column form: no ``adapt``/``field`` focus —
    ``make`` reads two fields of the row).

    All-integer decision: ``n_tokens * 60000`` vs ``wpm_bound * dur_ms``
    (bigint — no float division, so the verdict is exact and
    engine-portable).  Rows with NULL/empty transcripts or non-positive
    durations are OUT of scope — the single-field rules already flag them,
    and a rate over garbage inputs would double-report."""

    def _toks(tr):
        return F.filter(F.split(F.lower(tr), r"\s+"), lambda t: t != "")

    def _guarded(cond_fn, err: str):
        def err_fn(row):
            tr = row.getField("transcript")
            dur = row.getField("dur_ms")
            in_scope = (
                tr.isNotNull() & (tr != "") & dur.isNotNull() & (dur > 0)
            )
            nt = F.size(_toks(tr)).cast("bigint")
            return F.when(in_scope & cond_fn(nt, dur.cast("bigint")), EA.lit([err]))

        return make(err_fn, EA)

    return {
        "speech_rate": conN(
            _guarded(lambda nt, dur: nt * 60000 > max_wpm * dur, "SpeechTooFast"),
            _guarded(lambda nt, dur: nt * 60000 < min_wpm * dur, "SpeechTooSlow"),
        )
    }


#: EBU R128-style corpus loudness gate (milli-units of operators/loudness.py)
MIN_LUFS_MILLI = -30_000
MAX_LUFS_MILLI = -10_000
MAX_TRUE_PEAK_MILLI = -1_000


#: upsample-provenance gates (units of operators/bandwidth.py)
UPSAMPLE_NYQ_FACTOR = 4     # content's 99% rolloff * 4 <= claimed rate
UPSAMPLE_HF_PERMILLE_MAX = 5


def bandwidth_rules(
    nyq_factor: int = UPSAMPLE_NYQ_FACTOR,
    hf_permille_max: int = UPSAMPLE_HF_PERMILLE_MAX,
) -> dict:
    """Provenance gates over the ``audio_bandwidth`` OUTPUT frame
    (operators/bandwidth.py) in the reference's rule algebra:

    * ``audio_decode`` — decode errors surface as rule violations;
    * ``bandwidth_unmeasurable`` — decodable but silent/empty content has
      no spectrum to judge;
    * ``upsample_provenance`` — the container claims a rate whose Nyquist
      is ``nyq_factor/2`` times above the content's 99 % rolloff AND
      essentially no power sits above claimed-rate/4: the clip was
      upsampled from a lower-rate original (or lossy-transcoded through
      one), i.e. the metadata overstates the information content — the
      corpus fault a sample-rate whitelist cannot see."""

    def _unmeasurable(row):
        return F.when(
            row.getField("decode_error").isNull()
            & row.getField("rolloff99_hz").isNull(),
            EA.lit(["Unmeasurable"]),
        )

    def _upsampled(row):
        r99 = row.getField("rolloff99_hz")
        return F.when(
            (r99 * nyq_factor <= row.getField("src_sr"))
            & (row.getField("hf_permille") <= hf_permille_max),
            F.array(
                F.concat(F.lit("Upsampled:"), r99.cast("string"))
            ),
        )

    return {
        "audio_decode": adapt(
            field("decode_error"),
            make(
                lambda c: F.when(
                    c.isNotNull(), F.array(F.concat(F.lit("DecodeError:"), c))
                ),
                EA,
            ),
        ),
        "bandwidth_unmeasurable": make(_unmeasurable, EA),
        "upsample_provenance": make(_upsampled, EA),
    }


#: waveform-defect corpus gates (units of operators/defects.py)
CLIP_RUN_LIMIT = 4          # >= 4 consecutive pinned samples = hard clip
DROPOUT_MS_LIMIT = 20       # >= 20 ms of exact zero inside audio = dropout
DC_PERMILLE_LIMIT = 20      # |mean| >= 2 % of full scale = DC fault


def defect_rules(
    clip_run_limit: int = CLIP_RUN_LIMIT,
    dropout_ms_limit: int = DROPOUT_MS_LIMIT,
    dc_permille_limit: int = DC_PERMILLE_LIMIT,
) -> dict:
    """Waveform-defect gates over the ``audio_defects`` OUTPUT frame
    (operators/defects.py) in the reference's rule algebra (adapt/field/
    make over all-integer columns, pure Column expressions, one
    shuffle-free Project):

    * ``audio_decode`` — decode errors surface as rule violations;
    * ``clipping``     — a pinned-sample RUN of ``clip_run_limit`` or more
      (a run separates a hard-clipped chain from a legitimate single
      full-scale peak, which passes);
    * ``silence``      — every sample is exactly zero: the clip carries no
      signal at all (kept distinct from ``dropout`` so downstream triage
      differs — silence is a recording/upload fault, a dropout is a
      splice/buffer fault);
    * ``dropout``      — an exact-zero run of ``dropout_ms_limit`` ms or
      longer INSIDE otherwise non-silent audio;
    * ``dc_offset``    — |mean| at or above ``dc_permille_limit`` per-mille
      of full scale.

    Decode-error rows carry zeroed metrics, so the waveform rules are
    naturally inert on them (passIf semantics, no explicit guard)."""

    def _silence(row):
        return F.when(
            (row.getField("n_samples") > 0)
            & (row.getField("max_zero_run") == row.getField("n_samples")),
            EA.lit(["AllSilence"]),
        )

    def _dropout(row):
        return F.when(
            (row.getField("max_zero_run") < row.getField("n_samples"))
            & (row.getField("max_zero_run_ms") >= dropout_ms_limit),
            F.array(
                F.concat(
                    F.lit("Dropout:"),
                    row.getField("max_zero_run_ms").cast("string"),
                )
            ),
        )

    return {
        "audio_decode": adapt(
            field("decode_error"),
            make(
                lambda c: F.when(
                    c.isNotNull(), F.array(F.concat(F.lit("DecodeError:"), c))
                ),
                EA,
            ),
        ),
        "clipping": adapt(
            field("max_clip_run"),
            make(
                lambda c: F.when(
                    c >= clip_run_limit,
                    F.array(
                        F.concat(F.lit("HardClipped:"), c.cast("string"))
                    ),
                ),
                EA,
            ),
        ),
        "silence": make(_silence, EA),
        "dropout": make(_dropout, EA),
        "dc_offset": adapt(
            field("dc_offset_permille"),
            make(
                lambda c: F.when(
                    F.abs(c) >= dc_permille_limit,
                    F.array(F.concat(F.lit("DCOffset:"), c.cast("string"))),
                ),
                EA,
            ),
        ),
    }


#: inter-channel corpus gates (units of operators/channels.py)
PHASE_INVERT_PERMILLE = -900   # correlation <= -0.9 = polarity inversion
IMBALANCE_HI_PERMILLE = 990    # >= 99 % of energy on one side = dead channel
IMBALANCE_LO_PERMILLE = 10


def channel_rules(
    phase_invert_permille: int = PHASE_INVERT_PERMILLE,
    imbalance_hi: int = IMBALANCE_HI_PERMILLE,
    imbalance_lo: int = IMBALANCE_LO_PERMILLE,
) -> dict:
    """Inter-channel gates over the ``audio_channels`` OUTPUT frame
    (operators/channels.py) in the reference's rule algebra (adapt/field/
    make over all-integer columns, pure Column expressions, one
    shuffle-free Project):

    * ``audio_decode``      — decode errors surface as rule violations;
    * ``phase_inversion``   — normalized inter-channel correlation at or
      below ``phase_invert_permille`` per-mille (a mono downmix of the
      clip cancels toward silence);
    * ``channel_imbalance`` — the energy split leaves less than
      ``imbalance_lo`` per-mille on one side (dead/broken channel);
    * ``dual_mono``         — both channels bit-identical in a clip that
      actually carries signal (store it mono instead).

    Mono clips carry the pair metrics as NULL, so every stereo rule is
    naturally inert on them (SQL null semantics, no explicit guard) —
    the same pattern as decode-error rows in ``defect_rules``."""

    def _dual(row):
        return F.when(
            (row.getField("dual_mono") == 1) & (row.getField("ssq_l") > 0),
            EA.lit(["DualMono"]),
        )

    def _imbalance(row):
        bal = row.getField("balance_permille")
        return F.when(
            (bal >= imbalance_hi) | (bal <= imbalance_lo),
            F.array(F.concat(F.lit("Imbalance:"), bal.cast("string"))),
        )

    return {
        "audio_decode": adapt(
            field("decode_error"),
            make(
                lambda c: F.when(
                    c.isNotNull(), F.array(F.concat(F.lit("DecodeError:"), c))
                ),
                EA,
            ),
        ),
        "phase_inversion": adapt(
            field("phase_permille"),
            make(
                lambda c: F.when(
                    c <= phase_invert_permille,
                    F.array(
                        F.concat(F.lit("PhaseInverted:"), c.cast("string"))
                    ),
                ),
                EA,
            ),
        ),
        "channel_imbalance": make(_imbalance, EA),
        "dual_mono": make(_dual, EA),
    }


def flac_rules() -> dict:
    """Metadata-claims gates over the ``probe_flac`` OUTPUT frame
    (operators/flac.py) in the reference's rule algebra — the
    tier-validation question for a lossless corpus is "does the
    container's STREAMINFO tell the truth about the audio?":

    * ``flac_decode``       — malformed streams, CRC failures, claimed
      total-sample counts the frames don't deliver (typed errors);
    * ``flac_md5``          — the PCM MD5 claim does not match the
      decoded samples (payload corruption a header-only scan misses);
    * ``flac_rate_claim``   — STREAMINFO's sample rate disagrees with
      the corpus metadata's ``sr_hz`` (the same header-vs-metadata gate
      the WAV path runs as ``sr_header_consistent``);
    * ``flac_unknown_length`` — ``total_samples = 0``: legal but
      unbounded (duration unknowable without a full decode), which an
      intake tier wants surfaced.

    Rows with NULL metrics (unparseable streams) keep every claims rule
    inert via SQL null semantics; the decode rule carries them."""

    def _rate_claim(row):
        claim, meta = row.getField("claim_sample_rate"), row.getField("sr_hz")
        return F.when(
            claim != meta,
            F.array(
                F.concat(
                    F.lit("RateClaimMismatch:"),
                    claim.cast("string"),
                    F.lit("!="),
                    meta.cast("string"),
                )
            ),
        )

    return {
        "flac_decode": adapt(
            field("decode_error"),
            make(
                lambda c: F.when(
                    c.isNotNull(), F.array(F.concat(F.lit("DecodeError:"), c))
                ),
                EA,
            ),
        ),
        "flac_md5": adapt(
            field("md5_ok"),
            make(lambda c: F.when(c == 0, EA.lit(["Md5Mismatch"])), EA),
        ),
        "flac_rate_claim": make(_rate_claim, EA),
        "flac_unknown_length": adapt(
            field("claim_total_samples"),
            make(lambda c: F.when(c == 0, EA.lit(["UnknownLength"])), EA),
        ),
    }


def corpus_audio_rules() -> dict:
    """EVERY program-level audio gate over the FUSED one-decode frame
    (operators/fused.py::audio_all_stats): the loudness window + true
    peak, the waveform-defect gates, and the upsample-provenance line,
    merged into one rule dict — so a 10^12-clip intake runs ONE payload
    scan (audio_all_stats) and ONE shuffle-free Project (this rule tree)
    for the whole audio gate.  The three families share the
    ``audio_decode`` rule (identical definition), so the merge keeps a
    single copy."""
    return {**loudness_rules(), **defect_rules(), **bandwidth_rules()}


def loudness_rules(
    min_lufs_milli: int = MIN_LUFS_MILLI,
    max_lufs_milli: int = MAX_LUFS_MILLI,
    max_true_peak_milli: int = MAX_TRUE_PEAK_MILLI,
) -> dict:
    """Program-level audio gates over the ``audio_loudness`` OUTPUT frame
    (operators/loudness.py) — the R128-style corpus window re-expressed in
    the reference's rule algebra (adapt/field/make/conN over integer
    milli-units, pure Column expressions, one shuffle-free Project):

    * ``audio_decode``   — decode errors surface as rule violations;
    * ``loudness_measurable`` — a decodable clip whose every gating block
      fell under the -70 LKFS absolute gate has no program loudness
      (silence / sub-400 ms) and cannot be level-checked;
    * ``loudness_range`` — integrated loudness outside
      [min_lufs_milli, max_lufs_milli];
    * ``true_peak``      — inter-sample peak above max_true_peak_milli
      (clipping risk under any downstream resample/encode).

    NULL inputs are out of scope for range/peak rules (NULL comparisons
    are NULL -> no error), mirroring the reference's passIf semantics."""
    EA = EArray()

    def _measurable(row):
        return F.when(
            row.getField("decode_error").isNull()
            & row.getField("lufs_milli").isNull(),
            EA.lit(["Unmeasurable"]),
        )

    return {
        "audio_decode": adapt(
            field("decode_error"),
            make(
                lambda c: F.when(
                    c.isNotNull(), F.array(F.concat(F.lit("DecodeError:"), c))
                ),
                EA,
            ),
        ),
        "loudness_measurable": make(_measurable, EA),
        "loudness_range": adapt(
            field("lufs_milli"),
            conN(
                make(
                    lambda c: F.when(
                        c < min_lufs_milli,
                        F.array(F.concat(F.lit("TooQuiet:"), c.cast("string"))),
                    ),
                    EA,
                ),
                make(
                    lambda c: F.when(
                        c > max_lufs_milli,
                        F.array(F.concat(F.lit("TooLoud:"), c.cast("string"))),
                    ),
                    EA,
                ),
            ),
        ),
        "true_peak": adapt(
            field("true_peak_milli_dbtp"),
            make(
                lambda c: F.when(
                    c > max_true_peak_milli,
                    F.array(
                        F.concat(F.lit("ClippingRisk:"), c.cast("string"))
                    ),
                ),
                EA,
            ),
        ),
    }


def clips_row_rules() -> dict:
    """Per-row schema/sanity rules over the input_hint columns — all pure
    Column expressions (one narrow select, no shuffle)."""
    return {
        "clip_id_valid": adapt(
            field("clip_id"),
            make(
                lambda c: F.when(c.isNull() | (c == ""), EA.lit(["ClipIdEmpty"])), EA
            ),
        ),
        "sr_valid": adapt(
            field("sr_hz"),
            conN(
                make(lambda c: F.when(c.isNull() | (c <= 0), EA.lit(["SampleRateNonPositive"])), EA),
                make(
                    lambda c: F.when(
                        c.isNotNull() & (c > 0) & ~c.isin(ALLOWED_SR),
                        EA.lit(["SampleRateNotAllowed"]),
                    ),
                    EA,
                ),
            ),
        ),
        "dur_positive": adapt(
            field("dur_ms"),
            make(lambda c: F.when(c.isNull() | (c <= 0), EA.lit(["DurationNonPositive"])), EA),
        ),
        "codec_allowed": adapt(
            field("codec"),
            make(
                lambda c: F.when(
                    c.isNull() | ~c.isin(ALLOWED_CODECS),
                    F.array(F.concat(F.lit("CodecNotAllowed:"), F.coalesce(c, F.lit("null")))),
                ),
                EA,
            ),
        ),
        "transcript_nonempty": adapt(
            field("transcript"),
            make(lambda c: F.when(c.isNull() | (c == ""), EA.lit(["TranscriptEmpty"])), EA),
        ),
        "bytes_present": adapt(
            field("bytes"),
            make(lambda c: F.when(c.isNull() | (F.length(c) == 0), EA.lit(["BytesEmpty"])), EA),
        ),
    }


def shard_fingerprint_frame(
    clips: DataFrame, fingerprint_payload: bool | Literal["content"] = False
) -> DataFrame:
    """Per-shard (rows, fingerprint) used for checkpoint-resume decisions.

    The content fingerprint covers every rule-relevant METADATA column, not
    just the key (a changed transcript/sr_hz/dur_ms must invalidate the
    shard).  The payload is deliberately excluded by default: parquet BINARY
    lengths live in the data pages, so even ``length(bytes)`` forces a full
    payload scan — at 100 TB the resume-decision aggregation must stay a
    metadata-column read, orders of magnitude cheaper than the work it
    skips.  ``fingerprint_payload`` opts payload coverage in for callers
    whose payloads can change under identical metadata: any truthy value
    adds length(bytes); the string ``"content"`` hashes the bytes themselves
    (catches in-place same-length payload swaps — a full payload scan per
    resume decision, the price of that guarantee).  With the default
    metadata-only fingerprint, an in-place payload mutation is outside the
    resume contract: a checkpointed audio stage will skip on matching
    metadata.

    ``bit_xor``: order-independent combine that cannot overflow (ANSI mode
    makes sum(hash) throw on long overflow); XOR self-cancellation is
    handled by comparing (rows, fingerprint) PAIRS, never fingerprint alone.
    """
    has_shard = "shard" in clips.columns
    shard_col = _shard_col(has_shard)
    fp_cols = [
        F.col(c)
        for c in ("clip_id", "sr_hz", "dur_ms", "codec", "transcript")
        if c in clips.columns
    ]
    if fingerprint_payload and "bytes" in clips.columns:
        # "content": hash the payload bytes themselves — detects in-place
        # same-length payload swaps at the cost of a full payload scan per
        # resume decision; any other truthy value hashes length only
        if fingerprint_payload == "content":
            fp_cols.append(F.col("bytes"))
        else:
            fp_cols.append(F.coalesce(F.length("bytes"), F.lit(-1)))
    # raw_min rides the same aggregate for free and lets the intake guard
    # distinguish a REAL negative shard value from the NULL->UNSHARDED(-2)
    # coalescing above: min() skips NULLs, so a group whose rows were all
    # NULL-shard has raw_min NULL while any genuine negative value surfaces.
    raw_shard = (
        F.col("shard").cast("int") if has_shard else F.lit(0).cast("int")
    )
    return clips.groupBy(shard_col.alias("shard")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(F.xxhash64(*fp_cols)).alias("fingerprint"),
        F.min(raw_shard).alias("raw_min"),
    )


def _cfg_fingerprint(*parts) -> int:
    """Stable 64-bit hash of a rule/stage configuration, mixed (XOR) into
    the resume fingerprints so a config change (thresholds, enabled rules,
    a changed reference table) invalidates checkpointed results the same
    way a data change does.  md5-based: Python's ``hash()`` is salted per
    process and useless across runs."""
    import hashlib

    digest = hashlib.md5(repr(parts).encode()).digest()[:8]
    return int.from_bytes(digest, "big", signed=True)


@dataclass
class PipelineReport:
    rows: int = 0
    violations: DataFrame | None = None
    shard_verdicts: DataFrame | None = None
    stats: DataFrame | None = None
    drift: list = dc_field(default_factory=list)
    schema_errors: list = dc_field(default_factory=list)
    stage_wall_s: dict = dc_field(default_factory=dict)
    skipped: dict = dc_field(default_factory=dict)
    _persisted: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the cached per-shard fingerprint frame.  Call when done
        with the report in a long-lived session — ``shard_verdicts``/``rows``
        derive from it and would otherwise pin executor storage memory per
        run_pipeline call (later actions still work, they just recompute)."""
        if self._persisted is not None:
            self._persisted.unpersist()
            self._persisted = None


def _per_shard_metrics(
    vio: DataFrame, shard_stats: dict, stage: str
) -> list[ShardRecord]:
    """Per-shard metric records: (rows, fingerprint) from the input stats,
    total AND per-rule violation counts from the stage output (one groupBy
    over the tiny written parquet — the north_rule's per-partition lineage
    + rule metrics)."""
    by_shard_rule = vio.groupBy("shard", "rule").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    vio_counts: dict = {}
    rule_counts: dict = {}
    for r in by_shard_rule:
        vio_counts[r["shard"]] = vio_counts.get(r["shard"], 0) + r["n"]
        rule_counts.setdefault(r["shard"], {})[r["rule"]] = r["n"]
    now = time.time()
    return [
        ShardRecord(
            stage=stage,
            shard=int(s) if s is not None else GLOBAL_SHARD,
            rows=rows,
            violations=int(vio_counts.get(s, 0)),
            wall_s=0.0,
            fingerprint=fp,
            finished_at=now,
            by_rule=rule_counts.get(s, {}),
        )
        for s, (rows, fp) in shard_stats.items()
    ]


def run_pipeline(
    spark: SparkSession,
    clips: DataFrame,
    clips_ref: DataFrame | None = None,
    baseline: DataFrame | None = None,
    checkpoint_dir: str | None = None,
    snr_db_min: float = 30.0,
    audio_repartition: int | None = None,
    scan_bytes_in_row_rules: bool | None = None,
    fingerprint_payload: bool | Literal["content"] = False,
) -> PipelineReport:
    """``scan_bytes_in_row_rules``: the ``bytes_present`` row rule forces the
    row-rule stage to scan the (dominant) binary column.  When the audio
    stage runs, empty/null payloads already surface there as decode errors,
    so by default the row-rule scan PRUNES bytes entirely (metadata-only
    columnar read) — at 100 TB that's the difference between a KB-scale and
    a PB-scale stage input."""
    report = PipelineReport()
    if scan_bytes_in_row_rules is None:
        scan_bytes_in_row_rules = clips_ref is None or "pcm_ref" not in clips_ref.columns
    manifest = RunManifest(checkpoint_dir) if checkpoint_dir else None
    vio_frames: list[DataFrame] = []

    has_shard = "shard" in clips.columns
    # persist: this 1-row-per-shard aggregate is consumed up to three times
    # (resume decisions, verdict assembly, row totals) — without the cache
    # each use re-scans the input's metadata columns
    shards_fp = shard_fingerprint_frame(clips, fingerprint_payload).persist()
    report._persisted = shards_fp
    shard_col = _shard_col(has_shard)
    # Negative shard values would collide with the GLOBAL (-1) / UNSHARDED
    # (-2) sentinels — a real shard=-1's violations would merge into the
    # global verdict row and resume keys would alias.  Fail fast at intake,
    # riding the fingerprint aggregate the run needs anyway: the probe
    # materializes the persisted 1-row-per-shard frame (every later consumer
    # hits the cache), so the guard costs zero extra input scans — it used
    # to be its own full pass over the shard column.
    if has_shard:
        # raw_min is NULL for the NULL-shard (tolerated, revalidated) group;
        # any non-NULL negative means a genuine negative shard value
        neg = (
            shards_fp.filter(F.col("raw_min") < 0)
            .select("raw_min")
            .limit(1)
            .collect()
        )
        if neg:
            raise ValueError(
                f"run_pipeline: shard values must be non-negative (found "
                f"{neg[0]['raw_min']}); negative values are reserved for the "
                f"GLOBAL ({GLOBAL_SHARD}) and UNSHARDED ({UNSHARDED}) sentinels"
            )

    # Reference-table fingerprint: the constraints (referential) and audio
    # stages consume clips_ref, so their resume validity must cover it —
    # otherwise a changed/shrunk ref serves stale verdicts on resume.
    # ``fingerprint_payload`` extends coverage to the ref PAYLOAD too: an
    # in-place pcm_ref swap under unchanged metadata is otherwise outside
    # the resume contract (same trade as the clips-side fingerprint — the
    # default keeps the resume decision a metadata-only read).
    ref_rows, ref_fp = 0, 0
    if manifest and clips_ref is not None:
        ref_cols = [
            F.col(c) for c in ("clip_id", "transcript_ref") if c in clips_ref.columns
        ] or [F.col(clips_ref.columns[0])]
        if fingerprint_payload and "pcm_ref" in clips_ref.columns:
            if fingerprint_payload == "content":
                ref_cols.append(F.col("pcm_ref"))
            else:
                ref_cols.append(F.coalesce(F.length("pcm_ref"), F.lit(-1)))
        r = clips_ref.agg(
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.bit_xor(F.xxhash64(*ref_cols)), F.lit(0)).alias("fp"),
        ).collect()[0]
        ref_rows, ref_fp = int(r["rows"]), int(r["fp"])

    # ---- stage 0: schema gate -------------------------------------------
    t0 = time.time()
    core = clips.drop("shard", "id", "gen_id")  # engine columns are not part of the contract
    report.schema_errors = C.schema_violations(core, CLIPS_SCHEMA)
    if report.schema_errors:
        vio_frames.append(
            spark.createDataFrame(
                [(None, None, "schema", "", e) for e in report.schema_errors],
                C.VIOLATION_SCHEMA,
            )
        )
    report.stage_wall_s["schema"] = time.time() - t0

    # ---- stage 1: row rules (resume: skip shards whose recorded input
    # fingerprint still matches; changed shards recompute and their
    # violations partition is dynamically overwritten) --------------------
    t0 = time.time()
    stage = "row_rules"
    rules = clips_row_rules()
    if not scan_bytes_in_row_rules:
        del rules["bytes_present"]
    # config mixed into the shard fingerprints: enabling/disabling rules
    # must recompute shards, not serve the old rule set's violations
    row_cfg = _cfg_fingerprint("row_rules", tuple(sorted(rules)))
    done: set[int] = set()
    shard_stats: dict[int, tuple[int, int]] = {}

    def _current_shards_only(df: DataFrame) -> DataFrame:
        """Read-backs see the whole stage dir — shards REMOVED from the
        input since the previous run must not resurface as violations."""
        return df.filter(F.col("shard").isin([int(s) for s in shard_stats]))

    raw_stats: dict[int, tuple[int, int]] = {}
    if manifest:
        raw_stats = {
            int(r["shard"]): (int(r["rows"]), int(r["fingerprint"]))
            for r in shards_fp.collect()
        }
        # row_cfg only keys THIS stage's resume; global stages derive their
        # keys from the raw data fingerprints plus their own config hashes
        shard_stats = {s: (rows, fp ^ row_cfg) for s, (rows, fp) in raw_stats.items()}
        recorded = manifest.shard_rows_fingerprints(stage)
        done = {
            s for s, (rows, fp) in shard_stats.items() if recorded.get(s) == (rows, fp)
        }
    if manifest and done and len(done) == len(shard_stats):
        report.skipped[stage] = sorted(done)
        vio_frames.append(
            _current_shards_only(
                manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA)
            )
        )
    else:
        todo = clips.filter(~shard_col.isin([int(s) for s in done])) if done else clips
        if not scan_bytes_in_row_rules:
            todo = todo.drop("bytes")
        res = validate(
            todo,
            rules=rules,
            key_cols=["clip_id"],
            shard_col="shard" if has_shard else None,
        )
        vio = res.violations().select(
            "clip_id",
            _shard_col(has_shard).alias("shard"),
            "rule",
            "path",
            "error",
        )
        if manifest:
            todo_stats = {s: v for s, v in shard_stats.items() if s not in done}
            manifest.write_violations(
                stage, vio, partition_by="shard", replace_shards=sorted(todo_stats)
            )
            # metric counts come from the (tiny) written parquet, not the
            # logical plan — counting the plan would re-run the whole
            # validation scan a second time
            vio = _current_shards_only(
                manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA)
            )
            manifest.append(_per_shard_metrics(vio, todo_stats, stage))
        vio_frames.append(vio)
        report.skipped[stage] = sorted(done)
    report.stage_wall_s[stage] = time.time() - t0

    # Global (whole-table) stages resume at stage granularity, validated by
    # a table-level (rows, fingerprint) key covering BOTH inputs (XOR of
    # per-shard XORs == XOR over all clips rows; the ref table's fingerprint
    # and each stage's config hash are mixed in, so a changed clips_ref or a
    # changed threshold recomputes instead of serving stale results).
    global_rows = sum(rows for rows, _ in raw_stats.values())
    global_fp = 0
    for _, fp in raw_stats.values():
        global_fp ^= fp
    key_rows = global_rows + ref_rows
    cons_fp = global_fp ^ ref_fp ^ _cfg_fingerprint(
        "constraints", clips_ref is not None
    )

    # ---- stage 2: whole-table constraints (global resume) ---------------
    t0 = time.time()
    stage = "constraints"
    if manifest and manifest.stage_done_for(stage, key_rows, cons_fp):
        vio_frames.append(manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA))
        report.skipped[stage] = [GLOBAL_SHARD]
    else:
        parts = [C.uniqueness_violations(clips, "clip_id")]
        if clips_ref is not None:
            parts.append(C.referential_violations(clips, clips_ref, "clip_id"))
        cons = parts[0]
        for p in parts[1:]:
            cons = cons.unionByName(p)
        if manifest:
            manifest.write_violations(stage, cons)
            cons = manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA)
            n = cons.count()
            manifest.mark_global(
                stage, rows=key_rows, violations=n,
                wall_s=time.time() - t0, fingerprint=cons_fp,
            )
        vio_frames.append(cons)
    report.stats = C.column_stats(
        clips.select("clip_id", "sr_hz", "dur_ms", "codec", "transcript")
    )
    report.stage_wall_s[stage] = time.time() - t0

    # ---- stage 3: audio payload invariant (SHARD-granular resume) --------
    # At 100 TB the audio decode pass is the dominant cost: a 99%-complete
    # run that dies must not re-decode everything.  Resume keys are
    # per-shard: clips shard fingerprint XOR the GLOBAL ref fingerprint XOR
    # the stage config (snr threshold + ref row count) — the ref table has
    # no shard alignment of its own, so a ref change conservatively
    # invalidates every shard, while the dominant case (appended / changed
    # clips shards) recomputes only the affected shards.
    if clips_ref is not None and "pcm_ref" in clips_ref.columns:
        t0 = time.time()
        stage = "audio"
        audio_cfg = _cfg_fingerprint("audio", snr_db_min, ref_rows) ^ ref_fp
        audio_stats = {
            s: (rows, fp ^ audio_cfg) for s, (rows, fp) in raw_stats.items()
        }
        a_done: set[int] = set()
        if manifest:
            recorded = manifest.shard_rows_fingerprints(stage)
            a_done = {
                s for s, key in audio_stats.items() if recorded.get(s) == key
            }

        def _audio_current_shards(df: DataFrame) -> DataFrame:
            return df.filter(F.col("shard").isin([int(s) for s in audio_stats]))

        if manifest and a_done and len(a_done) == len(audio_stats):
            vio_frames.append(
                _audio_current_shards(
                    manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA)
                )
            )
            report.skipped[stage] = sorted(a_done)
        else:
            todo_clips = (
                clips.filter(~shard_col.isin([int(s) for s in a_done]))
                if a_done
                else clips
            )
            inv = with_audio_invariant(
                todo_clips, clips_ref, repartition=audio_repartition
            )
            res = validate(
                inv,
                rules=audio_rules(snr_db_min),
                key_cols=["clip_id"],
                shard_col="shard" if "shard" in inv.columns else None,
            )
            vio = res.violations().select(
                "clip_id",
                _shard_col("shard" in inv.columns).alias("shard"),
                "rule",
                "path",
                "error",
            )
            if manifest:
                todo_stats = {
                    s: v for s, v in audio_stats.items() if s not in a_done
                }
                # a_done empty also covers manifests written by the old
                # stage-granular layout (unpartitioned files at the stage
                # root): full overwrite replaces that layout wholesale
                manifest.write_violations(
                    stage,
                    vio,
                    partition_by="shard",
                    replace_shards=sorted(todo_stats) if a_done else None,
                )
                vio = _audio_current_shards(
                    manifest.read_violations(spark, stage, C.VIOLATION_SCHEMA)
                )
                manifest.append(_per_shard_metrics(vio, todo_stats, stage))
            vio_frames.append(vio)
            report.skipped[stage] = sorted(a_done)
        report.stage_wall_s[stage] = time.time() - t0

    # ---- stage 4: distribution drift (ALL metrics from one scan) ---------
    if baseline is not None:
        t0 = time.time()
        report.drift = D.drift_report(
            clips,
            baseline,
            numeric={
                "dur_ms": dict(
                    lo=0.0, hi=1001.0, nbins=20, threshold=0.1,
                    pred=F.col("dur_ms") > 0,
                )
            },
            categorical={"sr_hz": dict(threshold=0.2, pred=F.col("sr_hz") > 0)},
        )
        for d in report.drift:
            if not d.passed:
                vio_frames.append(
                    spark.createDataFrame(
                        [(None, None, f"drift_{d.metric}", f".{d.column}",
                          f"DriftExceeded:{d.metric}={d.value:.4f}>{d.threshold}")],
                        C.VIOLATION_SCHEMA,
                    )
                )
        report.stage_wall_s["drift"] = time.time() - t0

    # ---- stage 5: verdict assembly ---------------------------------------
    t0 = time.time()
    all_vio = vio_frames[0]  # stage 1 always contributes a frame
    for v in vio_frames[1:]:
        all_vio = all_vio.unionByName(v)
    report.violations = all_vio
    # Table-level violations (uniqueness, referential orphans, schema,
    # drift) carry shard=NULL — they must not vanish from the verdicts
    # (a NULL key never matches a left join).  They aggregate under the
    # GLOBAL_SHARD (-1) verdict row, present only when such violations
    # exist, so a failing table can never read as all-shards-passed
    # without a failing global row beside them.
    vio_counts = all_vio.groupBy(
        F.coalesce(F.col("shard"), F.lit(GLOBAL_SHARD)).alias("shard")
    ).agg(F.count(F.lit(1)).alias("violations"))
    per_shard = (
        shards_fp.alias("s")
        .join(vio_counts, on="shard", how="left")
        .select(
            "shard",
            "rows",
            F.coalesce("violations", F.lit(0)).alias("violations"),
            (F.coalesce("violations", F.lit(0)) == 0).alias("passed"),
            "fingerprint",
        )
    )
    global_verdict = vio_counts.filter(F.col("shard") == GLOBAL_SHARD).select(
        F.lit(GLOBAL_SHARD).alias("shard"),
        F.lit(0).cast("long").alias("rows"),
        F.col("violations"),
        F.lit(False).alias("passed"),
        F.lit(0).cast("long").alias("fingerprint"),
    )
    report.shard_verdicts = per_shard.unionByName(global_verdict)
    report.rows = (
        global_rows
        if raw_stats
        else sum(r["rows"] for r in shards_fp.select("rows").collect())
    )
    report.stage_wall_s["verdicts"] = time.time() - t0
    return report
