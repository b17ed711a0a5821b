"""One-off ledger evidence for the round-5 audio-tier operators at
above-gate scale: loudness/bandwidth throughput over seconds-long clips,
and the perceptual-fingerprint near-dup join at N and 10N programs with
planted transcode/gain dups (recall + precision + wall ratio).

Usage: PYTHONPATH=. python tools/bench_audio_tier.py
Prints one JSON line per experiment; numbers go into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOUD_N = int(os.environ.get("AUDIO_TIER_LOUD_N", "24000"))
FP_PROGRAMS = int(os.environ.get("AUDIO_TIER_FP_PROGRAMS", "400"))


def make_spark():
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("valor-audio-tier-bench")
        .config("spark.sql.shuffle.partitions", str(2 * CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.task.cpus", "2")
        # payload rows are ~32 KB each: without this, a ~1 GB table reads
        # as a handful of 128 MB splits and most cores idle — the same
        # lever a 100 TB cluster run sets (or solves with more files)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .getOrCreate()
    )


def gen_fp_corpus(spark, n_programs: int, out_path: str) -> None:
    """Worker-side synthesis: per program a deterministic 6-note melody
    (2.1 s at 16 kHz), three variants (orig PCM, -10 dB gain, G.711
    mu-law transcode).  Distributed mapInArrow — no driver-side bytes."""
    from pyspark.sql import functions as F

    spec = spark.range(n_programs).select(
        F.col("id").alias("program")
    ).repartition(2 * CPUS)

    def gen(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        from valor_spark.operators.audio import encode_g711

        sr = 16000
        for b in batches:
            ids, blobs, codecs = [], [], []
            for p in b.column(0).to_pylist():
                h = hashlib.md5(f"fpbench:{p}".encode()).digest()
                bins = [20 + (h[k] % 110) for k in range(6)]
                chunks = []
                for bi in bins:
                    f = bi * 15.625
                    n = int(0.35 * sr)
                    t = np.arange(n)
                    x = 9000.0 * np.sin(2.0 * np.pi * f * t / sr)
                    edge = 160
                    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(edge) / edge)
                    x[:edge] *= ramp
                    x[-edge:] *= ramp[::-1]
                    chunks.append(x)
                pcm = np.clip(np.round(np.concatenate(chunks)), -32768, 32767).astype(np.int16)
                quiet = np.round(pcm.astype(np.float64) * 0.316).astype(np.int16)
                ids += [f"p{p}_orig", f"p{p}_quiet", f"p{p}_ulaw"]
                blobs += [pcm.tobytes(), quiet.tobytes(), encode_g711(pcm, "mulaw")]
                codecs += ["pcm_s16le", "pcm_s16le", "pcm_mulaw"]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(blobs, pa.binary()),
                    pa.array([sr] * len(ids), pa.int32()),
                    pa.array(codecs, pa.string()),
                ],
                names=["clip_id", "bytes", "sr_hz", "codec"],
            )

    df = spec.mapInArrow(gen, "clip_id string, bytes binary, sr_hz int, codec string")
    df.write.mode("overwrite").parquet(out_path)


def fp_experiment(spark, n_programs: int) -> dict:
    from pyspark.sql import functions as F

    from valor_spark.operators.audio_fp import audio_near_dup_fp

    path = f"/tmp/fp_bench_{n_programs}"
    gen_fp_corpus(spark, n_programs, path)
    clips = spark.read.parquet(path)
    t0 = time.time()
    pairs = audio_near_dup_fp(clips).select("clip_a", "clip_b").collect()
    wall = time.time() - t0
    got = {(r.clip_a, r.clip_b) for r in pairs}
    expected = set()
    for p in range(n_programs):
        ms = sorted([f"p{p}_orig", f"p{p}_quiet", f"p{p}_ulaw"])
        expected |= {(ms[0], ms[1]), (ms[0], ms[2]), (ms[1], ms[2])}
    tp = len(got & expected)
    return {
        "programs": n_programs,
        "clips": 3 * n_programs,
        "wall_sec": round(wall, 2),
        "clips_per_sec": round(3 * n_programs / wall, 1),
        "recall": round(tp / len(expected), 4),
        "precision": round(tp / len(got), 4) if got else None,
        "extra_pairs": len(got - expected),
    }


def loudness_experiment(spark) -> dict:
    from valor_spark.operators.bandwidth import audio_bandwidth
    from valor_spark.operators.defects import audio_defects
    from valor_spark.operators.loudness import audio_loudness
    from valor_spark.operators.resample import audio_resample_stats
    from valor_spark.sources import synthetic as S

    path = f"/tmp/loud_bench_{LOUD_N}"
    if not os.path.exists(path):
        S.clips(spark, n=LOUD_N, n_shards=64, max_samples=16000).write.mode(
            "overwrite"
        ).parquet(path)
    clips = spark.read.parquet(path)
    clips.count()  # warm file index
    out = {"clips": LOUD_N, "samples_per_clip_max": 16000}
    for name, op in (
        ("loudness", audio_loudness),
        ("bandwidth", audio_bandwidth),
        ("defects", audio_defects),
        ("resample", audio_resample_stats),
    ):
        t0 = time.time()
        op(clips).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        out[f"{name}_wall_sec"] = round(wall, 2)
        out[f"{name}_clips_per_sec"] = round(LOUD_N / wall, 1)
    return out


def fused_experiment(spark) -> dict:
    """Fused one-decode pass vs the five family operators run
    separately on the same corpus — the scan+decode economy claim."""
    from valor_spark.operators.audio import audio_profile, audio_spectrum
    from valor_spark.operators.bandwidth import audio_bandwidth
    from valor_spark.operators.defects import audio_defects
    from valor_spark.operators.fused import audio_all_stats
    from valor_spark.operators.loudness import audio_loudness

    path = f"/tmp/loud_bench_{LOUD_N}"
    clips = spark.read.parquet(path)
    clips.count()
    out = {"clips": LOUD_N}
    sep = 0.0
    for name, op in (
        ("profile", audio_profile),
        ("spectrum", audio_spectrum),
        ("loudness", audio_loudness),
        ("bandwidth", audio_bandwidth),
        ("defects", audio_defects),
    ):
        t0 = time.time()
        op(clips).write.format("noop").mode("overwrite").save()
        sep += time.time() - t0
    out["five_separate_wall_sec"] = round(sep, 2)
    t0 = time.time()
    audio_all_stats(clips).write.format("noop").mode("overwrite").save()
    out["fused_wall_sec"] = round(time.time() - t0, 2)
    out["speedup"] = round(out["five_separate_wall_sec"] / out["fused_wall_sec"], 2)
    out["fused_clips_per_sec"] = round(LOUD_N / out["fused_wall_sec"], 1)
    return out


def main() -> None:
    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print("AUDIO_TIER " + json.dumps({"loudness": loudness_experiment(spark)}))
    print("AUDIO_TIER " + json.dumps({"fused": fused_experiment(spark)}))
    r1 = fp_experiment(spark, FP_PROGRAMS)
    r10 = fp_experiment(spark, 10 * FP_PROGRAMS)
    print(
        "AUDIO_TIER "
        + json.dumps(
            {
                "fp_small": r1,
                "fp_10x": r10,
                "wall_ratio_10x": round(r10["wall_sec"] / r1["wall_sec"], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
