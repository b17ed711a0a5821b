"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the full clips
validation pipeline on a pre-materialized synthetic clips table, and prints
ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "clips_per_sec": ..., ...}

Scaling mode (``--scaling``): the north_rule two-cluster-size criterion,
evidenced in-sandbox by running the identical pipeline at local[8] (N) and
local[32] (4N) on the same parquet input via subprocesses; writes
``BENCH/BASELINE.md`` with both throughputs and the efficiency ratio.

``--child <master>`` is the internal per-master worker invocation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CLIPS_N = int(os.environ.get("SPARK_GRAFT_CLIPS_N", "120000"))
CLIPS_PARQUET = os.environ.get(
    "SPARK_GRAFT_CLIPS_PARQUET", "/tmp/valor_bench_clips"
)

HEADLINE = [
    "val_orders",
    "val_lineitem_acc",
    "uniq_custkeys",
    "col_stats",
    "events_first_per_user_type",
    "top2_orders_per_cust",
    "pricing_summary",
    "region_acctbal",
    "psi_event_types",
    "dedup_exact",
    "text_profile",
    "simhash_docs",
    "minhash_lsh_pairs",
    "cosine_topk",
]


def make_spark(master: str, shuffle_partitions: int | None = None):
    # workers must import valor_spark: ship via PYTHONPATH (local mode) —
    # the spark-submit equivalent is --py-files of a zip of valor_spark/
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
    from pyspark.sql import SparkSession

    cores = int(master.split("[")[1].rstrip("]")) if "[" in master else CPUS
    return (
        SparkSession.builder.master(master)
        .appName("valor-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .getOrCreate()
    )


def materialize_clips(spark) -> tuple[str, str]:
    """Write the synthetic clips + ref tables to parquet once (not timed):
    the benchmark measures *validation* throughput, not synthesis."""
    from pyspark.sql import functions as F

    from valor_spark.sources import synthetic as S

    clips_path = f"{CLIPS_PARQUET}/n={CLIPS_N}/clips"
    ref_path = f"{CLIPS_PARQUET}/n={CLIPS_N}/ref"
    marker = f"{CLIPS_PARQUET}/n={CLIPS_N}/_DONE"
    if not os.path.exists(marker):
        S.clips(spark, n=CLIPS_N, n_shards=64, max_samples=2048).write.mode(
            "overwrite"
        ).parquet(clips_path)
        S.clips_ref(spark, n=CLIPS_N, n_shards=64, max_samples=2048).write.mode(
            "overwrite"
        ).parquet(ref_path)
        open(marker, "w").close()
    return clips_path, ref_path


def run_pipeline_bench(spark) -> dict:
    """Time the full validation pipeline (schema gate -> row rules ->
    constraints -> audio -> verdicts) over the materialized clips table."""
    from pyspark.sql import functions as F

    from valor_spark.operators import drift as D
    from valor_spark.plans.pipeline import run_pipeline

    clips_path, ref_path = materialize_clips(spark)
    clips = spark.read.parquet(clips_path)
    ref = spark.read.parquet(ref_path)
    ok = clips.filter((F.col("dur_ms") > 0) & (F.col("sr_hz") > 0))
    baseline = D.baseline_from(
        ok, numeric_cols={"dur_ms": (0.0, 1001.0, 20)}, categorical_cols=["sr_hz"]
    ).cache()
    baseline.count()

    # run WITH a fresh checkpoint dir — the production (north_rule)
    # configuration: each stage persists its violations once, so downstream
    # actions (verdict assembly) read small parquet instead of recomputing
    # the whole DAG per action
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="valor_bench_ckpt_")
    t0 = time.time()
    rep = run_pipeline(spark, clips, ref, baseline, checkpoint_dir=ckpt)
    n_vio = rep.violations.count()
    rep.shard_verdicts.count()
    wall = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "clips": CLIPS_N,
        "violations": n_vio,
        "pipeline_sec": round(wall, 3),
        "clips_per_sec": round(CLIPS_N / wall, 1),
        "stage_sec": {k: round(v, 2) for k, v in rep.stage_wall_s.items()},
    }


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        # noop sink: forces full materialization of every column
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def child(master: str) -> None:
    spark = make_spark(master)
    spark.sparkContext.setLogLevel("ERROR")
    stats = run_pipeline_bench(spark)
    spark.stop()
    print("CHILD_RESULT " + json.dumps({"master": master, **stats}))


def scaling() -> dict:
    """north_rule scaling protocol: identical job at N=local[8] and
    4N=local[32] on the same parquet input, efficiency = T4N/(4*TN)."""
    results = {}
    for master in ("local[8]", "local[32]"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", master],
            capture_output=True,
            text=True,
            cwd=REPO,
            env={**os.environ, "SPARK_GRAFT_CLIPS_N": str(CLIPS_N)},
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise RuntimeError(f"child {master} failed")
        results[master] = json.loads(line[-1].removeprefix("CHILD_RESULT "))
    tn = results["local[8]"]["clips_per_sec"]
    t4n = results["local[32]"]["clips_per_sec"]
    eff = t4n / (4 * tn)
    report = {
        "throughput_local8_clips_per_sec": tn,
        "throughput_local32_clips_per_sec": t4n,
        "scaling_efficiency": round(eff, 3),
        "clips": CLIPS_N,
    }
    write_baseline_md(results, report)
    return report


def write_baseline_md(results: dict, report: dict) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured numbers (north_rule protocol)",
        "",
        "Identical clips-validation pipeline (schema gate -> row rules ->",
        "uniqueness/referential constraints -> audio SNR pass -> drift ->",
        "verdict assembly) on the same pre-materialized parquet input, at two",
        "parallelism levels (BASELINE.md sandbox protocol; 32 cores available).",
        "",
        f"- input: {report['clips']:,} synthetic clips (input_hint schema),",
        "  audio payload ~4 KB/clip (2048 samples s16le), 64 shards",
        "- config: AQE on, shuffle.partitions = 2x cores, Arrow batch 10k rows",
        "",
        "| master | pipeline wall (s) | validated clips/sec |",
        "|---|---|---|",
    ]
    for master in ("local[8]", "local[32]"):
        r = results[master]
        lines.append(f"| {master} | {r['pipeline_sec']} | {r['clips_per_sec']:,} |")
    lines += [
        "",
        f"**Scaling efficiency (N=8 -> 4N=32): {report['scaling_efficiency']}**"
        "  (target >= 0.8, north_rule)",
        "",
        "Reference comparison: the reference library publishes no throughput",
        "numbers (BASELINE.md); the authoritative criteria are violation-row",
        "parity (pytest suite, CORRECTNESS gate) and this scaling ratio.",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    if "--scaling" in sys.argv:
        report = scaling()
        print(json.dumps({"metric": "scaling_efficiency_8to32", "unit": "ratio", **report}))
        return

    spark = make_spark(f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = run_queries(spark)
    pipe = run_pipeline_bench(spark)
    spark.stop()
    queries["clips_pipeline"] = pipe["pipeline_sec"]
    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_clips_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf else None,
                "clips": pipe["clips"],
                "clips_per_sec": pipe["clips_per_sec"],
                "violations": pipe["violations"],
            }
        )
    )


if __name__ == "__main__":
    main()
