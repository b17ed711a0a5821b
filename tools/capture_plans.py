"""Regenerate BENCH/PLANS.md: captured physical plans for the properties
the 100 TB design depends on.  Run: PYTHONPATH=. python tools/capture_plans.py"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import valor_spark as V  # noqa: E402
from valor_spark.operators.audio import with_audio_invariant  # noqa: E402
from valor_spark.operators.constraints import duplicate_keys, uniqueness_violations  # noqa: E402
from valor_spark.plans.engine import validate  # noqa: E402
from valor_spark.sources import synthetic as S  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = []

    def cap(title, df, note):
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "#N", plan)
        lines = [l for l in plan.splitlines() if l.strip()][:18]
        out.append(f"## {title}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")

    clips = S.clips(spark, n=200, n_shards=4, max_samples=64)
    clips.write.mode("overwrite").parquet("/tmp/plan_clips")
    pq = spark.read.parquet("/tmp/plan_clips")

    EA = V.EArray()
    rules = {
        "sr": V.adapt(V.field("sr_hz"), V.fail_if(["Bad"], lambda c: c <= 0, EA)),
        "dur": V.adapt(V.field("dur_ms"), V.fail_if(["Bad"], lambda c: c <= 0, EA)),
    }
    res = validate(pq.drop("bytes"), rules, key_cols=["clip_id"], shard_col="shard")
    cap(
        "Row rules = one narrow Project (whole-stage codegen, no shuffle, no Python)",
        res.annotated,
        "Every named rule's verdict is a Catalyst expression in a single "
        "WholeStageCodegen span.",
    )
    cap(
        "Uniqueness scan prunes to the key column only",
        duplicate_keys(pq, "clip_id"),
        "`ReadSchema: struct<clip_id:string>` — the audio bytes column never "
        "leaves parquet; map-side partial_count absorbs hot-key skew before "
        "the shuffle.",
    )
    cap(
        "Duplicate-row tagging broadcasts the (tiny) duplicate-key set back",
        uniqueness_violations(pq, "clip_id"),
        "BroadcastHashJoin: the full table streams, never shuffles.",
    )

    base = None
    root = "/tmp/valor_bench_clips"
    if os.path.exists(root):
        for d in sorted(os.listdir(root)):
            if os.path.exists(f"{root}/{d}/_DONE_BUCKETED"):
                base = f"{root}/{d}"
                break
    if base:
        import bench

        for name, ddl, sub in (
            ("clips_src", bench.CLIPS_DDL, "clips_b"),
            ("ref_src", bench.REF_DDL, "ref_b"),
        ):
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet "
                f"CLUSTERED BY (clip_id) SORTED BY (clip_id) INTO 32 BUCKETS "
                f"LOCATION '{base}/{sub}'"
            )
        inv = with_audio_invariant(spark.table("clips_src"), spark.table("ref_src"))
        cap(
            "Audio clips<->ref join on bucketed tables: ZERO Exchange",
            inv,
            "Both sides bucketed+sorted by clip_id (1 file/bucket): "
            "SortMergeJoin without any shuffle; the decode is ONE MapInArrow "
            "operator (a pandas_udf expression here was duplicated by "
            "projection collapse — see operators/audio.py).",
        )

    hdr = (
        "# BENCH/PLANS.md — physical-plan evidence (round 1)\n\n"
        "Captured `.explain` output (attribute ids normalized) for the plan\n"
        "properties the engine's 100 TB design depends on.  Regenerate with\n"
        "`tools/capture_plans.py`.\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "PLANS.md"), "w") as f:
        f.write(hdr + "\n" + "\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
