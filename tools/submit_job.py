"""spark-submit entry point for the clips validation pipeline (north_rule
launch mode: ``spark-submit --py-files /tmp/valor_spark.zip
tools/submit_job.py --source synthetic:100000 --checkpoint /tmp/run1``).

Build the zip first::

    python -c "from valor_spark.utils import build_pyfiles_zip as b; print(b())"
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="synthetic:100000",
                    help="clips source: synthetic:N | parquet:/path | iceberg:db.tbl")
    ap.add_argument("--ref", default=None,
                    help="reference decodes source (defaults to the synthetic ref when --source is synthetic)")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--snr-db-min", type=float, default=30.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("valor-clips-validate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from valor_spark.plans.pipeline import run_pipeline
    from valor_spark.sources.loaders import load_clips

    clips = load_clips(spark, args.source)
    ref = None
    if args.ref:
        if args.ref.startswith("synthetic:"):
            # the synthetic REF generator (pcm_ref/transcript_ref), not the
            # clips generator — load_clips would hand back a clips-schema
            # table and the audio stage would silently skip
            from valor_spark.sources.synthetic import clips_ref

            ref = clips_ref(spark, n=int(args.ref.split(":")[1]))
        else:
            ref = load_clips(spark, args.ref)
        missing = {"clip_id", "pcm_ref", "transcript_ref"} - set(ref.columns)
        if missing:
            raise SystemExit(
                f"--ref table is missing reference columns {sorted(missing)}; "
                "the audio invariant stage needs (clip_id, pcm_ref, "
                "transcript_ref) — it would otherwise be skipped silently"
            )
    elif args.source.startswith("synthetic:"):
        from valor_spark.sources.synthetic import clips_ref

        ref = clips_ref(spark, n=int(args.source.split(":")[1]))

    t0 = time.time()
    rep = run_pipeline(
        spark, clips, ref, checkpoint_dir=args.checkpoint, snr_db_min=args.snr_db_min
    )
    n_violations = rep.violations.count()
    verdicts = rep.shard_verdicts.collect() if rep.shard_verdicts is not None else []
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rows": rep.rows,
                "violations": n_violations,
                "shards": len(verdicts),
                "shards_passed": sum(1 for r in verdicts if r["passed"]),
                "wall_s": round(wall, 2),
                "clips_per_sec": round(rep.rows / wall, 1) if wall else None,
                "skipped": rep.skipped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
