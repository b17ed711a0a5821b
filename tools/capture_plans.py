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

    from valor_spark.operators.similarity import cosine_topk_ivf
    from valor_spark.operators.text import top_bigrams

    docs = spark.createDataFrame(
        [(i, "alpha bravo charlie delta " * 3) for i in range(50)],
        "doc_id bigint, text string",
    )
    cap(
        "Corpus top-k bigrams: TakeOrderedAndProject, never a global Window",
        top_bigrams(docs, k=5),
        "Per-partition partial top-k + k-row merge; an unpartitioned Window "
        "here would sort every distinct bigram in ONE task at corpus scale.",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    cap(
        "IVF ANN: md5-sampled centroids (partial top-k) folded to ONE "
        "broadcast row — no collect, no corpus-wide Window",
        cosine_topk_ivf(emb, emb.filter(F.col("vec_id") < 2), k=2,
                        n_centroids=4, n_probe=2),
        "Centroid assignment is a BroadcastNestedLoopJoin against a single "
        "folded row; the only Window is per-query top-k.",
    )

    # --- round-3 operators -------------------------------------------------
    import datetime as dt

    from valor_spark.operators import sampling as SP
    from valor_spark.operators.audio import audio_profile
    from valor_spark.operators.similarity import knn_graph
    from valor_spark.operators.temporal import asof_join, interval_join

    sdocs = spark.range(500).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("grp")
    )
    cap(
        "Stratified sampling: ONE shuffle-free filter (md5-bucket CASE)",
        SP.stratified_sample(sdocs, "grp", {"0": 0.5, "1": 1.0}, "id"),
        "Per-stratum fractions compile to a single codegen Filter — no "
        "shuffle, no per-stratum passes, decision reproducible by any engine.",
    )
    cap(
        "Exact-k-per-group reservoir: WindowGroupLimit prunes map-side",
        SP.sample_k_per_group(sdocs, "grp", 5, "id"),
        "Executors keep only k rows per group BEFORE the shuffle; the "
        "exchange carries k*|groups| rows, not the corpus.",
    )
    lft = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 1), "x")], "k bigint, ts timestamp, pay string"
    )
    rgt = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0), 1.0)], "k bigint, ts timestamp, v double"
    )
    cap(
        "As-of join: union + windowed last-non-null — NO join node at all",
        asof_join(lft, rgt, on="k"),
        "One shuffle of (keys, time); a range-condition join here risks "
        "|L|x|R| per key, this shape cannot pair-explode.",
    )
    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5))], "pid bigint, ts timestamp"
    )
    ivsdf = spark.createDataFrame(
        [(9, dt.datetime(2024, 1, 1, 0), dt.datetime(2024, 1, 1, 23))],
        "iid bigint, lo timestamp, hi timestamp",
    )
    cap(
        "Interval (range) join: equi-join on the time slot + containment refine",
        interval_join(pts, ivsdf),
        "No nested-loop / cartesian; intervals replicate only span/width "
        "times and each (point, interval) pair meets in exactly one slot.",
    )
    cap(
        "Audio profile: pruned 3-column scan -> ONE MapInArrow, zero shuffle",
        audio_profile(pq),
        "All-integer outputs; derived floats are a later JVM projection.",
    )
    cap(
        "k-NN graph: LSH bucket SELF-join (SortMergeJoin), norms hoisted below",
        knn_graph(emb, k=2, n_planes=4, n_tables=2),
        "No broadcast of the corpus; post-join projection has zero SQRTs "
        "(norms ride through the join).",
    )

    from valor_spark.operators.text import tfidf_topk, winnow_profile  # noqa: E402

    docsdf = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(20)],
        "doc_id bigint, text string",
    )
    docsdf.write.mode("overwrite").parquet("/tmp/plan_docs")
    docs_pq = spark.read.parquet("/tmp/plan_docs")
    cap(
        "Winnowing fingerprints: token + k-gram-hash arrays each materialized ONCE",
        winnow_profile(docs_pq),
        "Three stacked Projects (tokens -> hash stream -> window mins): the "
        "tokenizer and the md5 stream appear exactly once each — an inline "
        "expression would re-run per window element inside the interpreted "
        "HOF lambda (the round-3 bigram lesson).",
    )
    cap(
        "TF-IDF retrieval: term filter UNDER the explode, broadcast idf, "
        "TakeOrderedAndProject top-k",
        tfidf_topk(docs_pq, ["alpha", "beta"], k=5),
        "Only query-term hits shuffle; idf is a DECIMAL-cast broadcast side; "
        "the top-k never sorts the full score table.",
    )

    from valor_spark.operators.audio import audio_spectrum  # noqa: E402

    cap(
        "Audio spectrum: pruned 4-column scan -> ONE MapInArrow, zero shuffle",
        audio_spectrum(pq),
        "Hann rFFT + two-peak scan per clip inside the Arrow batch; "
        "all-integer outputs, same scale shape as audio_profile.",
    )

    hdr = (
        "# BENCH/PLANS.md — physical-plan evidence\n\n"
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
