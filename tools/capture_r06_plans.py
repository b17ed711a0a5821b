"""Capture `.explain("formatted")` for round-6-touched queries into
plans/r06/<query>_<tag>.txt.

Usage: PYTHONPATH=<tree> python tools/capture_r06_plans.py <tag> [--out DIR]
                                                            [--only a,b,c]

Run from the optimized tree with tag `after`, and from the round-start
worktree with tag `before` (for queries that had no before capture yet).
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOUCHED = [
    "knn_graph", "cosine_topk_lsh", "embedding_near_dup",
    "tfidf_topk", "winnow_pairs", "winnow_docs", "docs_pipeline",
    "dedup_exact", "minhash_lsh_pairs", "simhash_docs",
    "dup_clusters", "dedup_pipeline", "contamination", "bigram_rarity",
    "drift_all", "val_orders", "doc_repetition", "val_docs_quality",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r06"))
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    names = args.only.split(",") if args.only else TOUCHED
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # drift_all collects eagerly; fall back
            sys.stderr.write(f"{name}: {e}\n")
            continue
        with open(os.path.join(args.out, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
