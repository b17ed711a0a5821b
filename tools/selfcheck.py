"""Local replica of the driver's correctness gate: run every
``queries()[name]`` on Spark and the matching ``oracle_sql()[name]`` on
DuckDB at sf0.01, compare row count, column names, and an order-insensitive
value hash.

Usage: PYTHONPATH=/root/repo python tools/selfcheck.py [sf_dir] [--partitions N]

``--partitions`` varies spark.sql.shuffle.partitions — float aggregation
order depends on partitioning, so a query that hash-matches at one setting
but not another has a representation-stability bug (the col_stats class of
failure); sweep 3/8/32 before trusting a float-producing query.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == 0.0:
            v = 0.0  # fold -0.0 (engines disagree on round()'s signed zero)
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(sf_dir: str, partitions: int = 8) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("valor-selfcheck")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc).splitlines()[0][:160]}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if not problems:
            hs, ho = value_hash(srows, scols), value_hash(orows, ocols)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            if len(srows) and len(orows):
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in srows)
                oo = sorted("|".join(norm_cell(r[i]) for i in order_o) for r in orows)
                only_s = [x for x in ss if x not in set(oo)][:3]
                only_o = [x for x in oo if x not in set(ss)][:3]
                print(f"      spark-only: {only_s}")
                print(f"      duck-only : {only_o}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    parts = 8
    if "--partitions" in args:
        i = args.index("--partitions")
        parts = int(args[i + 1])
        del args[i : i + 2]
    sf = args[0] if args else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, partitions=parts))
