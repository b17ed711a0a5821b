"""Scale up /root/testdata/sfX into a perf-validation dataset (NOT driver data).

The driver's round-end measurement runs at a larger, driver-generated scale
factor (sf1.0 in BENCH_r05.json) that is not shipped in /root/testdata.  For
optimization work we need numbers at that scale, so this tool replicates an
existing sf directory K times with disjoint key spaces:

- fact/dim keys are shifted by ``replica * stride`` so uniqueness and
  referential integrity are preserved at 10x cardinality;
- document text gets a per-replica word suffix (replica 0 is verbatim), so
  within-replica near-dup structure is preserved exactly while cross-replica
  similarity is ~0 — near-dup/minhash/winnow workloads scale the way a
  larger corpus would, instead of degenerating into 10-cliques;
- embeddings get small seeded per-replica noise so vectors are not exact
  duplicates across replicas (no degenerate cosine=1 ties).

Usage::

    python tools/make_sf.py --src /root/testdata/sf0.1 --dst /root/sfx/sf1.0 --k 10

Deterministic (seeded); used only for local perf evidence in
OPTIMIZATION_r06.md — bench.py defaults and driver runs are untouched.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_SHIFTS = {
    # table -> {column: stride}; stride 0 means "max+1 computed at runtime"
    "customer": {"c_custkey": 0},
    "orders": {"o_orderkey": 0, "o_custkey": ("customer", "c_custkey")},
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "part": {"p_partkey": 0},
    "supplier": {"s_suppkey": 0},
    "events": {"event_id": 0, "user_id": 0},
    "documents": {"doc_id": 0},
    "embeddings": {"vec_id": 0},
    "nation": None,  # dims copied verbatim (not scaled)
    "region": None,
}


def _stride(tbl: pa.Table, col: str) -> int:
    return int(pa.compute.max(tbl[col]).as_py()) + 1


def scale_table(name: str, src: str, dst: str, k: int,
                strides: dict[str, int]) -> None:
    tbl = pq.read_table(f"{src}/{name}.parquet")
    spec = KEY_SHIFTS.get(name)
    out = f"{dst}/{name}.parquet"
    if spec is None:
        pq.write_table(tbl, out)
        return

    # resolve strides (own-key strides were precomputed into `strides`)
    resolved = {}
    for col, s in spec.items():
        if s == 0:
            resolved[col] = strides[f"{name}.{col}"]
        else:
            ft, fc = s
            resolved[col] = strides[f"{ft}.{fc}"]

    reps = []
    rng_base = np.random.SeedSequence(421)
    for i in range(k):
        cols = {}
        for field in tbl.schema.names:
            arr = tbl[field]
            if field in resolved:
                shifted = pa.compute.add(arr, i * resolved[field])
                cols[field] = shifted.cast(arr.type)
            elif name == "documents" and field == "text" and i > 0:
                texts = arr.to_pylist()
                # ASCII suffix: the driver's corpora are ASCII, and the
                # fingerprint kernels have an ASCII fast path — a non-ASCII
                # marker here would unrepresentatively force the slow fold
                suf = f"qx{i}"  # per-replica word suffix
                cols[field] = pa.array(
                    [" ".join(w + suf for w in (t or "").split(" "))
                     for t in texts], type=arr.type)
            elif name == "embeddings" and field == "embedding" and i > 0:
                flat = np.asarray(arr.combine_chunks().values, dtype=np.float32)
                offs = np.asarray(arr.combine_chunks().offsets)
                rng = np.random.default_rng(rng_base.spawn(1)[0])
                noisy = flat + rng.normal(0, 0.02, flat.shape).astype(np.float32)
                cols[field] = pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), pa.array(noisy))
            else:
                cols[field] = arr
        reps.append(pa.table(cols, schema=None))
    merged = pa.concat_tables(reps)
    pq.write_table(merged, out, row_group_size=1 << 20)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    # precompute own-key strides first so FK shifts agree
    strides: dict[str, int] = {}
    for name, spec in KEY_SHIFTS.items():
        if not spec:
            continue
        tbl_cols = [c for c, s in spec.items() if s == 0]
        if tbl_cols:
            t = pq.read_table(f"{args.src}/{name}.parquet", columns=tbl_cols)
            for c in tbl_cols:
                strides[f"{name}.{c}"] = _stride(t, c)

    for name in KEY_SHIFTS:
        scale_table(name, args.src, args.dst, args.k, strides)
        print(f"{name}: done")
    open(f"{args.dst}/_DONE", "w").close()


if __name__ == "__main__":
    main()
