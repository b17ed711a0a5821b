"""Checkpoint / lineage / resume (north_rule).

Plain parquet + JSON-lines bookkeeping — no custom Spark machinery.  A run
directory holds:

* ``manifest.jsonl`` — one record per completed (stage, shard):
  ``{stage, shard, rows, violations, wall_s, fingerprint, finished_at}``.
  The fingerprint is ``sum(xxhash64(clip_id))`` over the shard's input rows
  (computed inside the same aggregation that produces the metrics — free),
  so a resumed run can detect that a shard's input changed since the
  checkpoint and recompute it.
* ``violations/stage=<name>/`` — violation rows parquet, written per stage.

Resume contract: shard-local stages (row rules, audio) skip shards whose
recorded fingerprint still matches by filtering the scan — at production
scale that filter prunes Iceberg partitions.  Whole-table stages
(uniqueness, referential, drift) are global and resume at stage granularity
(shard = -1).

Deployment note: the run directory must be a filesystem every retry of the
DRIVER can reach (HDFS/S3/DBFS mount on a cluster; local disk suffices in
local mode).  Executors never touch the manifest — only violation parquet
goes through Spark writers.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame

GLOBAL_SHARD = -1


@dataclass
class ShardRecord:
    stage: str
    shard: int
    rows: int
    violations: int
    wall_s: float
    fingerprint: int
    finished_at: float


class RunManifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "manifest.jsonl")

    def records(self) -> list[ShardRecord]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(ShardRecord(**json.loads(line)))
                except (json.JSONDecodeError, TypeError):
                    # a crash mid-append can leave a torn trailing line;
                    # treat it as not-checkpointed (the shard reruns)
                    continue
        return out

    def completed_shards(self, stage: str) -> set[int]:
        return {r.shard for r in self.records() if r.stage == stage}

    def shard_fingerprints(self, stage: str) -> dict[int, int]:
        """Latest recorded input fingerprint per shard (last record wins —
        a recomputed shard appends a fresh record)."""
        out: dict[int, int] = {}
        for r in self.records():
            if r.stage == stage:
                out[r.shard] = r.fingerprint
        return out

    def stage_done(self, stage: str) -> bool:
        return GLOBAL_SHARD in self.completed_shards(stage)

    def append(self, records: list[ShardRecord]) -> None:
        # append-then-flush: a crash mid-append loses at most the in-flight
        # lines; completed shards stay durable
        with open(self.path, "a") as f:
            for r in records:
                f.write(json.dumps(asdict(r)) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def violations_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, "violations", f"stage={stage}")

    def write_violations(
        self, stage: str, df: DataFrame, partition_by: str | None = None
    ) -> None:
        """Persist a stage's violation rows.

        With ``partition_by`` (shard-local stages): dynamic partition
        overwrite — a recomputed shard replaces ONLY its own partition, so
        fingerprint-invalidated shards don't duplicate rows.  Global stages
        overwrite the whole stage directory."""
        w = df.write
        if partition_by:
            w = (
                w.partitionBy(partition_by)
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
            )
        else:
            w = w.mode("overwrite")
        w.parquet(self.violations_path(stage))

    def mark_global(self, stage: str, rows: int, violations: int, wall_s: float) -> None:
        self.append(
            [
                ShardRecord(
                    stage=stage,
                    shard=GLOBAL_SHARD,
                    rows=rows,
                    violations=violations,
                    wall_s=wall_s,
                    fingerprint=0,
                    finished_at=time.time(),
                )
            ]
        )
