"""Checkpoint / lineage / resume (north_rule).

Plain parquet + JSON-lines bookkeeping — no custom Spark machinery.  A run
directory holds:

* ``manifest.jsonl`` — one record per completed (stage, shard):
  ``{stage, shard, rows, violations, wall_s, fingerprint, finished_at}``.
  The fingerprint is ``bit_xor(xxhash64(rule-relevant columns))`` over the
  shard's input rows (computed inside the same aggregation that produces the
  metrics — free), so a resumed run detects that a shard's input changed
  since the checkpoint and recomputes it.  Resume decisions compare the
  **(rows, fingerprint) pair** — XOR alone self-cancels when an even number
  of identical rows is added, but that always changes the row count.
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
from dataclasses import asdict, dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    #: per-rule violation counts for this (stage, shard) — the north_rule's
    #: "per-partition lineage + rule metrics"; empty for legacy records
    by_rule: dict = dc_field(default_factory=dict)


class RunManifest:
    def __init__(self, run_dir: str):
        if "://" in run_dir:
            # manifest.jsonl uses plain open()/fsync and partition clearing
            # uses shutil.rmtree — both silently no-op or fail on hdfs://,
            # s3a://, etc., which would serve stale shard violations on
            # resume.  Refuse loudly; mount the store (DBFS/fuse) or point
            # run_dir at a driver-reachable local path instead.
            raise ValueError(
                f"RunManifest requires a local filesystem path, got URI "
                f"{run_dir!r} (manifest append and shard-partition clearing "
                f"use local file APIs)"
            )
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

    def shard_rows_fingerprints(self, stage: str) -> dict[int, tuple[int, int]]:
        """Latest recorded (rows, fingerprint) per shard.  Resume compares
        BOTH — the XOR fingerprint alone self-cancels when an even number of
        identical rows is appended, but that always changes the row count."""
        out: dict[int, tuple[int, int]] = {}
        for r in self.records():
            if r.stage == stage:
                out[r.shard] = (r.rows, r.fingerprint)
        return out

    def stage_done_for(self, stage: str, rows: int, fingerprint: int) -> bool:
        """Stage-granular resume with input validation: the recorded global
        (rows, fingerprint) must match the CURRENT input, otherwise the stage
        recomputes (a whole-table constraint over changed data must not serve
        the previous run's violations)."""
        rec = self.shard_rows_fingerprints(stage).get(GLOBAL_SHARD)
        return rec == (rows, fingerprint)

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
        self,
        stage: str,
        df: DataFrame,
        partition_by: str | None = None,
        replace_shards: "list[int] | None" = None,
    ) -> None:
        """Persist a stage's violation rows.

        With ``partition_by`` + ``replace_shards`` (shard-local stages): the
        named partitions are explicitly CLEARED first, then the new rows are
        appended.  Dynamic partition overwrite is NOT enough here — it only
        replaces partitions *present in the incoming data*, so a recomputed
        shard whose fresh result has ZERO violations would silently keep its
        stale rows.  Explicit clearing makes "shard is now clean" land as an
        empty partition.  Global stages overwrite the whole stage directory."""
        path = self.violations_path(stage)
        if partition_by:
            # hash-cluster on the partition column first: without this,
            # every write task holding rows of a shard emits its own file
            # into that shard's directory (up to #tasks files per shard —
            # measured 32x file inflation at local[32]); clustered, each
            # shard's rows land in one task -> ONE file per shard dir.
            # Violations are tiny relative to the input, so this extra
            # small shuffle is noise, while at 100 TB / O(10^5) shards the
            # unclustered layout is a small-file storm on the manifest
            # store (and a per-file open cost on every resume read-back).
            clustered = df.repartition(F.col(partition_by))
            if replace_shards is None:
                clustered.write.partitionBy(partition_by).mode(
                    "overwrite"
                ).parquet(path)
            else:
                import shutil

                for s in replace_shards:
                    shutil.rmtree(
                        os.path.join(path, f"{partition_by}={s}"), ignore_errors=True
                    )
                clustered.write.partitionBy(partition_by).mode("append").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)

    def read_violations(self, spark, stage: str, schema) -> DataFrame:
        """Read a stage's violation rows back with an EXPLICIT schema — an
        empty write (clean data) leaves a directory with no data files, and
        schema inference would throw UNABLE_TO_INFER_SCHEMA on it."""
        return spark.read.schema(schema).parquet(self.violations_path(stage))

    def mark_global(
        self,
        stage: str,
        rows: int,
        violations: int,
        wall_s: float,
        fingerprint: int = 0,
    ) -> None:
        self.append(
            [
                ShardRecord(
                    stage=stage,
                    shard=GLOBAL_SHARD,
                    rows=rows,
                    violations=violations,
                    wall_s=wall_s,
                    fingerprint=fingerprint,
                    finished_at=time.time(),
                )
            ]
        )
