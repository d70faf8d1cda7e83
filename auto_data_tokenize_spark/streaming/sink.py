"""Idempotent exactly-once table sink with per-partition commit lineage.

Iceberg-style snapshot semantics over plain parquet. Layout:

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

SCOPE: the marker log uses driver-side POSIX I/O (os.replace, glob),
so ``table_path`` must be a path the DRIVER can see — local disk or a
shared POSIX mount (NFS/Lustre); URL-scheme paths (hdfs://, s3a://)
are rejected at construction. On a cluster whose executors write to
object storage, the DATA write still distributes normally (executors
write in parallel; only the O(1) marker publish is driver-side), but
the table root itself must be driver-visible. A production deployment
on non-POSIX storage would swap the marker log for the table format's
native atomic snapshot pointer — which is exactly what
``use_iceberg=True`` does: data routes through a real Iceberg table,
gated on the Iceberg runtime jar being present. Iceberg mode is
exactly-once on BOTH sides of the marker now:

- append mode stamps every snapshot with ``adt.batch-id`` and checks
  the table's snapshot summaries for that stamp BEFORE appending
  (WAP-lite): a crash between the Iceberg commit and the marker
  publish makes the redelivery a no-op instead of a double append.
- upsert mode (``key_cols``) routes through ``MERGE INTO`` whose
  update condition is strictly monotone in (version, batch id) — a
  redelivered batch merges to a no-op by construction, so the
  crash window needs no stamp at all.

All Iceberg catalog operations go through an :class:`IcebergAdapter`
seam so the exactly-once orchestration is testable hermetically (the
reference's DlpServiceStub pattern, test/testing/stubs/) even where
the runtime jar is absent; the real adapter is jar-gated.
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


def iceberg_merge_sql(
    table: str,
    source_view: str,
    key_cols: tuple[str, ...],
    version_col: str,
) -> str:
    """The upsert MERGE statement. The update condition is strictly
    monotone in (version, _adt_batch): a redelivered micro-batch finds
    every key matched with EQUAL version and batch id, every condition
    false, and commits a no-op snapshot — idempotence by construction,
    no write-audit-publish dance needed. Ties on version across
    batches break to the higher batch id, the same contract as the
    parquet commit-log resolution. Tombstone rows are UPDATED/INSERTED
    like any other row (retained, filtered at read) so a late
    lower-version redelivery cannot resurrect a deleted key — the same
    LSM-delete reasoning as ``compact(keep_tombstones=True)``."""
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in key_cols)
    v = version_col
    cond = f"s.{v} > t.{v} OR (s.{v} = t.{v} AND s._adt_batch > t._adt_batch)"
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED AND ({cond}) THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


class IcebergAdapter:
    """Real Iceberg catalog operations (jar-gated). This is the seam a
    hermetic test fake implements (the reference's service-stub
    pattern: test/testing/stubs/dlp/Base64EncodingDlpStub.java) so the
    sink's exactly-once orchestration — WAP-lite stamp check, merge
    idempotence, marker interplay — is testable without the runtime
    jar; with the jar, this class is the production path."""

    def __init__(self, table: str):
        self.table = table

    def ensure_available(self, spark: SparkSession) -> None:
        from auto_data_tokenize_spark.streaming.source import iceberg_available

        if not iceberg_available(spark):
            raise RuntimeError(
                "use_iceberg=True but the Iceberg Spark runtime jar is not "
                "on the classpath (need iceberg-spark-runtime and a "
                "configured catalog); rerun with plain-parquet mode or add "
                "the jar via spark.jars.packages"
            )

    def table_exists(self, spark: SparkSession) -> bool:
        return spark.catalog.tableExists(self.table)

    def has_batch(self, spark: SparkSession, batch_id: int) -> bool:
        """WAP-lite: did ANY committed snapshot carry this batch's
        stamp? Checked before append so a crash between the Iceberg
        commit and the local marker publish cannot double-append."""
        if not self.table_exists(spark):
            return False
        from pyspark.sql import functions as F

        snaps = spark.read.table(f"{self.table}.snapshots")
        return (
            snaps.filter(
                F.expr(f"summary['adt.batch-id'] = '{int(batch_id)}'")
            ).limit(1).count()
            > 0
        )

    def _writer(self, df: DataFrame, batch_id: int):
        return df.writeTo(self.table).option(
            "snapshot-property.adt.batch-id", str(batch_id)
        )

    def create(self, df: DataFrame, batch_id: int) -> None:
        self._writer(df, batch_id).create()

    def append(self, df: DataFrame, batch_id: int) -> None:
        self._writer(df, batch_id).append()

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        batch_id: int,
        key_cols: tuple[str, ...],
        version_col: str,
    ) -> None:
        view = f"adt_merge_src_{uuid.uuid4().hex}"
        source.createOrReplaceTempView(view)
        try:
            spark.sql(
                iceberg_merge_sql(self.table, view, key_cols, version_col)
            )
        finally:
            spark.catalog.dropTempView(view)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.table(self.table)


class ExactlyOnceSink:
    """See module docstring. ``key_cols``/``version_col`` switch the
    table into UPSERT (merge-on-read) mode — the CDC / dimension-
    maintenance shape: every micro-batch still APPENDS (cheap, no
    table rewrite — LSM-style), and ``read_committed`` resolves each
    key to its highest-version row, ties broken by batch id.
    ``compact()`` then IS the merge: it materializes the resolved view
    as the single compacted batch, discarding superseded versions.
    Contract: (version, batch id) must order each key's updates
    totally — reuse an event version/timestamp your CDC feed already
    carries. ``tombstone_col`` (boolean), when set, deletes a key once
    its winning row is a tombstone — the row disappears from reads and
    from the next compaction, the standard LSM delete."""

    def __init__(
        self,
        table_path: str,
        partition_by: tuple[str, ...] = (),
        use_iceberg: bool = False,
        iceberg_table: str | None = None,
        key_cols: tuple[str, ...] = (),
        version_col: str | None = None,
        tombstone_col: str | None = None,
        merge_schema: bool = False,
        iceberg_adapter: IcebergAdapter | None = None,
    ):
        if "://" in table_path:
            raise ValueError(
                f"table_path {table_path!r} has a URL scheme: the commit-"
                "marker log is driver-side POSIX I/O and needs a local or "
                "shared-POSIX path (see module docstring); for object-store "
                "tables use use_iceberg=True with a driver-visible marker dir"
            )
        if use_iceberg and not iceberg_table:
            raise ValueError("use_iceberg=True requires iceberg_table=<catalog.db.name>")
        if bool(key_cols) != bool(version_col):
            raise ValueError(
                "upsert mode needs BOTH key_cols and version_col (the "
                "version orders each key's updates deterministically)"
            )
        if tombstone_col and not key_cols:
            raise ValueError("tombstone_col requires upsert mode (key_cols)")
        if iceberg_adapter is not None and not use_iceberg:
            raise ValueError("iceberg_adapter requires use_iceberg=True")
        self._iceberg = (
            iceberg_adapter
            or (IcebergAdapter(iceberg_table) if use_iceberg else None)
        )
        self.table_path = table_path
        self.partition_by = tuple(partition_by)
        self.use_iceberg = use_iceberg
        self.iceberg_table = iceberg_table
        self.key_cols = tuple(key_cols)
        self.version_col = version_col
        self.tombstone_col = tombstone_col
        # schema evolution: batches may add columns over the table's
        # life (the CDC reality); readers then union schemas, with
        # NULLs where an old batch lacks a new column. Off by default —
        # merged-footer reads cost a footer pass per file.
        self.merge_schema = merge_schema
        self.data_dir = os.path.join(table_path, "data")
        self.commits_dir = os.path.join(table_path, "_commits")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commits_dir, exist_ok=True)

    # -- commit log --------------------------------------------------------

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def _head_path(self) -> str:
        return os.path.join(self.commits_dir, "HEAD")

    def _read_head(self) -> dict | None:
        try:
            with open(self._head_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _marker_ids(self) -> list[int]:
        out = []
        for p in glob.glob(os.path.join(self.commits_dir, "*.json")):
            stem = os.path.splitext(os.path.basename(p))[0]
            try:
                out.append(int(stem))
            except ValueError:
                continue
        return sorted(out)

    def committed_batches(self) -> list[int]:
        """Active batch set. Without compaction: every marker. With a
        HEAD snapshot pointer: the compacted ids plus any marker ABOVE
        the compaction floor (streaming batch ids are monotonic, so
        batches appended after a compaction are always above it)."""
        markers = self._marker_ids()
        head = self._read_head()
        if head is None:
            # negative ids are compacted batches, visible ONLY through a
            # HEAD pointer — before the HEAD swap (or after a crash
            # mid-compaction) they must stay invisible, or readers would
            # see the compacted copy AND the originals (double rows)
            return [i for i in markers if i >= 0]
        active = set(head["compacted_ids"])
        active.update(i for i in markers if i > head["floor"])
        return sorted(active)

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
        if self.key_cols:
            # upsert resolution surfaces the batch dir as a `batch_id`
            # partition column and uses `_rn` internally (parquet mode)
            # or stores `_adt_batch` (Iceberg merge mode) — same-named
            # data columns would break or silently be dropped (the
            # asof_join collision rule, applied here)
            clash = {"batch_id", "_rn", "_adt_batch"}.intersection(df.columns)
            if clash:
                raise ValueError(
                    f"column(s) {sorted(clash)} collide with upsert-mode "
                    "internals; rename them before the sink"
                )
        if self.is_committed(batch_id):
            return  # redelivery after restart — exactly-once dedupe
        if self.use_iceberg:
            self._foreach_batch_iceberg(df, batch_id)
            return
        target = self._batch_dir(batch_id)
        if os.path.exists(target):
            shutil.rmtree(target)  # partial write from a crashed attempt
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(target)
        self._publish(batch_id, target)

    def _publish(self, batch_id: int, target: str) -> None:
        """Collect per-file lineage from the parquet footers (no second
        scan) and atomically publish the commit marker."""
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

    # -- maintenance ---------------------------------------------------------

    def compact(self, spark: SparkSession) -> dict:
        """Merge all active batches into ONE compacted batch — the
        small-files maintenance a per-micro-batch layout needs at
        production trigger rates (thousands of dirs/day otherwise).

        Atomicity is a snapshot-pointer cutover, the same trick the
        marker publish uses (and the reason Iceberg/Delta have snapshot
        files): the compacted data + marker are written INVISIBLY first
        (compacted ids are negative, and without a HEAD update readers
        ignore unknown negatives only through HEAD — concretely, the
        reader set only changes when ``_commits/HEAD`` is atomically
        replaced). A crash before the HEAD swap leaves the old view; a
        crash after it leaves exactly the compacted view; old dirs are
        garbage-collected last, best-effort. Streaming appends keep
        working mid-compaction: their batch ids are positive and
        monotonic, so anything above the recorded floor stays visible.

        Checkpoint-redelivery interaction: if a restart redelivers a
        batch whose marker compaction already retired, foreach_batch
        rewrites it — harmlessly: its id is ≤ the floor, so readers
        never resolve it (the rows live on inside the compacted batch);
        the orphan costs disk until the next GC, never duplicates.
        """
        if self.use_iceberg:
            raise ValueError(
                "compact() applies to the parquet commit-log layout; "
                "Iceberg tables use their own maintenance "
                "(rewrite_data_files / expire_snapshots)"
            )
        self._gc_orphans()
        ids = self.committed_batches()
        if len(ids) < 2:
            return {"compacted_batches": 0, "rows": self.total_rows()}
        head = self._read_head()
        new_id = (
            min(head["compacted_ids"]) - 1
            if head and head["compacted_ids"]
            else -1
        )
        target = self._batch_dir(new_id)
        if os.path.exists(target):
            shutil.rmtree(target)
        batch_dirs = [self._batch_dir(b) for b in ids]
        # upsert mode: compaction IS the merge — materialize the
        # resolved latest-per-key view, dropping superseded versions.
        # Tombstone rows are RETAINED (keep_tombstones): physically
        # dropping one would erase its version, and a late/replayed
        # LOWER-version update for that key would then resurrect it —
        # the classic LSM delete hazard. Readers keep filtering them;
        # they cost one row per deleted key until the feed can
        # guarantee no older redeliveries remain.
        df = (
            self._resolve_upserts(spark, batch_dirs, keep_tombstones=True)
            if self.key_cols
            else self._read_parquet(spark, batch_dirs)
        )
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(target)
        self._publish(new_id, target)

        floor = max([i for i in ids if i >= 0], default=head["floor"] if head else -1)
        tmp = self._head_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"floor": floor, "compacted_ids": [new_id]}, f)
        os.replace(tmp, self._head_path())  # atomic cutover

        # GC retired batches (safe: no reader resolves them anymore)
        for b in ids:
            shutil.rmtree(self._batch_dir(b), ignore_errors=True)
            try:
                os.unlink(self._commit_path(b))
            except FileNotFoundError:
                pass
        return {"compacted_batches": len(ids), "rows": self.total_rows()}

    def _gc_orphans(self) -> None:
        """Remove retired batches a previous compact() crashed before
        collecting: any marker/dir whose id is at or below the HEAD
        floor and not among the compacted ids is invisible to every
        reader (committed_batches() excludes it) yet would otherwise
        leak disk forever, since later compactions only look above the
        floor. Runs at the start of every compact()."""
        head = self._read_head()
        if head is None:
            return
        keep = set(head["compacted_ids"])
        for b in self._marker_ids():
            if b in keep or b > head["floor"]:
                continue
            shutil.rmtree(self._batch_dir(b), ignore_errors=True)
            try:
                os.unlink(self._commit_path(b))
            except FileNotFoundError:
                pass

    def _foreach_batch_iceberg(self, df: DataFrame, batch_id: int) -> None:
        """Gated Iceberg data path, then publish the local marker.

        Append mode: WAP-lite — every snapshot carries the
        ``adt.batch-id`` stamp and the stamp is CHECKED before
        appending, so a crash between the Iceberg commit and the
        marker publish redelivers into a no-op, never a double append.

        Upsert mode (``key_cols``): the batch is deduplicated to its
        latest row per key, stamped with ``_adt_batch``, and applied
        via ``MERGE INTO`` whose update condition is strictly monotone
        in (version, batch id) — see :func:`iceberg_merge_sql` for why
        redelivery is a structural no-op."""
        spark = df.sparkSession
        a = self._iceberg
        a.ensure_available(spark)
        if self.key_cols:
            from pyspark.sql import Window, functions as F

            w = Window.partitionBy(*self.key_cols).orderBy(
                F.desc(self.version_col)
            )
            src = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
                .withColumn("_adt_batch", F.lit(int(batch_id)))
            )
            if not a.table_exists(spark):
                a.create(src, batch_id)
            else:
                a.merge(spark, src, batch_id, self.key_cols, self.version_col)
        elif a.has_batch(spark, batch_id):
            pass  # crashed after the Iceberg commit: data is in; marker only
        elif a.table_exists(spark):
            a.append(df, batch_id)
        else:
            a.create(df, batch_id)
        commit = {
            "batch_id": batch_id,
            "row_count": None,  # row accounting lives in the Iceberg snapshot
            "num_files": None,
            "files": [],
            "iceberg_table": self.iceberg_table,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = self._commit_path(batch_id) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(commit, f)
        os.replace(tmp, self._commit_path(batch_id))

    # -- read path -----------------------------------------------------------

    def read_committed(self, spark: SparkSession) -> DataFrame:
        if self.use_iceberg:
            from pyspark.sql import functions as F

            out = self._iceberg.read(spark)
            if self.key_cols:
                # merge mode keeps the batch stamp as a physical column
                # and retains tombstone rows (see iceberg_merge_sql)
                out = out.drop("_adt_batch")
                if self.tombstone_col:
                    out = out.filter(
                        ~F.coalesce(F.col(self.tombstone_col), F.lit(False))
                    )
            return out
        dirs = [self._batch_dir(b) for b in self.committed_batches()]
        if not dirs:
            raise ValueError(f"no committed batches under {self.table_path}")
        if not self.key_cols:
            return self._read_parquet(spark, dirs)
        return self._resolve_upserts(spark, dirs)

    def _read_parquet(self, spark: SparkSession, dirs: list[str]) -> DataFrame:
        reader = spark.read
        if self.merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*dirs)

    def _resolve_upserts(
        self,
        spark: SparkSession,
        dirs: list[str],
        keep_tombstones: bool = False,
    ) -> DataFrame:
        """Merge-on-read: latest (version, batch_id) row per key. One
        shuffle on the key — the same shape at any table size, since
        resolution is per-key and batches are key-partitionable; the
        ``basePath`` option surfaces each dir's batch_id as a partition
        column for the tie-break. ``keep_tombstones`` is the compaction
        path: the winning tombstone row is RETAINED so its version
        keeps suppressing late/replayed lower-version updates."""
        from pyspark.sql import Window, functions as F

        reader = spark.read.option("basePath", self.data_dir)
        if self.merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*dirs)
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.desc(self.version_col), F.desc("batch_id")
        )
        out = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "batch_id")
        )
        if self.tombstone_col and not keep_tombstones:
            out = out.filter(
                ~F.coalesce(F.col(self.tombstone_col), F.lit(False))
            )
        return out

    def total_rows(self) -> int:
        # Iceberg-mode markers carry row_count=None (row accounting
        # lives in the Iceberg snapshot)
        return sum(c["row_count"] or 0 for c in self.lineage())
