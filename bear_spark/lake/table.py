"""LakeTable — copy-on-write table with atomic snapshots and a commit log.

Layout on disk::

    <root>/
      _meta/VERSION          # current snapshot version (atomic os.replace)
      _meta/v<N>.json        # immutable snapshot documents
      data/s<N>/_bucket_dir=<K>/*.parquet   # data files staged by commit N

A snapshot records: the schema registry (all schema versions), the data
files per bucket (each tagged with the schema version it was written
under), the commit log (per source_partition high-water offset), the
event-time watermark, and a lineage tail of recent commit metrics.

Guarantees (the Iceberg-shaped contract the north rule asks for):

- **Atomic commits**: data files are staged first, then the snapshot
  JSON and the VERSION pointer are swapped via ``os.replace`` —
  readers see either the old or the new snapshot, never a mix
  (two-phase: stage data, swap metadata).
- **Exactly-once**: the commit log lives INSIDE the snapshot, so
  "rows applied" and "offsets advanced" are one atomic write. A
  replayed micro-batch whose ``(source_partition, offset)`` ranges are
  already applied is filtered/skipped before any data is written.
- **Idempotent convergence**: MERGE applies last-writer-wins by
  ``(ts, lsn)``; deletes keep tombstones so a late, stale update can
  never resurrect a deleted row. Replaying any prefix of the changelog,
  any number of times, in any order, converges to the same final state.
- **Pruned copy-on-write**: rows are bucketed by ``xxhash64(conv_id)``;
  a MERGE rewrites only the buckets its batch touches.

The reference analog is the Milvus collection + PK upsert
(reference: bear/db.py:22-50 DDL, bear/db.py:72-83 upsert) and the
delete-after-ingest offset commit (reference: bear/ingest.py:25-27),
which is only at-least-once; this table upgrades that to exactly-once.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bear_spark.lake import reconcile
from bear_spark.schema import schema_from_json, schema_to_json

_SYS_FIELDS = [
    T.StructField("_lsn", T.LongType(), True),
    T.StructField("_deleted", T.BooleanType(), True),
    T.StructField("_bucket", T.IntegerType(), True),
]
_ENVELOPE = ("op", "lsn", "source_partition", "offset")


class ConcurrentCommit(RuntimeError):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------- DDL
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: Sequence[str],
        seq_col: str = "ts",
        bucket_cols: Sequence[str] | None = None,
        num_buckets: int = 16,
        lateness_sec: int = 3600,
        overwrite: bool = False,
    ) -> "LakeTable":
        """CREATE TABLE: write snapshot v0 (no data files).

        ``schema`` is the payload schema; system columns (_lsn, _deleted,
        _bucket) are managed by the table. ``seq_col`` + lsn form the LWW
        order. ``bucket_cols`` default to the first key column.
        """
        meta = os.path.join(root, "_meta")
        if os.path.exists(meta):
            if not overwrite:
                raise FileExistsError(f"table exists at {root}")
            shutil.rmtree(root)
        os.makedirs(meta, exist_ok=True)
        snap = {
            "version": 0,
            "key_cols": list(key_cols),
            "seq_col": seq_col,
            "bucket_cols": list(bucket_cols or key_cols[:1]),
            "num_buckets": int(num_buckets),
            "lateness_sec": int(lateness_sec),
            "schemas": {"0": schema_to_json(schema)},
            "current_schema_version": 0,
            "files": {},  # bucket(str) -> [{path, schema_version}]
            "commit_log": {},  # source_partition(str) -> max applied offset
            "watermark_ts": None,  # ISO string of event-time watermark
            "lineage": [],
        }
        tbl = LakeTable(spark, root)
        tbl._write_snapshot(snap, expect_version=None)
        return tbl

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeTable":
        t = LakeTable(spark, root)
        t._snapshot()  # raises if missing
        return t

    # -------------------------------------------------------- metadata
    def _version(self) -> int:
        with open(os.path.join(self.root, "_meta", "VERSION")) as f:
            return int(f.read().strip())

    def _snapshot(self) -> dict[str, Any]:
        v = self._version()
        with open(os.path.join(self.root, "_meta", f"v{v}.json")) as f:
            return json.load(f)

    def _write_snapshot(self, snap: dict[str, Any], expect_version: int | None) -> None:
        """Two-phase commit, phase 2: publish metadata atomically."""
        meta = os.path.join(self.root, "_meta")
        if expect_version is not None and self._version() != expect_version:
            raise ConcurrentCommit(
                f"table advanced past v{expect_version} during commit"
            )
        path = os.path.join(meta, f"v{snap['version']}.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, path)
        vtmp = os.path.join(meta, f"VERSION.tmp-{uuid.uuid4().hex}")
        with open(vtmp, "w") as f:
            f.write(str(snap["version"]))
        os.replace(vtmp, os.path.join(meta, "VERSION"))

    # public introspection -------------------------------------------------
    @property
    def snapshot(self) -> dict[str, Any]:
        return self._snapshot()

    def payload_schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self._snapshot()
        return schema_from_json(snap["schemas"][str(snap["current_schema_version"])])

    def applied_offsets(self) -> dict[int, int]:
        return {int(k): int(v) for k, v in self._snapshot()["commit_log"].items()}

    def history(self) -> list[dict]:
        return self._snapshot()["lineage"]

    # ------------------------------------------------------------- read
    def _bucket_expr(self, snap: dict):
        cols = [F.col(c) for c in snap["bucket_cols"]]
        return F.pmod(F.xxhash64(*cols), F.lit(snap["num_buckets"])).cast("int")

    def _read_files(self, snap: dict, buckets: Sequence[int] | None) -> DataFrame:
        """Scan data files (system cols included), aligned to the current
        schema. Files are grouped by the schema version they were written
        under; each group is read with its physical schema and cast up —
        this is how old files survive type widening."""
        target = T.StructType(self.payload_schema(snap).fields + _SYS_FIELDS)
        by_ver: dict[int, list[str]] = {}
        for b, files in snap["files"].items():
            if buckets is not None and int(b) not in set(buckets):
                continue
            for fi in files:
                by_ver.setdefault(int(fi["schema_version"]), []).append(
                    os.path.join(self.root, fi["path"])
                )
        if not by_ver:
            return self.spark.createDataFrame([], target)
        parts = []
        for ver, paths in sorted(by_ver.items()):
            phys = T.StructType(
                schema_from_json(snap["schemas"][str(ver)]).fields + _SYS_FIELDS
            )
            df = self.spark.read.schema(phys).parquet(*paths)
            parts.append(reconcile.align(df, target))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(
        self,
        include_deleted: bool = False,
        include_system: bool = False,
        buckets: Sequence[int] | None = None,
    ) -> DataFrame:
        snap = self._snapshot()
        df = self._read_files(snap, buckets)
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
        if not include_system:
            df = df.drop("_lsn", "_deleted", "_bucket")
        return df

    # ------------------------------------------------------------ MERGE
    def merge(self, batch: DataFrame, fence: bool = True) -> dict[str, Any]:
        """MERGE a batch of change events into the table (copy-on-write).

        ``batch`` carries the payload columns plus ``op`` ('I'/'U'/'D')
        and ``lsn``; if ``source_partition``/``offset`` are present and
        ``fence`` is true, already-applied offsets are filtered out and
        the commit log advances atomically with the data.

        Plan shape (one shuffle): fence-filter → union(batch as events,
        touched-bucket table rows as events) → groupBy(key).max_by(row,
        (ts, lsn)) → write per-bucket files. Metrics are collected with
        ``observe`` on the same plan — no extra passes over the data.
        """
        snap = self._snapshot()
        expect_version = snap["version"]
        key_cols = snap["key_cols"]
        seq_col = snap["seq_col"]

        # --- schema reconciliation (registry-style) ---
        payload_batch = T.StructType(
            [f for f in batch.schema.fields if f.name not in _ENVELOPE]
        )
        table_schema = self.payload_schema(snap)
        new_schema, changes = reconcile.evolve(table_schema, payload_batch)
        schema_version = int(snap["current_schema_version"])
        if changes:
            schema_version += 1

        has_env = {"source_partition", "offset"} <= set(batch.columns)

        # --- exactly-once fencing ---
        rows_in = None
        if fence and has_env and snap["commit_log"]:
            hw = self.spark.createDataFrame(
                [(int(p), int(o)) for p, o in snap["commit_log"].items()],
                "source_partition int, _applied long",
            )
            batch = (
                batch.join(F.broadcast(hw), "source_partition", "left")
                .filter(F.col("_applied").isNull() | (F.col("offset") > F.col("_applied")))
                .drop("_applied")
            )

        src = batch.withColumn("_bucket", self._bucket_expr(snap))
        src = src.persist()
        try:
            # one small job: per (source_partition, bucket) stats →
            # emptiness check + offset high-waters + touched buckets.
            if has_env:
                stats = (
                    src.groupBy("source_partition", "_bucket")
                    .agg(F.max("offset").alias("mo"), F.count(F.lit(1)).alias("c"))
                    .collect()
                )
                touched = sorted({r["_bucket"] for r in stats})
                new_offsets: dict[str, int] = dict(snap["commit_log"])
                for r in stats:
                    k = str(int(r["source_partition"]))
                    new_offsets[k] = max(int(new_offsets.get(k, -1)), int(r["mo"]))
                rows_in = sum(int(r["c"]) for r in stats)
            else:
                touched = sorted(
                    r["_bucket"] for r in src.select("_bucket").distinct().collect()
                )
                new_offsets = dict(snap["commit_log"])

            if not touched:
                return {
                    "version": snap["version"],
                    "skipped": True,
                    "rows_in": 0,
                    "reason": "batch empty after exactly-once fence",
                }

            wm = snap["watermark_ts"]

            def to_events(df: DataFrame, op_col, lsn_col) -> DataFrame:
                """Project onto the evolved payload schema + (_op, _elsn)."""
                have = set(df.columns)
                cols = [
                    (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(f.name)
                    for f in new_schema.fields
                ]
                return df.select(*cols, op_col.alias("_op"), lsn_col.alias("_elsn"))

            # --- normalize both sides to "event" shape: payload + op + lsn
            src_evt = to_events(src, F.col("op"), F.col("lsn"))
            obs_src = Observation()
            src_evt = src_evt.observe(
                obs_src,
                F.count(F.lit(1)).alias("n"),
                F.max(seq_col).alias("max_ts"),
                F.sum(
                    (F.col(seq_col) < F.lit(wm).cast("timestamp")).cast("long")
                    if wm
                    else F.lit(0)
                ).alias("late"),
            )

            tgt = self._read_files(snap, touched)
            obs_tgt = Observation()
            tgt = tgt.observe(obs_tgt, F.count(F.lit(1)).alias("n"))
            tgt_evt = to_events(
                tgt,
                F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")),
                F.col("_lsn"),
            )

            unioned = src_evt.unionByName(tgt_evt)
            # LWW: hash agg with map-side combine (see operators.dedup)
            row = F.struct(*[F.col(c) for c in unioned.columns])
            seq = F.struct(F.col(seq_col), F.col("_elsn"))
            winner = (
                unioned.groupBy(*key_cols)
                .agg(F.max_by(row, seq).alias("_row"))
                .select("_row.*")
            )
            final = winner.select(
                *[F.col(f.name) for f in new_schema.fields],
                F.col("_elsn").alias("_lsn"),
                (F.col("_op") == "D").alias("_deleted"),
            ).withColumn("_bucket", self._bucket_expr(snap))

            obs_out = Observation()
            final = final.observe(
                obs_out,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("_deleted").cast("long")).alias("tombstones"),
            )

            # --- two-phase commit, phase 1: stage data files ---
            new_version = expect_version + 1
            stage_rel = os.path.join("data", f"s{new_version}")
            stage_dir = os.path.join(self.root, stage_rel)
            (
                final.withColumn("_bucket_dir", F.col("_bucket"))
                .write.partitionBy("_bucket_dir")
                .mode("overwrite")
                .parquet(stage_dir)
            )

            m_src, m_tgt, m_out = obs_src.get, obs_tgt.get, obs_out.get
            if rows_in is None:
                rows_in = int(m_src["n"])

            # enumerate staged files per bucket
            new_files: dict[str, list[dict]] = {str(b): [] for b in touched}
            for b in touched:
                bdir = os.path.join(stage_dir, f"_bucket_dir={b}")
                if os.path.isdir(bdir):
                    for fn in sorted(os.listdir(bdir)):
                        if fn.endswith(".parquet"):
                            new_files[str(b)].append(
                                {
                                    "path": os.path.join(stage_rel, f"_bucket_dir={b}", fn),
                                    "schema_version": schema_version,
                                }
                            )

            files = dict(snap["files"])
            files.update(new_files)

            max_ts = m_src["max_ts"]
            new_wm = wm
            if max_ts is not None:
                # watermark = max event time seen - allowed lateness
                import datetime as _dt

                cand = (max_ts - _dt.timedelta(seconds=snap["lateness_sec"])).isoformat(sep=" ")
                if new_wm is None or cand > new_wm:
                    new_wm = cand

            metrics = {
                "version": new_version,
                "skipped": False,
                "rows_in": rows_in,
                "rows_after_fence": int(m_src["n"]),
                "late_events": int(m_src["late"] or 0),
                "target_rows_read": int(m_tgt["n"]),
                "rows_written": int(m_out["n"]),
                "tombstones": int(m_out["tombstones"] or 0),
                "dedup_drops": int(m_src["n"]) + int(m_tgt["n"]) - int(m_out["n"]),
                "buckets_touched": len(touched),
                "schema_changes": changes,
            }

            schemas = dict(snap["schemas"])
            if changes:
                schemas[str(schema_version)] = schema_to_json(new_schema)

            new_snap = {
                **snap,
                "version": new_version,
                "schemas": schemas,
                "current_schema_version": schema_version,
                "files": files,
                "commit_log": new_offsets,
                "watermark_ts": new_wm,
                "lineage": (snap["lineage"] + [metrics])[-200:],
            }
            # phase 2: atomic metadata swap (aborts → staged files orphaned,
            # cleaned by vacuum(); the table itself is untouched)
            self._write_snapshot(new_snap, expect_version=expect_version)
            return metrics
        finally:
            src.unpersist()

    # ------------------------------------------------------- maintenance
    def compact(self, target_files_per_bucket: int = 1) -> None:
        """Rewrite each bucket's files into fewer, larger files.

        COW merges leave multiple files per bucket (one per writer task);
        compaction is the standard lake answer. Commits a new snapshot.
        """
        snap = self._snapshot()
        expect_version = snap["version"]
        new_version = expect_version + 1
        stage_rel = os.path.join("data", f"s{new_version}")
        stage_dir = os.path.join(self.root, stage_rel)
        df = self._read_files(snap, None)
        (
            df.withColumn("_bucket_dir", F.col("_bucket"))
            .repartition(max(1, len(snap["files"])), "_bucket")
            .write.partitionBy("_bucket_dir")
            .mode("overwrite")
            .parquet(stage_dir)
        )
        files: dict[str, list[dict]] = {}
        for b in snap["files"]:
            bdir = os.path.join(stage_dir, f"_bucket_dir={b}")
            if os.path.isdir(bdir):
                files[b] = [
                    {
                        "path": os.path.join(stage_rel, f"_bucket_dir={b}", fn),
                        "schema_version": int(snap["current_schema_version"]),
                    }
                    for fn in sorted(os.listdir(bdir))
                    if fn.endswith(".parquet")
                ]
        new_snap = {**snap, "version": new_version, "files": files}
        self._write_snapshot(new_snap, expect_version=expect_version)

    def vacuum(self) -> list[str]:
        """Delete staged data dirs not referenced by the current snapshot."""
        snap = self._snapshot()
        live_dirs = {fi["path"].split(os.sep)[1] for fs in snap["files"].values() for fi in fs}
        removed = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                if d not in live_dirs:
                    shutil.rmtree(os.path.join(data_root, d))
                    removed.append(d)
        return removed
