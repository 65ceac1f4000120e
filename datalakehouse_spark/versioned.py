"""Versioned table — snapshot isolation / time travel on plain parquet.

The reference runs Iceberg tables under a Nessie catalog, whose pitch is
versioned data: every write is a commit, any historical state is
readable, and experiments run on branches (reference:
config/flink/create.sql:1-13; README.md:138 "ramas / commits Nessie para
experimentos").  This container ships no Iceberg/Nessie jars, so the
engine provides the same *capability* with the same *mechanism* Iceberg
uses — an immutable-data-file + manifest design — rather than copying
table state per version:

- Data files are immutable: every commit writes NEW parquet files and
  never deletes or rewrites existing ones (copy-on-write at partition
  granularity, exactly Iceberg COW).
- A commit is one JSON manifest under ``_log/`` listing the files that
  constitute that version, each with its partition values.  Committing
  is a single atomic rename — readers never observe a half-written
  version.
- ``read(version=...)`` hands Spark the manifest's file list (time
  travel); ``rollback()`` is a new commit that re-points at an old
  file list; ``expire_versions()`` is snapshot GC (the
  ``expire_snapshots`` / ``remove_orphan_files`` procedures,
  cleanup.sql:19-31).

Scale posture: the manifest records partition values PER FILE, so
partition pruning happens driver-side on the file list before Spark
ever plans the scan — manifest-level pruning, which is how Iceberg
prunes too (no directory listing of a 100 TB table; the manifest IS the
index).  Reads use ``basePath`` so hive-style partition columns are
recovered from the kept directory layout.

Single-writer assumption: commit ordering is monotonic version numbers;
a real multi-writer deployment gets its commit protocol from the
catalog (Nessie/Iceberg optimistic locking).  Documented, not hidden.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    """Parquet-backed table with commit log, time travel and rollback."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: Sequence[str] = (),
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.partition_by = list(partition_by)
        self.data_dir = os.path.join(self.path, "data")
        self.log_dir = os.path.join(self.path, "_log")

    # -- commit log ---------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:05d}.json")

    def current_version(self) -> int:
        """Latest committed version (0 = empty table, no commits)."""
        if not os.path.isdir(self.log_dir):
            return 0
        versions = [
            int(f[1:6])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def _load_manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise ValueError(
                f"version {version} does not exist (have 1..{self.current_version()})"
            )
        with open(p) as fh:
            return json.load(fh)

    def _commit(self, operation: str, files: list[dict], parent: int) -> int:
        """Write the manifest for the next version; the rename is the
        atomic commit point."""
        version = parent + 1
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": files,
        }
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest_path(version))
        return version

    def history(self) -> list[dict]:
        """Commit log, oldest first (version/operation/parent/n_files)."""
        out = []
        for v in range(1, self.current_version() + 1):
            m = self._load_manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "parent": m["parent"],
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                }
            )
        return out

    # -- write path ---------------------------------------------------------

    def _write_new_files(self, df: DataFrame) -> list[dict]:
        """Write df's rows as NEW immutable data files; return their
        manifest entries.  Files are staged then moved under data/ with
        commit-unique names (Spark part-file names already embed a job
        uuid; the stage prefix adds belt-and-braces uniqueness)."""
        stage = os.path.join(self.path, f"_stage-{uuid.uuid4().hex[:8]}")
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(stage)

        entries: list[dict] = []
        os.makedirs(self.data_dir, exist_ok=True)
        for root, _dirs, files in os.walk(stage):
            rel_dir = os.path.relpath(root, stage)
            partition: dict[str, str] = {}
            if rel_dir != ".":
                for piece in rel_dir.split(os.sep):
                    if "=" in piece:
                        k, v = piece.split("=", 1)
                        partition[k] = v
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                dest_dir = (
                    os.path.join(self.data_dir, rel_dir)
                    if rel_dir != "."
                    else self.data_dir
                )
                os.makedirs(dest_dir, exist_ok=True)
                os.rename(os.path.join(root, f), os.path.join(dest_dir, f))
                rel_path = os.path.join(rel_dir, f) if rel_dir != "." else f
                entries.append({"path": rel_path, "partition": partition})
        shutil.rmtree(stage)
        return entries

    def create(self, df: DataFrame) -> int:
        """First commit (or full replacement as a new version)."""
        return self._commit("create", self._write_new_files(df), self.current_version())

    def append(self, df: DataFrame) -> int:
        cur = self.current_version()
        prev = self._load_manifest(cur)["files"] if cur else []
        return self._commit("append", prev + self._write_new_files(df), cur)

    def merge_upsert(self, source: DataFrame, keys: Sequence[str]) -> int:
        """Copy-on-write MERGE: rewrite only the partitions the source
        touches; untouched partitions keep their existing (immutable)
        files in the new manifest — the reason an upsert of one day
        costs one day, not the table, at 100 TB."""
        cur = self.current_version()
        if cur == 0:
            return self.create(source)
        prev = self._load_manifest(cur)["files"]
        if self.partition_by:
            touched_vals = {
                tuple(str(r[k]) for k in self.partition_by)
                for r in source.select(*self.partition_by).distinct().collect()
            }

            def _touched(entry: dict) -> bool:
                return (
                    tuple(entry["partition"].get(k) for k in self.partition_by)
                    in touched_vals
                )

            kept_files = [e for e in prev if not _touched(e)]
            touched_files = [e for e in prev if _touched(e)]
        else:
            kept_files, touched_files = [], prev
        if touched_files:
            target = self._read_files(touched_files)
            kept_rows = target.join(source.select(*keys).distinct(), list(keys), "left_anti")
            merged = kept_rows.unionByName(source.select(*kept_rows.columns))
        else:
            merged = source
        return self._commit("merge_upsert", kept_files + self._write_new_files(merged), cur)

    def delete_where(self, predicate) -> int:
        """Copy-on-write DELETE with SQL semantics (predicate-NULL rows
        are kept); files in untouched partitions carry over untouched."""
        cur = self.current_version()
        if cur == 0:
            return 0
        prev = self._load_manifest(cur)["files"]
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        pred_true = F.coalesce(pred, F.lit(False))
        if self.partition_by:
            touched_vals = {
                tuple(str(r[k]) for k in self.partition_by)
                for r in self._read_files(prev)
                .where(pred_true)
                .select(*self.partition_by)
                .distinct()
                .collect()
            }

            def _touched(entry: dict) -> bool:
                return (
                    tuple(entry["partition"].get(k) for k in self.partition_by)
                    in touched_vals
                )

            kept_files = [e for e in prev if not _touched(e)]
            touched_files = [e for e in prev if _touched(e)]
        else:
            kept_files, touched_files = [], prev
        new_files: list[dict] = []
        if touched_files:
            remainder = self._read_files(touched_files).where(~pred_true)
            new_files = self._write_new_files(remainder)
        return self._commit("delete", kept_files + new_files, cur)

    def rollback(self, version: int) -> int:
        """Re-point the table at an older version's file list (Iceberg
        rollback semantics: a NEW commit, history is never rewritten)."""
        files = self._load_manifest(version)["files"]
        return self._commit(f"rollback_to_v{version}", files, self.current_version())

    # -- read path ----------------------------------------------------------

    def _read_files(self, entries: list[dict]) -> DataFrame:
        if not entries:
            raise ValueError("empty file list (empty table version)")
        paths = [os.path.join(self.data_dir, e["path"]) for e in entries]
        return self.spark.read.option("basePath", self.data_dir).parquet(*paths)

    def read(
        self,
        version: int | None = None,
        partition_filter: dict[str, Sequence[str]] | None = None,
    ) -> DataFrame:
        """Table state at ``version`` (default: latest).

        ``partition_filter`` ({col: allowed values}) prunes the FILE
        LIST from the manifest before Spark plans the scan — the
        manifest-level pruning that replaces directory listing at
        scale."""
        v = self.current_version() if version is None else version
        entries = self._load_manifest(v)["files"]
        if partition_filter:
            allowed = {k: {str(x) for x in vs} for k, vs in partition_filter.items()}
            entries = [
                e
                for e in entries
                if all(e["partition"].get(k) in vs for k, vs in allowed.items())
            ]
        return self._read_files(entries)

    # -- maintenance --------------------------------------------------------

    def expire_versions(self, keep_last: int = 1) -> dict:
        """Snapshot GC: drop manifests older than the newest
        ``keep_last`` versions, then delete data files referenced by no
        surviving manifest (expire_snapshots + remove_orphan_files)."""
        cur = self.current_version()
        cutoff = max(cur - keep_last + 1, 1)
        kept_refs: set[str] = set()
        for v in range(cutoff, cur + 1):
            kept_refs.update(e["path"] for e in self._load_manifest(v)["files"])
        removed_manifests = []
        for v in range(1, cutoff):
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.remove(p)
                removed_manifests.append(v)
        removed_files = []
        for root, _dirs, files in os.walk(self.data_dir):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), self.data_dir)
                if f.endswith(".parquet") and rel not in kept_refs:
                    os.remove(os.path.join(root, f))
                    removed_files.append(rel)
        return {"versions": removed_manifests, "files": removed_files}
