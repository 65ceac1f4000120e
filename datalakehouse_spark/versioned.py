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
- Branches are named refs onto the commit DAG (``_log/refs.json``):
  ``create_branch`` points a new name at any version, writes carry a
  ``branch=`` and advance only that ref, ``merge_branch`` fast-forwards
  — the Nessie "experiment on a branch, promote when good" workflow.
- ``incremental_read(from_v, to_v)`` scans only files ADDED between two
  versions (Iceberg incremental append scan): the CDC-style feed a
  downstream consumer uses to process just the delta.

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
import re
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Directory name Spark/Hive writes for a NULL partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_HIVE_HEX = re.compile(r"%([0-9A-Fa-f]{2})")


def _decode_hive_value(v: str) -> str | None:
    """Invert Spark's hive-style partition-path escaping.

    Spark escapes special characters (space, ':', '%', '=', control
    chars, ... — ExternalCatalogUtils.escapePathName) as %XX in
    partition directory names and writes NULL values as
    ``__HIVE_DEFAULT_PARTITION__``.  Manifest entries store the DECODED
    value (None for NULL) so that comparisons against row values are
    exact instead of string-vs-escaped-string."""
    if v == _HIVE_NULL:
        return None
    return _HIVE_HEX.sub(lambda m: chr(int(m.group(1), 16)), v)


def _canon_value(v) -> str | None:
    """Canonical comparison form of a partition value taken from a Row
    (or user filter): None stays None, everything else is its string
    form — the same thing ``_decode_hive_value`` yields for the value's
    partition directory."""
    return None if v is None else str(v)


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

    DEFAULT_BRANCH = "main"

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"v{version:05d}.json")

    def _refs_path(self) -> str:
        return os.path.join(self.log_dir, "refs.json")

    def _latest_version(self) -> int:
        """Highest allocated version number across ALL branches."""
        if not os.path.isdir(self.log_dir):
            return 0
        versions = [
            int(f[1:6])
            for f in os.listdir(self.log_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def refs(self) -> dict[str, int]:
        """branch name -> head version."""
        p = self._refs_path()
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        latest = self._latest_version()
        return {self.DEFAULT_BRANCH: latest} if latest else {}

    def _write_refs(self, refs: dict[str, int]) -> None:
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = self._refs_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(refs, fh)
        os.rename(tmp, self._refs_path())

    def current_version(self, branch: str = DEFAULT_BRANCH) -> int:
        """Head version of ``branch`` (0 = no commits)."""
        return self.refs().get(branch, 0)

    def _load_manifest(self, version: int) -> dict:
        p = self._manifest_path(version)
        if not os.path.exists(p):
            raise ValueError(
                f"version {version} does not exist (have 1..{self.current_version()})"
            )
        with open(p) as fh:
            return json.load(fh)

    def _commit(
        self,
        operation: str,
        files: list[dict],
        parent: int,
        branch: str = DEFAULT_BRANCH,
    ) -> int:
        """Write the manifest for the next version and advance the
        branch ref; the manifest rename is the atomic commit point.
        Version numbers are table-global; ``parent`` pointers form the
        commit DAG the branches live on."""
        version = self._latest_version() + 1
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
        manifest = {
            "version": version,
            "parent": parent,
            "branch": branch,
            "operation": operation,
            "files": files,
        }
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest_path(version))
        refs = self.refs()
        refs[branch] = version
        self._write_refs(refs)
        return version

    def _ancestry(self, version: int) -> list[int]:
        """Parent chain from ``version`` down to the root (or to the
        oldest un-expired manifest), newest first."""
        chain = []
        v = version
        while v and os.path.exists(self._manifest_path(v)):
            chain.append(v)
            v = self._load_manifest(v)["parent"]
        return chain

    def history(self, branch: str = DEFAULT_BRANCH) -> list[dict]:
        """Commit log of ``branch``, oldest first."""
        out = []
        for v in reversed(self._ancestry(self.current_version(branch))):
            m = self._load_manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "parent": m["parent"],
                    "branch": m.get("branch", self.DEFAULT_BRANCH),
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                }
            )
        return out

    # -- branches (the Nessie capability) -----------------------------------

    def create_branch(self, name: str, from_version: int | None = None) -> int:
        """Point a new branch at ``from_version`` (default: main head).
        Zero data is copied — a branch is a ref into the commit DAG."""
        refs = self.refs()
        if name in refs:
            raise ValueError(f"branch {name!r} already exists")
        base = self.current_version() if from_version is None else from_version
        self._load_manifest(base)  # must exist
        refs[name] = base
        self._write_refs(refs)
        return base

    def merge_branch(self, name: str, into: str = DEFAULT_BRANCH) -> int:
        """Fast-forward ``into`` to ``name``'s head (promote the
        experiment).  Requires ``into``'s head to be an ancestor of the
        branch head — diverged branches need a real merge commit, which
        is the catalog's (Nessie's) job, not this analog's."""
        refs = self.refs()
        head, target = refs[name], refs.get(into, 0)
        if target and target not in self._ancestry(head):
            raise ValueError(
                f"{into!r} (v{target}) has diverged from {name!r} (v{head}); "
                "fast-forward merge impossible"
            )
        refs[into] = head
        self._write_refs(refs)
        return head

    # -- write path ---------------------------------------------------------

    def _write_new_files(self, df: DataFrame) -> list[dict]:
        """Write df's rows as NEW immutable data files; return their
        manifest entries.  Files are staged then moved under data/ with
        commit-unique names (Spark part-file names already embed a job
        uuid; the stage prefix adds belt-and-braces uniqueness)."""
        stage = os.path.join(self.path, f"_stage-{uuid.uuid4().hex[:8]}")
        if self.partition_by:
            # a rewrite scoped to the NULL partition reads back its
            # partition column as VOID (all directory values are the
            # NULL sentinel); VOID cannot be a partition column on
            # write — cast to string, which round-trips to the same
            # __HIVE_DEFAULT_PARTITION__ directory
            from pyspark.sql.types import NullType

            for c in self.partition_by:
                if isinstance(df.schema[c].dataType, NullType):
                    df = df.withColumn(c, F.col(c).cast("string"))
        w = df.write.mode("overwrite")
        if self.partition_by:
            # one data file per partition value per commit (small-files
            # discipline + compact manifests); see tables._writer
            df = df.repartition(*self.partition_by)
            w = df.write.mode("overwrite").partitionBy(*self.partition_by)
        w.parquet(stage)

        entries: list[dict] = []
        os.makedirs(self.data_dir, exist_ok=True)
        for root, _dirs, files in os.walk(stage):
            rel_dir = os.path.relpath(root, stage)
            partition: dict[str, str | None] = {}
            if rel_dir != ".":
                for piece in rel_dir.split(os.sep):
                    if "=" in piece:
                        k, v = piece.split("=", 1)
                        partition[k] = _decode_hive_value(v)
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

    def create(self, df: DataFrame, branch: str = DEFAULT_BRANCH) -> int:
        """First commit (or full replacement as a new version)."""
        return self._commit(
            "create", self._write_new_files(df), self.current_version(branch), branch
        )

    def append(self, df: DataFrame, branch: str = DEFAULT_BRANCH) -> int:
        cur = self.current_version(branch)
        prev = self._load_manifest(cur)["files"] if cur else []
        return self._commit(
            "append", prev + self._write_new_files(df), cur, branch
        )

    def merge_upsert(
        self, source: DataFrame, keys: Sequence[str], branch: str = DEFAULT_BRANCH
    ) -> int:
        """Copy-on-write MERGE: rewrite only the partitions the source
        touches; untouched partitions keep their existing (immutable)
        files in the new manifest — the reason an upsert of one day
        costs one day, not the table, at 100 TB."""
        cur = self.current_version(branch)
        if cur == 0:
            return self.create(source, branch)
        prev = self._load_manifest(cur)["files"]
        if self.partition_by:
            touched_vals = {
                tuple(_canon_value(r[k]) for k in self.partition_by)
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
        return self._commit(
            "merge_upsert", kept_files + self._write_new_files(merged), cur, branch
        )

    def delete_where(self, predicate, branch: str = DEFAULT_BRANCH) -> int:
        """Copy-on-write DELETE with SQL semantics (predicate-NULL rows
        are kept); files in untouched partitions carry over untouched."""
        cur = self.current_version(branch)
        if cur == 0:
            return 0
        prev = self._load_manifest(cur)["files"]
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        pred_true = F.coalesce(pred, F.lit(False))
        if self.partition_by:
            touched_vals = {
                tuple(_canon_value(r[k]) for k in self.partition_by)
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
        return self._commit("delete", kept_files + new_files, cur, branch)

    def rollback(self, version: int, branch: str = DEFAULT_BRANCH) -> int:
        """Re-point the table at an older version's file list (Iceberg
        rollback semantics: a NEW commit, history is never rewritten)."""
        files = self._load_manifest(version)["files"]
        return self._commit(
            f"rollback_to_v{version}", files, self.current_version(branch), branch
        )

    # -- read path ----------------------------------------------------------

    def _read_files(
        self, entries: list[dict], merge_schema: bool = False
    ) -> DataFrame:
        if not entries:
            raise ValueError("empty file list (empty table version)")
        paths = [os.path.join(self.data_dir, e["path"]) for e in entries]
        r = self.spark.read.option("basePath", self.data_dir)
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(*paths)

    def read(
        self,
        version: int | None = None,
        partition_filter: dict[str, Sequence[str]] | None = None,
        ref: str = DEFAULT_BRANCH,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Table state at ``version`` (default: head of ``ref``).

        ``partition_filter`` ({col: allowed values}) prunes the FILE
        LIST from the manifest before Spark plans the scan — the
        manifest-level pruning that replaces directory listing at
        scale.  ``merge_schema=True`` reconciles commits written under
        evolved schemas (add-column evolution): files from older
        commits surface NULL for columns added later."""
        v = self.current_version(ref) if version is None else version
        entries = self._load_manifest(v)["files"]
        if partition_filter:
            allowed = {
                k: {_canon_value(x) for x in vs}
                for k, vs in partition_filter.items()
            }
            entries = [
                e
                for e in entries
                if all(e["partition"].get(k) in vs for k, vs in allowed.items())
            ]
        return self._read_files(entries, merge_schema=merge_schema)

    def incremental_read(self, from_version: int, to_version: int) -> DataFrame:
        """Rows in files ADDED between two versions (Iceberg incremental
        append scan): the CDC-style delta feed.  File-level, driver-side
        set difference on the manifests — no data comparison; correct
        whenever the interval contains only append/create commits (an
        upsert's rewritten files surface as their partition's full new
        contents, which is also what Iceberg's changelog emits for COW)."""
        before = {e["path"] for e in self._load_manifest(from_version)["files"]}
        added = [
            e
            for e in self._load_manifest(to_version)["files"]
            if e["path"] not in before
        ]
        return self._read_files(added)

    # -- maintenance --------------------------------------------------------

    def expire_versions(self, keep_last: int = 1) -> dict:
        """Snapshot GC: keep the newest ``keep_last`` commits of every
        branch (walking each branch's parent chain), drop all other
        manifests, then delete data files referenced by no surviving
        manifest (expire_snapshots + remove_orphan_files)."""
        keep_versions: set[int] = set()
        for head in self.refs().values():
            keep_versions.update(self._ancestry(head)[:keep_last])
        kept_refs: set[str] = set()
        for v in keep_versions:
            kept_refs.update(e["path"] for e in self._load_manifest(v)["files"])
        removed_manifests = []
        for v in range(1, self._latest_version() + 1):
            if v in keep_versions:
                continue
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
