"""Catalog-native DML — the lakehouse backend ManagedTable prefers.

The reference's DML runs against Iceberg v2 tables in a Nessie catalog:
``UPSERT`` via the PK sink (create.sql:132), retention ``DELETE`` and
``rewrite_data_files`` / ``expire_snapshots`` / ``remove_orphan_files``
maintenance procedures (cleanup.sql:5-38), and ``ANALYZE`` for planner
stats (cleanup.sql:33-38).  When a Spark session has an Iceberg or
Delta catalog configured (``spark.sql.catalog.<name>``), the same
logical operations should be ONE SQL statement the catalog executes
transactionally — not the parquet-backend DataFrame rewrite.

This module builds and dispatches those statements.  The statement
builders are pure functions (unit-testable without any catalog jar —
none ships in this container); the executor is injectable so
``ManagedTable`` can auto-detect a catalog and route DML through it,
falling back to the parquet backend otherwise.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: dialects with distinct maintenance-procedure syntax
ICEBERG = "iceberg"
DELTA = "delta"
GENERIC = "generic"


def detect_catalog_dialect(spark: SparkSession, table: str) -> str | None:
    """Dialect of the catalog owning ``table`` (by its first name part),
    or None when no v2 catalog with that name is configured — the
    auto-detection ManagedTable uses to choose its backend."""
    catalog = table.split(".", 1)[0]
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
    except Exception:
        return None
    if impl is None:
        return None
    low = impl.lower()
    if "iceberg" in low:
        return ICEBERG
    if "delta" in low:
        return DELTA
    return GENERIC


# -- statement builders (pure; asserted verbatim by unit tests) -------------


def merge_upsert_sql(table: str, source_view: str, keys: Sequence[str]) -> str:
    """MERGE INTO: matched rows replaced, unmatched inserted — the
    PK-upsert contract (S6)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def delete_where_sql(table: str, predicate: str) -> str:
    """Row-level DELETE; the catalog handles partition-scoped rewrite
    (Iceberg COW/MOR) internally."""
    return f"DELETE FROM {table} WHERE {predicate}"


def compact_sql(table: str, dialect: str, target_file_size_bytes: int | None = None) -> str:
    """Small-file compaction: Iceberg rewrite_data_files procedure /
    Delta OPTIMIZE (M2; 256 MiB fact-table target per create.sql:54)."""
    if dialect == ICEBERG:
        catalog, rest = table.split(".", 1)
        opts = f"table => '{rest}'"
        if target_file_size_bytes:
            opts += (
                ", options => map('target-file-size-bytes', "
                f"'{target_file_size_bytes}')"
            )
        return f"CALL {catalog}.system.rewrite_data_files({opts})"
    return f"OPTIMIZE {table}"


def vacuum_sql(table: str, dialect: str, retain_hours: int = 168) -> list[str]:
    """Snapshot/orphan GC (M3/M4; cleanup.sql:19-31 keeps 7 days)."""
    if dialect == ICEBERG:
        catalog, rest = table.split(".", 1)
        return [
            f"CALL {catalog}.system.expire_snapshots(table => '{rest}', "
            f"older_than => now() - interval '{retain_hours}' hours)",
            f"CALL {catalog}.system.remove_orphan_files(table => '{rest}')",
        ]
    return [f"VACUUM {table} RETAIN {retain_hours} HOURS"]


def analyze_sql(table: str, columns: Sequence[str] = ()) -> str:
    """ANALYZE so the CBO sees row counts / NDVs (M5; cleanup.sql:33-38)."""
    if columns:
        return (
            f"ANALYZE TABLE {table} COMPUTE STATISTICS "
            f"FOR COLUMNS {', '.join(columns)}"
        )
    return f"ANALYZE TABLE {table} COMPUTE STATISTICS"


# -- dispatcher -------------------------------------------------------------


@dataclass
class CatalogDML:
    """Executes the builders against a session (executor injectable so
    tests assert emitted SQL without a catalog jar)."""

    spark: SparkSession
    table: str
    dialect: str
    run: Callable[[str], object] | None = None

    def _exec(self, sql: str):
        return (self.run or self.spark.sql)(sql)

    def merge_upsert(self, source: DataFrame, keys: Sequence[str]) -> None:
        # per-call unique view name: a table-hash-derived constant would
        # let two concurrent merges on one table (or a hash collision
        # across tables) bind each other's source and race the drop
        view = f"_merge_src_{uuid.uuid4().hex}"
        source.createOrReplaceTempView(view)
        try:
            self._exec(merge_upsert_sql(self.table, view, keys))
        finally:
            self.spark.catalog.dropTempView(view)

    def delete_where(self, predicate: str) -> None:
        self._exec(delete_where_sql(self.table, predicate))

    def compact(self, target_file_size_bytes: int | None = None) -> None:
        self._exec(compact_sql(self.table, self.dialect, target_file_size_bytes))

    def vacuum(self, retain_hours: int = 168) -> None:
        for stmt in vacuum_sql(self.table, self.dialect, retain_hours):
            self._exec(stmt)

    def analyze(self, columns: Sequence[str] = ()) -> None:
        self._exec(analyze_sql(self.table, columns))
