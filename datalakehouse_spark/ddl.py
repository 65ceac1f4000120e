"""DDL emission (SURVEY.md §2.10 M6/M7) — StructType -> CREATE TABLE.

The reference declares every table with explicit Flink DDL + Iceberg
properties (create.sql:21-70: ZSTD parquet, 256 MiB targets, bloom
filters, write order, metadata GC).  This module emits the equivalent
Spark SQL DDL so the same catalog contract is one `spark.sql()` away
when an Iceberg/Delta catalog is attached.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import types as T

#: Physical properties of the fact table (create.sql:50-70)
FACT_TBLPROPERTIES: dict[str, str] = {
    "write.format.default": "parquet",
    "write.parquet.compression-codec": "zstd",
    "write.target-file-size-bytes": str(256 * 1024 * 1024),
    "write.distribution-mode": "hash",
    "write.sort-order": "device_id, gps_epoch",
    "write.parquet.bloom-filter-enabled.column.device_id": "true",
    "write.parquet.bloom-filter-enabled.column.gps_epoch": "true",
    "write.parquet.bloom-filter-enabled.column.correlation_id": "true",
    "write.metadata.delete-after-commit.enabled": "true",
    "gc.enabled": "true",
    "read.parquet.vectorization.enabled": "true",
}

#: Raw-table variants (create.sql:154-170): smaller files, metrics off
#: on high-cardinality columns
RAW_TBLPROPERTIES: dict[str, str] = {
    "write.format.default": "parquet",
    "write.parquet.compression-codec": "zstd",
    "write.target-file-size-bytes": str(128 * 1024 * 1024),
    "write.metadata.metrics.column.device_id": "none",
    "write.metadata.metrics.column.correlation_id": "none",
    "write.parquet.bloom-filter-enabled.column.device_id": "true",
    "write.parquet.bloom-filter-enabled.column.correlation_id": "true",
}


def _spark_type_ddl(dt: T.DataType) -> str:
    return dt.simpleString().upper()


def create_table_ddl(
    name: str,
    schema: T.StructType,
    using: str = "iceberg",
    partition_by: Sequence[str] = (),
    tblproperties: Mapping[str, str] | None = None,
) -> str:
    cols = ",\n  ".join(f"{f.name} {_spark_type_ddl(f.dataType)}" for f in schema.fields)
    ddl = f"CREATE TABLE IF NOT EXISTS {name} (\n  {cols}\n) USING {using}"
    if partition_by:
        ddl += "\nPARTITIONED BY (" + ", ".join(partition_by) + ")"
    if tblproperties:
        props = ",\n  ".join(f"'{k}' = '{v}'" for k, v in sorted(tblproperties.items()))
        ddl += f"\nTBLPROPERTIES (\n  {props}\n)"
    return ddl


def reference_catalog_ddl(db: str = "lakehouse") -> list[str]:
    """The reference's full table catalog as Spark DDL statements."""
    from datalakehouse_spark import schemas as S

    out = [f"CREATE NAMESPACE IF NOT EXISTS {db}"]
    out.append(
        create_table_ddl(
            f"{db}.telematics_real_time",
            S.TELEMATICS_REAL_TIME,
            partition_by=["device_id_bucket", "received_day"],
            tblproperties=FACT_TBLPROPERTIES,
        )
    )
    out.append(
        create_table_ddl(
            f"{db}.risk_score_daily",
            S.RISK_SCORE_DAILY,
            partition_by=["report_date"],
            tblproperties={"write.parquet.bloom-filter-enabled.column.device_id": "true"},
        )
    )
    for vendor in S.VENDORS:
        out.append(
            create_table_ddl(
                f"{db}.telematics_{vendor}_raw",
                S.VENDOR_RAW,
                partition_by=["created_day"],
                tblproperties=RAW_TBLPROPERTIES,
            )
        )
        out.append(
            create_table_ddl(
                f"{db}.telematics_{vendor}_raw_dlq",
                S.VENDOR_RAW_DLQ,
                partition_by=["created_day"],
                tblproperties={"write.sort-order": "created_at"},
            )
        )
    return out
