"""Ingest/ETL normalization — the streaming job's transform, batch-shaped.

Rebuild of the reference's streaming insert
(reference: config/flink/sink_telematics_real_time.sql:17-43): filter the
report-type IN-list, cast wire strings, decode epoch seconds -> instants,
derive the materialized ``device_id_bucket`` (java-hashCode mod 32) and
the arrival-day partition column.  The same transform is reused by the
JDBC backfill (reference: config/spark/backfill_telematics.py:119-143),
which is exactly why it lives here as a pure DataFrame function: one
transform, two execution contexts (batch + streaming), one bucket
contract.

Scale: every expression is a built-in (incl. the JVM-side hashCode), so
the normalize is a single narrow stage — no shuffle, no Python. Writes
partition by (received_day, device_id_bucket), giving day pruning +
32-way intra-day parallelism at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakehouse_spark.functions.hashing import device_bucket
from datalakehouse_spark.functions.temporal import local_date

DEFAULT_REPORT_TYPES = ("STATUS", "ALERT")


def normalize_events(
    events: DataFrame,
    *,
    report_types: Sequence[str] = ("click", "purchase", "view"),
    n_buckets: int = 32,
) -> DataFrame:
    """events fixture -> telematics-fact-shaped rows.

    Mapping (FIXTURES.md §A): event_id -> correlation_id, user_id ->
    device_id, ts -> gps_epoch/received instant, event_type ->
    report_type, value -> speed_kmh, props -> raw payload.
    """
    return events.where(F.col("event_type").isin(list(report_types))).select(
        F.col("event_id").alias("correlation_id"),
        F.col("user_id").cast("string").alias("device_id"),
        F.col("event_type").alias("report_type"),
        F.col("value").alias("speed_kmh"),
        F.col("ts").alias("received_ts"),
        device_bucket(F.col("user_id").cast("string"), n_buckets).alias("device_id_bucket"),
        local_date("ts").alias("received_day"),
    )


def dlq_split(raw: DataFrame, schema, json_col: str = "props") -> tuple[DataFrame, DataFrame]:
    """Parse a raw JSON column against a declared schema and split good
    rows from a dead-letter stream.

    Rebuild of the reference's malformed-record handling: Flink drops
    unparseable JSON (`json.ignore-parse-errors`, create.sql:120) while
    the upstream decoder routes rejects to ``*_raw_dlq`` tables persisted
    verbatim with processing-time stamps
    (sink_telematics_raw_dlq.sql:47-69).  Here `from_json` yields NULL on
    parse failure; the NULL branch becomes the DLQ with
    current_timestamp()/current_date() stamping (ST5).
    """
    # Spark's PERMISSIVE from_json yields an all-null struct (not NULL)
    # for malformed input, so a bare isNull() test misses bad records;
    # route parse failures into an explicit corrupt-record column.
    # copy: StructType.add mutates in place, and callers reuse schemas
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(json_col),
            schema_with_corrupt,
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    bad = F.col("_parsed").isNull() | F.col("_parsed._corrupt").isNotNull()
    good = (
        parsed.where(~bad)
        .select("*", "_parsed.*")
        .drop("_parsed", "_corrupt")
    )
    dlq = (
        parsed.where(bad)
        .drop("_parsed")
        .withColumn("created_at", F.current_timestamp())
        .withColumn("created_day", F.current_date())
    )
    return good, dlq
