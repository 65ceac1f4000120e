"""SparkSession bootstrap.

The reference pins every engine to ``America/Mexico_City``
(reference: config/flink/create.sql:15, docker-compose.yml:183,232,267,281,
services/telematics_api/main.py:89) — local dates/hours are computed in
that zone at every layer.  The session factory makes the zone an explicit
parameter; correctness-gate queries run in UTC so the DuckDB oracle (which
is timezone-naive) sees identical dates, and reference-parity tests pin
Mexico City.

Scale posture (100 TB / 1000 executors):
- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
- shuffle partitions sized to cores locally; on a real cluster AQE
  coalesces from a high initial number, so we set the initial high and let
  AQE shrink rather than hand-tuning.
- Arrow enabled for the few pandas_udf paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Session timezone of the reference deployment (create.sql:15).
REFERENCE_TZ = "America/Mexico_City"

#: Timezone used for oracle-comparable queries (DuckDB is TZ-naive).
ORACLE_TZ = "UTC"


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "datalakehouse_spark",
    tz: str = ORACLE_TZ,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with the engine's config contract."""
    cores = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan — coalesce small shuffle partitions, split
        # skewed ones, switch sort-merge->broadcast when stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read the physical int64 as long and decode explicitly
        # (datalakehouse_spark.io normalizes it).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
