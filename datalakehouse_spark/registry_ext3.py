"""Registry part 4: table-lifecycle entries — schema evolution and
partition-scoped compaction exercised end-to-end through the driver's
oracle gate.

Both entries build a throwaway ManagedTable from the events fixture,
run the lifecycle operation, and return an AGGREGATE of the table's
contents, so the oracle (plain SQL over the same fixture) verifies that
the operation preserved/evolved the data exactly.  The file-level
assertions (untouched partitions byte-identical, file counts reduced,
NULL back-fill) live in tests/test_tables.py; the driver rows verify
the data side cross-engine.

Determinism contract: same as registry.py part 1 (dsum for double
sums, stable column aliases both sides).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakehouse_spark.functions.numeric import dsum, dsum_duckdb
from datalakehouse_spark.io import load_table
from datalakehouse_spark.registry import register
from datalakehouse_spark.tables import ManagedTable

# ---------------------------------------------------------------------------
# Schema evolution: write v1 schema, append evolved schema, merged read
# ---------------------------------------------------------------------------

_SCHEMA_EVO_SQL = f"""
WITH v1 AS (
    SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
           CAST(NULL AS DOUBLE) AS quality
    FROM events WHERE event_id % 2 = 0
),
v2 AS (
    SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
           CAST(value AS DOUBLE) / 2 AS quality
    FROM events WHERE event_id % 2 = 1
),
unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(quality) AS n_quality,
       {dsum_duckdb("value")} AS sum_value,
       {dsum_duckdb("quality")} AS sum_quality
FROM unioned GROUP BY event_type
"""


@register(
    "schema_evolution_read",
    _SCHEMA_EVO_SQL,
    "add-column schema evolution: v1 files + evolved appends, mergeSchema read",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-v2-style add-column evolution on the parquet backend
    (reference README.md:13 'Schema evolution'): create the table under
    the v1 schema, append rows carrying a NEW ``quality`` column, then
    read with schema merging — v1 files surface NULL for the added
    column, appended files carry values, and the aggregate must equal
    the oracle's explicit two-version union.  The split is
    deterministic (event_id parity), so reruns rebuild the same table.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double")
    )
    path = tempfile.mkdtemp(prefix="schema_evo_") + "/t"
    t = ManagedTable(spark, path, partition_by=["event_type"])
    t.create(ev.where(F.col("event_id") % 2 == 0))
    t.append(
        ev.where(F.col("event_id") % 2 == 1).withColumn(
            "quality", F.col("value") / 2
        )
    )
    return (
        t.read(merge_schema=True)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("quality").alias("n_quality"),
            dsum("value").alias("sum_value"),
            dsum("quality").alias("sum_quality"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-scoped compaction: append small files, sweep, data unchanged
# ---------------------------------------------------------------------------

_COMPACT_SQL = f"""
SELECT event_type,
       COUNT(*) * (CASE WHEN event_type = 'click' THEN 2 ELSE 1 END) AS n,
       {dsum_duckdb("value")}
           * (CASE WHEN event_type = 'click' THEN 2 ELSE 1 END) AS sum_value
FROM events GROUP BY event_type
"""


@register(
    "compaction_partition_sweep",
    _COMPACT_SQL,
    "partition-scoped small-file compaction preserves data exactly",
)
def q_compaction_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-day compaction sweep (cleanup.sql:12-17)
    as a driver-checked roundtrip: build an event_type-partitioned
    table, append the 'click' slice AGAIN (that partition now has 2
    files and duplicate rows by construction), run the threshold sweep
    — only the breaching partition is rewritten (file-level assertions
    in tests/test_tables.py) — and aggregate the table, which must
    show every partition's rows intact, clicks doubled."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double")
    )
    path = tempfile.mkdtemp(prefix="compact_sweep_") + "/t"
    t = ManagedTable(spark, path, partition_by=["event_type"])
    t.create(ev)
    t.append(ev.where(F.col("event_type") == "click"))
    report = t.compact(min_files=2)
    assert [p["event_type"] for p in report["compacted"]] == ["click"]
    return (
        t.read()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )
