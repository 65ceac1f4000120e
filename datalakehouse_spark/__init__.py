"""datalakehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
``amtelser/datalakehouse`` reference (an IoT GPS-telematics lakehouse:
Flink SQL streaming ingest, Spark JDBC backfill, Trino serving, Iceberg
storage), re-expressed as one idiomatic Spark system:

- DataFrame/SQL declarative plans everywhere (Catalyst picks physical
  strategy; whole-stage codegen stays wide because the hot path uses only
  built-in expressions).
- A composable operator library: every operator in SURVEY.md §2 is a pure
  ``DataFrame -> DataFrame`` function.
- Structured Streaming for the ingest path (from_json + DLQ split,
  processing-time stamping, checkpointed exactly-once sinks).
- A parquet-backed managed-table layer standing in for Iceberg/Delta
  (append / MERGE-upsert / retention DELETE / compaction), switching to the
  real `writeTo(...)`/`MERGE INTO` APIs when catalog jars are present.
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash),
  similarity search over embeddings, text analysis — designed for 100 TB.

Blueprint: /root/repo/SURVEY.md (file:line citations into /root/reference).
"""

__version__ = "0.1.0"

from datalakehouse_spark.session import get_spark  # noqa: F401
from datalakehouse_spark.io import load_table, load_tables  # noqa: F401
