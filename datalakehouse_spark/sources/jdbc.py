"""JDBC federation source (SURVEY.md §2.1 S3/S7/S9).

The reference backfill reads Postgres with the whole WHERE clause
embedded as a subquery in ``dbtable`` so the filter executes DB-side
(reference: config/spark/backfill_telematics.py:103,106-114), driven by
a device-chunk file iterated on the driver (S7).  Same API here, plus
the scale knobs the single-node reference never needed:

- ``partitionColumn/lowerBound/upperBound/numPartitions`` turn one JDBC
  cursor into N parallel range-partitioned cursors — mandatory at any
  real backfill volume.
- ``fetchsize`` bounds per-round-trip memory.

No Postgres driver jar or server ships in this container, but Spark's
own distribution bundles embedded Derby — tests/test_jdbc_live.py runs
this module's full surface LIVE against it (sink write, pushed-down
subquery read, range-partitioned parallel cursors, injection quoting,
cast-on-read).  Postgres swaps in by changing url+driver only.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession


def sql_quote(value: str) -> str:
    """Single-quote doubling (the reference's injection-safe literal
    quoting, backfill_telematics.py:18-20). Prefer parameterized
    ``spark.sql(q, args=...)`` where the plan allows."""
    return "'" + value.replace("'", "''") + "'"


_IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _checked_identifier(name: str, what: str) -> str:
    """Reject table/column names that could break out of the subquery.

    Values are covered by :func:`sql_quote`, but identifiers are
    interpolated bare (or double-quoted) — a caller-supplied name
    containing whitespace, quotes, or punctuation would otherwise
    rewrite the statement.  Plain (optionally schema-qualified)
    identifiers only; anything else raises."""
    if not _IDENTIFIER_RE.match(name):
        raise ValueError(f"unsafe {what} identifier: {name!r}")
    return name


def pushdown_subquery(
    table: str,
    device_ids: Sequence[str],
    ts_start: str,
    ts_end: str,
    report_types: Sequence[str] = ("STATUS", "ALERT"),
    device_col: str = "device_id",
    ts_col: str = "received_epoch",
    type_col: str = "report_type",
    quote_identifiers: bool = False,
) -> str:
    """The reference's backfill predicate as a DB-side subquery
    (backfill_telematics.py:84-86,106-114).

    ``quote_identifiers`` double-quotes the column names for backends
    where the table was created with quoted (case-exact) identifiers —
    Spark's own JDBC writer does this, so the live round-trip tests
    (tests/test_jdbc_live.py, embedded Derby) need it; the reference's
    Postgres schema uses unquoted lowercase, the default."""
    table = _checked_identifier(table, "table")
    for c in (device_col, ts_col, type_col):
        _checked_identifier(c, "column")
    q = (lambda c: '"' + c.replace('"', '""') + '"') if quote_identifiers else (
        lambda c: c
    )
    ids = ", ".join(sql_quote(d) for d in device_ids)
    types = ", ".join(sql_quote(t) for t in report_types)
    return (
        f"(SELECT * FROM {table} WHERE {q(type_col)} IN ({types}) "
        f"AND {q(device_col)} IN ({ids}) "
        f"AND {q(ts_col)} >= {sql_quote(ts_start)} AND {q(ts_col)} < {sql_quote(ts_end)}) AS src"
    )


def jdbc_pushdown_reader(
    spark: SparkSession,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    fetchsize: int = 10_000,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
):
    """Configured DataFrameReader for a pushed-down JDBC scan.

    Unsupported remote types surface as strings via the dialect (the
    Trino connector's ``unsupported-type-handling=CONVERT_TO_VARCHAR``
    analog, S9, is a cast-on-read in the SELECT list).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError("partitioned JDBC read needs lower/upper bounds and numPartitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def backfill_chunks(
    device_lines: Sequence[str], start_line: int, end_line: int
) -> Iterator[list[str]]:
    """The file-driven device-chunk iterator (S7): each line of the
    device file is one comma-separated id list = one backfill unit
    (backfill_telematics.py:66-103). Driver-side orchestration by
    design — each chunk becomes one distributed JDBC read."""
    for line in device_lines[start_line : end_line + 1]:
        ids = [d.strip() for d in line.split(",") if d.strip()]
        if ids:
            yield ids
