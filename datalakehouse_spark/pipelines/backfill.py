"""Backfill orchestration — the reference's JDBC->lakehouse job shape.

Rebuild of config/spark/backfill_telematics.py:66-156: the driver walks
a device-chunk file, issues one pushed-down source read per chunk,
transforms, counts, appends — with **per-chunk error isolation** (an
exception logs and the loop continues, backfill_telematics.py:154-156)
and a driver-side running total (A5).

The source is a callable so tests (and non-JDBC deployments) inject any
chunk -> DataFrame factory; production passes a closure over
sources.jdbc.jdbc_pushdown_reader + pushdown_subquery.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from datalakehouse_spark.tables import ManagedTable

log = logging.getLogger(__name__)


@dataclass
class BackfillReport:
    chunks_ok: int = 0
    chunks_failed: int = 0
    rows_appended: int = 0
    failed_chunks: list[int] = field(default_factory=list)


def run_backfill(
    chunks: Iterable[Sequence[str]],
    read_chunk: Callable[[Sequence[str]], DataFrame],
    transform: Callable[[DataFrame], DataFrame],
    table: ManagedTable,
    skip_empty: bool = True,
) -> BackfillReport:
    """Chunked backfill with the reference's resilience semantics:
    count -> conditional append -> on error log and continue."""
    report = BackfillReport()
    for i, chunk in enumerate(chunks):
        try:
            df = transform(read_chunk(chunk))
            n = df.count()
            if n or not skip_empty:
                table.append(df)
            report.rows_appended += n
            report.chunks_ok += 1
            log.info("Append OK chunk=%d rows=%d", i, n)
        except Exception:
            report.chunks_failed += 1
            report.failed_chunks.append(i)
            log.exception("chunk %d failed; continuing", i)
    return report
