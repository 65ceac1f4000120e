"""Write-time pipeline metrics via ``DataFrame.observe`` — data-quality
accounting that rides the write action itself (zero extra passes).

A 100 TB ingest cannot afford a second scan just to count what it
wrote; ``observe`` attaches named aggregate expressions to the plan
and the metrics materialize as a side effect of the one write action.
This is the batch analog of the reference's streaming DLQ counters
(malformed-row accounting, SURVEY.md §2.9 ST4): every pipeline write
can report rows/nulls/range violations from the SAME job that wrote
them.

Usage::

    from datalakehouse_spark.pipelines.observability import observed_write

    metrics = observed_write(
        table, df,
        checks={"null_values": F.col("value").isNull(),
                "negative_value": F.col("value") < 0},
    )
    # -> {"n_rows": 12345, "null_values": 0, "negative_value": 17}
"""

from __future__ import annotations

import itertools
from typing import Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

_counter = itertools.count()


def observe_checks(
    df: DataFrame, checks: Mapping[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting total rows plus one violation
    count per named boolean check.  Metrics become available on the
    observation AFTER the first action on the returned DataFrame."""
    obs = Observation(f"write_metrics_{next(_counter)}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in (checks or {}).items():
        # explicit otherwise(0): an all-NULL condition must count 0,
        # not propagate NULL through the sum
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(name))
    return df.observe(obs, *aggs), obs


def observed_write(
    table, df: DataFrame, checks: Mapping[str, Column] | None = None
) -> dict:
    """Append ``df`` to a ManagedTable and return the write metrics,
    all from the single write job."""
    observed, obs = observe_checks(df, checks)
    table.append(observed)
    return dict(obs.get)


def metered_sink(
    write_batch, checks: Mapping[str, Column] | None = None
) -> tuple:
    """Wrap a ``foreachBatch`` writer with per-micro-batch observe
    metrics — the streaming twin of :func:`observed_write` and the
    batch-side analog of the reference's DLQ counters (ST4/ST5).

    Returns ``(sink_fn, ledger)``: pass ``sink_fn`` to
    ``writeStream.foreachBatch``; after the query drains, ``ledger``
    holds one ``{"epoch_id": ..., "n_rows": ..., <check>: ...}`` dict
    per micro-batch, measured by the batch's own write job (observe on
    a foreachBatch DataFrame is plain batch observe — no second scan,
    no listener wiring)."""
    ledger: list[dict] = []

    def sink(batch: DataFrame, epoch_id: int) -> None:
        observed, obs = observe_checks(batch, checks)
        write_batch(observed, epoch_id)
        ledger.append({"epoch_id": epoch_id, **obs.get})

    return sink, ledger
