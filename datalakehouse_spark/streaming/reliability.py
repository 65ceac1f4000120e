"""Streaming reliability: restart strategy + stateful operators.

ST2: the reference pins a fixed-delay restart strategy (10 attempts,
5 s) on every Flink job (sink_telematics_real_time.sql:5-7).  Spark's
equivalent is a driver-side supervision loop around query.start() —
checkpointed state makes the restart exactly-once.

ST7 (stateful): a custom per-key running aggregate via
``applyInPandasWithState`` — the Structured Streaming escape hatch for
operators the built-in windows can't express.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def run_with_restart(
    start_query: Callable[[], "object"],
    max_attempts: int = 10,
    delay_seconds: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Fixed-delay restart supervision (ST2).

    ``start_query`` must start a fresh StreamingQuery (same checkpoint
    location!) and is awaited to termination; exceptions trigger a
    restart after ``delay_seconds`` up to ``max_attempts`` total tries.
    """
    attempt = 0
    while True:
        attempt += 1
        try:
            q = start_query()
            q.awaitTermination()
            return
        except Exception:
            if attempt >= max_attempts:
                raise
            sleep(delay_seconds)


#: output schema of running_totals_stateful
_RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total_cents long"


def _update_running(key, pdf_iter, state: GroupState):
    """Per-key running (count, sum) with the sum carried as integer
    cents: float accumulation would depend on micro-batch boundaries and
    row order, making reruns non-reproducible (and the result
    un-oracle-able).  Integer addition is associative, so the final
    state is identical under ANY batching — the same DECIMAL-routing
    rule the batch engine uses (functions/numeric.dsum).

    Each double is quantized exactly like a Spark/DuckDB
    ``CAST(double AS DECIMAL(_, 2))``: HALF_UP on the exact decimal
    expansion of the double (stdlib only — runs on executors without the
    package zip)."""
    import decimal

    import pandas as pd

    cent = decimal.Decimal("0.01")
    (user_id,) = key
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        for v in pdf["value"]:
            q = decimal.Decimal(float(v)).quantize(cent, rounding=decimal.ROUND_HALF_UP)
            total_cents += int(q * 100)
    state.update((n, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            # one deterministic rounding at the end, same as dsum
            "total_value": [total_cents / 100.0],
        }
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) carried
    across micro-batches in managed state (ST7 stateful surface)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
