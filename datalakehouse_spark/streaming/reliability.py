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
_STATE_SCHEMA = "n long, total double"


def _update_running(key, pdf_iter, state: GroupState):
    import pandas as pd

    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


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
