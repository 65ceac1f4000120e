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
from pyspark.sql.streaming.stateful_processor import StatefulProcessor


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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): timer-driven inactivity monitor
# ---------------------------------------------------------------------------

#: output schema of device_activity_monitor
_MONITOR_SCHEMA = (
    "user_id long, kind string, n_events long, total_value double"
)


class DeviceInactivityProcessor(StatefulProcessor):
    """Spark-4 ``StatefulProcessor``: per-device running totals PLUS a
    processing-time inactivity TIMER — the operator shape the older
    ``applyInPandasWithState`` can only approximate with coarse group
    timeouts, and the reference's telematics domain needs outright
    (a device that stops reporting must raise an offline alert carrying
    its final session totals; sink_telematics_real_time.sql's
    restart/liveness concern, expressed as data).

    State: one ValueState ``agg`` (count + integer-cents total — the
    same associative quantization as ``running_totals_stateful``, so
    totals are batching-independent) and one ValueState ``t`` holding
    the registered timer so re-activity can delete + re-arm it.

    On input: update totals, re-arm the timer ``timeout_ms`` past the
    batch's processing time, emit an ``update`` row.  On timer expiry:
    emit an ``offline`` row with the final totals and CLEAR state (the
    next report from that device starts a fresh session).

    Requires the RocksDB state store provider (Spark's
    transformWithState backend); callers set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly —
    see ``monitor_confs``.  ENVIRONMENTAL CEILING in this container:
    Spark's transformWithState Python protocol needs ``protobuf``
    (pyspark.sql.streaming.proto imports google.protobuf in the
    driver-side pre-init worker), which is not installed and cannot be
    (no pip) — ``tws_available()`` probes it; the end-to-end test
    skips without it and runs the full timer scenario wherever
    protobuf exists (the Pillow/Iceberg-jar guard pattern).  The
    processor's state machine itself is unit-tested with fakes, no
    Spark worker involved.
    """

    def __init__(self, timeout_ms: int = 1000) -> None:
        self.timeout_ms = timeout_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", "n long, total_cents long")
        self._timer = handle.getValueState("t", "ts long")

    def _quantized_cents(self, values) -> int:
        import decimal

        cent = decimal.Decimal("0.01")
        total = 0
        for v in values:
            q = decimal.Decimal(float(v)).quantize(
                cent, rounding=decimal.ROUND_HALF_UP
            )
            total += int(q * 100)
        return total

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        n, cents = self._agg.get() if self._agg.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            cents += self._quantized_cents(pdf["value"])
        self._agg.update((n, cents))
        # re-arm: delete the previous timer (else each batch leaves one
        # behind and the device goes "offline" on every stale expiry)
        if self._timer.exists():
            (old,) = self._timer.get()
            self._handle.deleteTimer(old)
        expiry = timerValues.getCurrentProcessingTimeInMs() + self.timeout_ms
        self._handle.registerTimer(expiry)
        self._timer.update((expiry,))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "kind": ["update"],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        (user_id,) = key
        n, cents = self._agg.get() if self._agg.exists() else (0, 0)
        # session over: clear everything so a late revival starts fresh
        self._agg.clear()
        self._timer.clear()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "kind": ["offline"],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when Spark's transformWithState Python protocol can run
    here (it needs the protobuf package for its state-server
    messages)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def monitor_confs() -> dict[str, str]:
    """Session confs transformWithState requires (RocksDB state store)."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    }


def device_activity_monitor(events: DataFrame, timeout_ms: int = 1000) -> DataFrame:
    """Timer-driven per-device liveness over a stream of (user_id,
    value): running ``update`` rows while a device reports, an
    ``offline`` row with final session totals when it goes quiet for
    ``timeout_ms`` of processing time."""
    # Spark's StreamingPythonRunner unpickles the processor in a worker
    # that does NOT receive addPyFile artifacts (the same gap the
    # filebus DataSource hit in round 11 — sources/filebus.py
    # register_filebus): ship this module by value so the driver's
    # vanilla-session invocation works from any cwd.
    import sys

    from pyspark import cloudpickle  # the serializer Spark actually uses

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DeviceInactivityProcessor(timeout_ms),
        outputStructType=_MONITOR_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
