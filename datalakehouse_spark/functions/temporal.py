"""Temporal expression layer (SURVEY.md §2.8 F2/F3/F6/F13/F14).

The reference's wire format carries epochs as STRING seconds which Flink
turns into instants via ``TO_TIMESTAMP_LTZ(CAST(x AS BIGINT) * 1000, 3)``
(reference: config/flink/sink_telematics_real_time.sql:29,37-38), then
derives *local* dates and hours under the session zone
(create.sql:15; sink_risk_score_daily.sql:16-18).

All of these are built-in Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds_to_ts(col: Column | str) -> Column:
    """Epoch seconds (any numeric) -> TimestampType instant."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c.cast("bigint"))


def epoch_string_to_ts(col: Column | str) -> Column:
    """The reference wire decode: STRING epoch-seconds -> ×1000 ms ->
    TIMESTAMP_LTZ (sink_telematics_real_time.sql:29)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("bigint") * 1000)


def local_date(ts: Column | str) -> Column:
    """CAST(ts AS DATE) in the session timezone (F3)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.to_date(c)


def local_hour(ts: Column | str) -> Column:
    """EXTRACT(HOUR FROM ts) in the session timezone (F6)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.hour(c)
