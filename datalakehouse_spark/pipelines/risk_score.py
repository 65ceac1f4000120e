"""Flagship pipeline: daily risk score.

Rebuild of the reference's daily batch job — a 6-CTE Flink SQL chain
(reference: config/flink/sink_risk_score_daily.sql:13-77):
``base`` (scan+filter+derive local date/hour) -> ``agg`` (count + two
conditional sums) -> ``ratio`` -> ``transf`` (power-law features) ->
``scored`` (weighted sum) -> ``scored2`` (logistic 0-100) -> final select
(low-evidence NULL + banding).

Spark-first shape: one declarative select chain — Catalyst collapses the
stages into a single scan -> partial agg -> final agg -> project plan
(SURVEY.md §4 X11).  The only shuffle is the groupBy on
(key, day); partial aggregation (map-side combine) happens automatically
in HashAggregateExec, so at 100 TB the shuffle carries one row per
(device, day) per input partition, not one per report.

Fixture mapping (FIXTURES.md §A events): user_id -> device_id,
value -> speed_kmh, ts -> gps_epoch, event_type -> report_type.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalakehouse_spark.functions.scoring import (
    MIN_EVIDENCE,
    NIGHT_END,
    NIGHT_START,
    OVERSPEED_KMH,
    logistic_score,
    risk_level,
    weighted_risk,
)
from datalakehouse_spark.functions.temporal import local_date, local_hour

#: report_type IN-list filter of the streaming job
#: (sink_telematics_real_time.sql:43), mapped onto the events fixture.
DEFAULT_REPORT_TYPES = ("click", "purchase", "view")


def risk_score_daily(
    events: DataFrame,
    *,
    device_col: str = "user_id",
    ts_col: str = "ts",
    speed_col: str = "value",
    type_col: str = "event_type",
    report_types: Sequence[str] = DEFAULT_REPORT_TYPES,
    overspeed_kmh: float = OVERSPEED_KMH,
) -> DataFrame:
    """events -> one row per (device_id, report_date) with score/level.

    Output schema matches the reference's ``risk_score_daily`` table
    (create.sql:124-133): device_id, report_date, score, level,
    total_reports, overspeed_reports, night_reports.
    """
    base = events.where(F.col(type_col).isin(list(report_types))).select(
        F.col(device_col).cast("string").alias("device_id"),
        local_date(ts_col).alias("report_date"),
        local_hour(ts_col).alias("local_hour"),
        F.col(speed_col).alias("speed_kmh"),
    )

    agg = base.groupBy("device_id", "report_date").agg(
        F.count(F.lit(1)).alias("total_reports"),
        # conditional sums (sink_risk_score_daily.sql:29-30); strict `>`
        F.sum(F.when(F.col("speed_kmh") > overspeed_kmh, 1).otherwise(0)).alias(
            "overspeed_reports"
        ),
        F.sum(
            F.when(
                (F.col("local_hour") >= NIGHT_START) | (F.col("local_hour") < NIGHT_END), 1
            ).otherwise(0)
        ).alias("night_reports"),
    )

    rs = F.col("overspeed_reports") / F.col("total_reports")
    rn = F.col("night_reports") / F.col("total_reports")
    score = logistic_score(weighted_risk(rs, rn))

    return agg.select(
        "device_id",
        "report_date",
        # NULL score under the low-evidence band (sink_risk_score_daily.sql:64)
        F.when(F.col("total_reports") < MIN_EVIDENCE, F.lit(None).cast("double"))
        .otherwise(score)
        .alias("score"),
        risk_level(score, F.col("total_reports")).alias("level"),
        "total_reports",
        "overspeed_reports",
        "night_reports",
    )


def device_source_predicate(device_id: str, device_col: str = "user_id"):
    """Transpose a risk-table ``device_id`` equality back onto the
    SOURCE column it derives from.

    ``device_id = CAST(user_id AS STRING)`` is injective, so a serving
    lookup ``device_id = '7'`` matches exactly the source rows with
    ``user_id = 7`` — and a TYPED long equality reaches the parquet
    scan as a pushed filter (row-group min/max pruning), while the
    string form stays a post-scan ``cast(user_id as string) = '7'``
    that forces reading every row group.  At 100 TB this is the
    difference between a point lookup and a full-table scan under the
    aggregate.  Non-canonical strings ('07', 'x', out-of-range) can
    never equal a cast result, so they yield a constant-false
    predicate (empty page), matching the string filter's semantics."""
    try:
        uid = int(device_id)
        canonical = str(uid) == device_id and -(2**63) <= uid < 2**63
    except (TypeError, ValueError):
        canonical = False
    if not canonical:
        return F.lit(False)
    return F.col(device_col) == F.lit(uid)


def risk_score_daily_oracle_sql(
    *,
    report_types: Sequence[str] = DEFAULT_REPORT_TYPES,
    overspeed_kmh: float = OVERSPEED_KMH,
) -> str:
    """DuckDB twin of :func:`risk_score_daily` over the `events` view."""
    in_list = ", ".join(f"'{t}'" for t in report_types)
    return f"""
WITH base AS (
    SELECT CAST(user_id AS VARCHAR) AS device_id,
           CAST(ts AS DATE)         AS report_date,
           EXTRACT(hour FROM ts)    AS local_hour,
           value                    AS speed_kmh
    FROM events
    WHERE event_type IN ({in_list})
), agg AS (
    SELECT device_id, report_date,
           COUNT(*) AS total_reports,
           CAST(SUM(CASE WHEN speed_kmh > {overspeed_kmh} THEN 1 ELSE 0 END) AS BIGINT) AS overspeed_reports,
           CAST(SUM(CASE WHEN local_hour >= {NIGHT_START} OR local_hour < {NIGHT_END} THEN 1 ELSE 0 END) AS BIGINT) AS night_reports
    FROM base GROUP BY device_id, report_date
), scored AS (
    SELECT *,
           LEAST(100.0, GREATEST(0.0, ROUND(
               100.0 / (1.0 + EXP(-12.0 * (
                   0.55 * POW(overspeed_reports * 1.0 / total_reports, 1.7)
                 + 0.30 * POW(night_reports * 1.0 / total_reports, 1.3)
                 + 0.15 * (overspeed_reports * 1.0 / total_reports)
                        * (night_reports * 1.0 / total_reports)
                 - 0.1155))), 0))) AS s
    FROM agg
)
SELECT device_id, report_date,
       CASE WHEN total_reports < {MIN_EVIDENCE} THEN NULL ELSE s END AS score,
       CASE WHEN total_reports < {MIN_EVIDENCE} THEN 'Sin evidencia'
            WHEN s <= 20 THEN 'Seguro'
            WHEN s <= 60 THEN 'Menos seguro'
            ELSE 'Inseguro' END AS level,
       total_reports, overspeed_reports, night_reports
FROM scored
"""
