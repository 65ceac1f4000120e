"""Malformed-record handling (ST4): from_json split with genuinely bad
payloads — the path the fixture's all-valid props never exercises."""

import os

from pyspark.sql import functions as F

from datalakehouse_spark.pipelines.ingest import dlq_split
from datalakehouse_spark.streaming.jobs import PROPS_SCHEMA, run_ingest_to_table


def _mixed_df(spark):
    rows = [
        (1, '{"k": 10}'),       # valid
        (2, "{not json at all"),  # malformed -> DLQ
        (3, '{"k": "str"}'),    # field violates declared type -> DLQ
        (4, ""),                # empty -> DLQ
        (5, None),              # null payload -> DLQ
        (6, '{"other": 1}'),    # declared field absent -> null field, row OK
    ]
    return spark.createDataFrame(rows, "event_id long, props string")


def test_dlq_split_semantics(spark):
    """Contract: a payload must FULLY conform to the declared schema —
    absent fields become nulls (schema evolution friendly), but
    syntactic garbage and type violations go to the DLQ verbatim."""
    good, dlq = dlq_split(_mixed_df(spark), PROPS_SCHEMA, json_col="props")
    good_ids = sorted(r.event_id for r in good.collect())
    dlq_rows = dlq.collect()
    assert good_ids == [1, 6]
    assert sorted(r.event_id for r in dlq_rows) == [2, 3, 4, 5]
    # DLQ keeps the raw payload verbatim + processing-time stamps (ST5)
    r = {row.event_id: row for row in dlq_rows}
    assert r[2].props == "{not json at all"
    assert r[2].created_at is not None and r[2].created_day is not None
    # parsed field surfaces on good rows
    k = {row.event_id: row.k for row in good.collect()}
    assert k[1] == 10 and k[6] is None


def test_streaming_ingest_routes_bad_rows_to_dlq(spark, tmp_path):
    """End-to-end: corrupt a copy of the events fixture and stream it."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    from datalakehouse_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # 990 valid + 10 corrupted payloads, written as raw-ns longs again
    corrupted = ev.select(
        "event_id",
        F.col("ts_ns").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.when(F.col("event_id") % 100 == 0, F.lit("corrupt{")).otherwise(
            F.col("props")
        ).alias("props"),
    )
    corrupted.coalesce(1).write.mode("overwrite").parquet(src + "/events.parquet")

    out, ckpt, dlq = (str(tmp_path / d) for d in ("out", "ckpt", "dlq"))
    run_ingest_to_table(spark, src + "/events.parquet", out, ckpt, dlq_path=dlq)
    n_bad = spark.read.parquet(dlq).count()
    assert n_bad == ev.where(F.col("event_id") % 100 == 0).count()
    n_good_expected = (
        ev.where(~(F.col("event_id") % 100 == 0))
        .where(F.col("event_type").isin("click", "purchase", "view"))
        .count()
    )
    assert spark.read.parquet(out).count() == n_good_expected
