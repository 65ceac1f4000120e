"""Structured Streaming jobs: ingest with DLQ split, windowed aggs,
session windows (SURVEY.md §2.9)."""

import os

from pyspark.sql import functions as F

from datalakehouse_spark.streaming.jobs import (
    events_stream,
    run_ingest_to_table,
    session_window_stream,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_ingest_stream_end_to_end(spark, tmp_path):
    out = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    dlq = str(tmp_path / "dlq")
    run_ingest_to_table(spark, SF, out, ckpt, dlq_path=dlq)
    fact = spark.read.parquet(out)
    # same rows as the batch transform
    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.pipelines.ingest import normalize_events

    expected = normalize_events(load_table(spark, SF, "events")).count()
    assert fact.count() == expected
    # partitioned by arrival day (ST6)
    assert any(d.startswith("received_day=") for d in os.listdir(out))
    # bucket contract holds in streaming context too
    assert fact.select(F.min("device_id_bucket"), F.max("device_id_bucket")).first() is not None
    # all fixture props parse -> empty DLQ dir (no files or zero rows)
    if os.path.exists(dlq) and any(f.endswith(".parquet") for _r, _d, fs in os.walk(dlq) for f in fs):
        assert spark.read.parquet(dlq).count() == 0


def test_ingest_stream_exactly_once_restart(spark, tmp_path):
    """Re-running with the same checkpoint must not duplicate rows."""
    out = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    run_ingest_to_table(spark, SF, out, ckpt)
    n1 = spark.read.parquet(out).count()
    run_ingest_to_table(spark, SF, out, ckpt)  # no new input files
    assert spark.read.parquet(out).count() == n1


def test_windowed_counts_match_batch(spark):
    ev = events_stream(spark, SF)
    q = (
        windowed_counts_stream(ev)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    from datalakehouse_spark.io import load_table

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
    want = {(r.window_start, r.event_type): (r.n, r.sum_value) for r in batch.collect()}
    assert got == want


def test_session_window_stream_runs(spark):
    ev = events_stream(spark, SF)
    q = (
        session_window_stream(ev)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sesswin")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sesswin").collect()
    assert len(rows) > 0
    assert all(r.n_events > 0 for r in rows)


def test_streaming_risk_upsert_matches_batch(spark, tmp_path):
    """The streaming keyed-upsert sink converges to the batch pipeline's
    table state (Flink PK-upsert parity, SURVEY §4 (c))."""
    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.pipelines.risk_score import risk_score_daily
    from datalakehouse_spark.streaming.jobs import run_streaming_risk_upsert

    def norm(rows):
        return sorted(sorted(r.asDict().items()) for r in rows)

    path, ckpt = str(tmp_path / "risk"), str(tmp_path / "ckpt")
    run_streaming_risk_upsert(spark, SF, path, ckpt)
    got = norm(spark.read.parquet(path).collect())
    want = norm(risk_score_daily(load_table(spark, SF, "events")).collect())
    assert got == want
    # replay with same checkpoint: no input -> state unchanged (idempotent)
    run_streaming_risk_upsert(spark, SF, path, ckpt)
    assert norm(spark.read.parquet(path).collect()) == want
