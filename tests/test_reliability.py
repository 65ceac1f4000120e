"""Restart supervision (ST2), stateful streaming (ST7), vacuum (M3/M4),
parameterized SQL (P9), hyperplane-LSH ANN."""

import os

import pytest
from pyspark.sql import functions as F

from datalakehouse_spark.streaming.reliability import run_with_restart


class _FlakyQuery:
    def __init__(self, fail_times):
        self.fail_times = fail_times
        self.starts = 0

    def __call__(self):
        self.starts += 1
        if self.starts <= self.fail_times:
            raise RuntimeError("stream crashed")
        return self

    def awaitTermination(self):
        return None


def test_restart_fixed_delay_recovers():
    slept = []
    q = _FlakyQuery(fail_times=3)
    run_with_restart(q, max_attempts=10, delay_seconds=5.0, sleep=slept.append)
    assert q.starts == 4
    assert slept == [5.0, 5.0, 5.0]


def test_restart_gives_up_after_max_attempts():
    q = _FlakyQuery(fail_times=99)
    with pytest.raises(RuntimeError):
        run_with_restart(q, max_attempts=3, delay_seconds=0.0, sleep=lambda s: None)
    assert q.starts == 3


def test_stateful_running_totals(spark):
    from datalakehouse_spark.streaming.jobs import events_stream
    from datalakehouse_spark.streaming.reliability import running_totals_stateful

    ev = events_stream(spark, "/root/testdata/sf0.001")
    q = (
        running_totals_stateful(ev.select("user_id", "value"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("runtotals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per user == full batch aggregate (the state carries
    # integer cents, so the expected sum is the DECIMAL(18,2)-routed one)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM runtotals"
        ).collect()
    }
    from datalakehouse_spark.functions.numeric import dsum
    from datalakehouse_spark.io import load_table

    want = {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_vacuum_removes_orphan_tmp_dirs(spark, tmp_path):
    from datalakehouse_spark.tables import ManagedTable
    import datetime as dt

    t = ManagedTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, dt.date(2024, 1, 1))], "id long, d date")
    t.create(df)
    orphan = str(tmp_path / "t.tmp_compact")
    os.makedirs(orphan)
    removed = t.vacuum()
    assert removed == [orphan]
    assert not os.path.exists(orphan)
    assert t.read().count() == 1


def test_parameterized_sql(spark, sf_small):
    """P9: named-parameter SQL — injection-safe without manual quoting."""
    from datalakehouse_spark.io import register_views

    register_views(spark, sf_small, "events")
    out = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = :t AND value > :v",
        args={"t": "click", "v": 100.0},
    ).first()
    assert out.n > 0
    # quote-bearing value stays a literal, not SQL
    hostile = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = :t",
        args={"t": "x' OR '1'='1"},
    ).first()
    assert hostile.n == 0


def test_hyperplane_lsh_buckets(spark, sf_small):
    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.operators.similarity import hyperplane_lsh_bucket

    emb = load_table(spark, sf_small, "embeddings")
    b = emb.select("vec_id", hyperplane_lsh_bucket("embedding", n_planes=8).alias("bucket"))
    rows = b.collect()
    assert all(0 <= r.bucket < 256 for r in rows)
    # deterministic across runs
    again = {r.vec_id: r.bucket for r in b.collect()}
    assert {r.vec_id: r.bucket for r in rows} == again
    # buckets actually partition the space (not all one value)
    assert len({r.bucket for r in rows}) > 1
