"""Write-time observe() metrics: counts must come from the write job
itself (no second scan) and match an independent recount."""

import pyspark.sql.functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.pipelines.observability import observe_checks, observed_write
from datalakehouse_spark.scratch import fresh_scratch
from datalakehouse_spark.tables import ManagedTable

SF = "/root/testdata/sf0.001"


def test_observed_write_reports_exact_counts(spark, sf_small):
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = ManagedTable(spark, fresh_scratch("obs_write") + "/t")
    metrics = observed_write(
        t,
        ev,
        checks={
            "null_value": F.col("value").isNull(),
            "high_value": F.col("value") > 90,
            "purchases": F.col("event_type") == "purchase",
        },
    )
    n = ev.count()
    assert metrics["n_rows"] == n
    assert metrics["null_value"] == 0
    assert metrics["high_value"] == ev.where(F.col("value") > 90).count()
    assert metrics["purchases"] == ev.where(F.col("event_type") == "purchase").count()
    # and the write actually landed every row
    assert t.read().count() == n


def test_observe_checks_all_null_condition_counts_zero(spark, sf_small):
    ev = load_table(spark, SF, "events").limit(10)
    observed, obs = observe_checks(
        ev, {"never": F.lit(None).cast("boolean")}
    )
    observed.write.format("noop").mode("overwrite").save()
    got = dict(obs.get)
    assert got["never"] == 0
    assert got["n_rows"] == 10


def test_metered_streaming_sink_accounts_every_batch(spark, sf_small, tmp_path):
    """Per-micro-batch observe metrics must sum to the batch-recounted
    totals across a multi-batch drain."""
    from datalakehouse_spark.pipelines.observability import metered_sink
    from datalakehouse_spark.streaming.jobs import events_stream

    out = str(tmp_path / "out")
    stream = events_stream(spark, SF)  # maxFilesPerTrigger=1 built in

    def write_batch(batch, epoch_id):
        batch.write.mode("append").parquet(out)

    sink, ledger = metered_sink(
        write_batch,
        checks={"purchases": F.col("event_type") == "purchase"},
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert ledger, "at least one micro-batch must have drained"
    ev = load_table(spark, SF, "events")
    assert sum(m["n_rows"] for m in ledger) == ev.count()
    assert sum(m["purchases"] for m in ledger) == ev.where(
        F.col("event_type") == "purchase"
    ).count()
    # and the metrics came from the same jobs that wrote the rows
    assert spark.read.parquet(out).count() == ev.count()
