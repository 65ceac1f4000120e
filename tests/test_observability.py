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
