"""Cross-implementation equivalence: the union+window as-of join must
agree with pandas merge_asof (the applyInPandas alternative), and
latest_per_key window vs max_by aggregate must agree."""

import pandas as pd
from pyspark.sql import functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.operators.relational import (
    asof_join,
    latest_per_key,
    latest_per_key_maxby,
)

SF = "/root/testdata/sf0.001"


def test_asof_matches_pandas_merge_asof(spark):
    orders = (
        load_table(spark, SF, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts_us"),
        )
    )
    ev = (
        load_table(spark, SF, "events")
        .select(
            F.col("user_id").alias("o_custkey"),
            F.expr("ts_ns div 1000").alias("ts_us"),
            "event_id",
        )
        .groupBy("o_custkey", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
    )
    got = {
        r.o_orderkey: r.event_id
        for r in asof_join(
            orders, ev, key="o_custkey", left_ts="ts_us", right_ts="ts_us",
            right_payload=["event_id"],
        ).collect()
    }

    lp = orders.toPandas().sort_values("ts_us")
    rp = ev.toPandas().sort_values("ts_us")
    merged = pd.merge_asof(
        lp, rp, on="ts_us", by="o_custkey", direction="backward"
    )
    want = {
        int(r.o_orderkey): (None if pd.isna(r.event_id) else int(r.event_id))
        for r in merged.itertuples()
    }
    assert got == want


def test_latest_per_key_window_vs_maxby(spark):
    ev = load_table(spark, SF, "events")
    w = {
        r.user_id: (r.event_id, r.value)
        for r in latest_per_key(ev, ["user_id"], "ts_ns", tiebreak="event_id").collect()
    }
    m = {
        r.user_id: (r.event_id, r.value)
        for r in latest_per_key_maxby(
            ev, ["user_id"], "ts_ns", payload=["event_id", "value"]
        ).collect()
    }
    assert w == m
