"""Golden tests for the expression layer — especially the java-hashCode
bucket contract (SURVEY.md §2.11) and the risk-score formula pieces."""

import math

import pytest
from pyspark.sql import functions as F

from datalakehouse_spark.functions.hashing import (
    device_bucket,
    java_hashcode,
    java_hashcode_pandas,
    java_hashcode_py,
)
from datalakehouse_spark.functions.geo import parse_coordinates
from datalakehouse_spark.functions.temporal import epoch_string_to_ts

# Golden vectors computed by the JVM itself (java.lang.String#hashCode,
# OpenJDK 17) — includes a surrogate-pair case and the MIN_VALUE string.
JAVA_HASH_GOLDEN = {
    "": 0,
    "a": 97,
    "12345": 46792755,
    "device-00042": -2080797065,
    "hello world": 1794106052,
    "ñandú": 225567348,
    "polygenelubricants": -2147483648,
    "😀x": 54959989,
}


def test_java_hashcode_python_golden():
    for s, h in JAVA_HASH_GOLDEN.items():
        assert java_hashcode_py(s) == h, s


def test_java_hashcode_jvm_matches_python(spark):
    strs = list(JAVA_HASH_GOLDEN) + [str(i) for i in range(100)]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    rows = df.select("s", java_hashcode("s").alias("h")).collect()
    for r in rows:
        assert r.h == java_hashcode_py(r.s), r.s


def test_java_hashcode_pandas_udf(spark):
    strs = list(JAVA_HASH_GOLDEN)
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    rows = df.select("s", java_hashcode_pandas("s").alias("h")).collect()
    for r in rows:
        assert r.h == java_hashcode_py(r.s), r.s


def test_device_bucket_min_value_edge(spark):
    # abs(Integer.MIN_VALUE) must behave like unbounded-int Python abs
    # (reference backfill semantics): 2147483648 % 32 == 0
    df = spark.createDataFrame([("polygenelubricants",)], ["s"])
    assert df.select(device_bucket("s").alias("b")).collect()[0].b == 0


def test_bucket_range(spark):
    df = spark.createDataFrame([(str(i),) for i in range(1000)], ["s"])
    rows = df.select(device_bucket("s").alias("b")).collect()
    assert all(0 <= r.b < 32 for r in rows)


def test_epoch_string_decode(spark):
    # "1758000000" seconds -> 2025-09-16T05:20:00 UTC (F2)
    df = spark.createDataFrame([("1758000000",)], ["e"])
    ts = df.select(epoch_string_to_ts("e").alias("ts")).collect()[0].ts
    assert ts.isoformat().startswith("2025-09-16T05:20:00")


def test_parse_coordinates_swap(spark):
    df = spark.createDataFrame([("(-99.1,19.4)",)], ["coordinates"])
    lat, lon = parse_coordinates("coordinates")
    row = df.select(lat.alias("lat"), lon.alias("lon")).collect()[0]
    assert row.lat == pytest.approx(19.4)
    assert row.lon == pytest.approx(-99.1)


def test_risk_formula_reference_case(spark):
    """End-to-end formula check against an independently computed value."""
    from datalakehouse_spark.pipelines.risk_score import risk_score_daily
    import datetime as dt

    # 20 reports, 10 overspeed (>110), 5 night (hour 23)
    rows = []
    for i in range(20):
        hour = 23 if i < 5 else 12
        speed = 150.0 if i < 10 else 50.0
        rows.append((i, dt.datetime(2024, 5, 1, hour, 0, 0), 1, "click", speed, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = risk_score_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    rs, rn = 0.5, 0.25
    x = 0.55 * rs**1.7 + 0.30 * rn**1.3 + 0.15 * rs * rn
    expected = min(100.0, max(0.0, round(100.0 / (1.0 + math.exp(-12.0 * (x - 0.1155))))))
    assert r.total_reports == 20
    assert r.overspeed_reports == 10
    assert r.night_reports == 5
    assert r.score == expected
    assert r.level == "Inseguro" if expected > 60 else True


def test_risk_low_evidence_band(spark):
    import datetime as dt

    rows = [(i, dt.datetime(2024, 5, 1, 12, 0, 0), 1, "click", 50.0, "{}") for i in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = __import__("datalakehouse_spark.pipelines.risk_score", fromlist=["risk_score_daily"]).risk_score_daily(df).collect()[0]
    assert r.score is None
    assert r.level == "Sin evidencia"
