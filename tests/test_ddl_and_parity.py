"""DDL emission (M6), timezone-contract parity, property-based hash tests."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from datalakehouse_spark.ddl import create_table_ddl, reference_catalog_ddl
from datalakehouse_spark.functions.hashing import java_hashcode_py
from datalakehouse_spark import schemas as S


def test_reference_catalog_ddl_complete():
    stmts = reference_catalog_ddl()
    # namespace + fact + risk + 3 raw + 3 dlq
    assert len(stmts) == 9
    fact = stmts[1]
    assert "telematics_real_time" in fact
    assert "PARTITIONED BY (device_id_bucket, received_day)" in fact
    assert "'write.sort-order' = 'device_id, gps_epoch'" in fact
    assert "'write.target-file-size-bytes' = '268435456'" in fact
    assert "zstd" in fact
    raw = stmts[3]
    assert "'write.target-file-size-bytes' = '134217728'" in raw
    assert "'write.metadata.metrics.column.device_id' = 'none'" in raw


def test_ddl_parses_as_spark_sql(spark):
    """The emitted DDL must be valid Spark SQL (parser check only —
    no Iceberg catalog in this container to execute against)."""
    ddl = create_table_ddl(
        "t", S.RISK_SCORE_DAILY, using="parquet", partition_by=["report_date"]
    )
    plan = spark.sql(f"EXPLAIN {ddl.replace('USING iceberg', 'USING parquet')}")
    assert plan.first() is not None


def test_timezone_contract_risk_dates(spark):
    """The reference computes local dates/hours in America/Mexico_City
    (create.sql:15). The pipeline must follow the session zone: an
    instant at 03:00 UTC is 21:00 *previous day* local (-06:00) — it
    changes both the report_date and the night-window classification."""
    import datetime as dt

    from datalakehouse_spark.pipelines.risk_score import risk_score_daily

    rows = [(i, dt.datetime(2024, 5, 2, 3, 0, 0), 1, "click", 50.0, "{}") for i in range(12)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Mexico_City")
        r = risk_score_daily(df).collect()[0]
        # 03:00 UTC == 21:00 CST on May 1 -> local date shifts back a day
        assert r.report_date == dt.date(2024, 5, 1)
        # hour 21 is not in the night window [23, 4)
        assert r.night_reports == 0
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        r2 = risk_score_daily(df).collect()[0]
        assert r2.report_date == dt.date(2024, 5, 2)
        assert r2.night_reports == 12  # hour 3 < 4 -> night
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


@given(st.text(alphabet=string.printable, max_size=64))
@settings(max_examples=300, deadline=None)
def test_java_hashcode_property_wraparound(s):
    """Pure-python reference stays in Java int range and matches the
    incremental definition h_{i+1} = 31*h_i + c_i (mod 2^32, signed)."""
    h = java_hashcode_py(s)
    assert -(2**31) <= h < 2**31
    # incremental recomputation agrees
    acc = 0
    for ch in s:
        acc = (31 * acc + ord(ch)) & 0xFFFFFFFF
    expect = acc - 2**32 if acc >= 2**31 else acc
    assert h == expect


def test_java_hashcode_jvm_property_sample(spark):
    """Random unicode sample: JVM expression == python reference."""
    import random

    rng = random.Random(42)
    pool = string.ascii_letters + string.digits + "áéñü€中日 -_./"
    samples = ["".join(rng.choice(pool) for _ in range(rng.randint(0, 40))) for _ in range(300)]
    from datalakehouse_spark.functions.hashing import java_hashcode

    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    for row in df.select("s", java_hashcode("s").alias("h")).collect():
        assert row.h == java_hashcode_py(row.s), repr(row.s)
