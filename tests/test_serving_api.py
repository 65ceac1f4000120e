"""Serving compile layer + JDBC source construction (SURVEY.md §2.12, S3)."""

import datetime as dt

import pytest

from datalakehouse_spark.io import load_table
from datalakehouse_spark.pipelines.api import (
    BadRequest,
    compile_page_request,
    format_response_ts,
    parse_iso_instant,
    validate_columns,
    validate_page,
)
from datalakehouse_spark.sources.jdbc import (
    backfill_chunks,
    jdbc_pushdown_reader,
    pushdown_subquery,
    sql_quote,
)


def test_iso_parsing_variants():
    assert parse_iso_instant("2024-01-05").hour == 0  # date-only -> midnight
    assert parse_iso_instant("2024-01-05T10:30:00Z").hour == 10
    assert parse_iso_instant("2024-01-05T10:30:00-06:00").hour == 16  # -> UTC
    with pytest.raises(BadRequest):
        parse_iso_instant("not-a-date")
    with pytest.raises(BadRequest):
        parse_iso_instant("")


def test_page_clamps():
    assert validate_page(100, 0) == (100, 0)
    with pytest.raises(BadRequest):
        validate_page(0, 0)
    with pytest.raises(BadRequest):
        validate_page(10001, 0)
    with pytest.raises(BadRequest):
        validate_page(10, -1)
    with pytest.raises(BadRequest):
        validate_page("abc", 0)


def test_column_whitelist():
    assert validate_columns(None, ["a", "b"]) == ["a", "b"]
    assert validate_columns(["b"], ["a", "b"]) == ["b"]
    with pytest.raises(BadRequest):
        validate_columns(["nope"], ["a", "b"])


def test_compile_page_request_end_to_end(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    rows = compile_page_request(
        ev,
        device_id=7,
        start="2024-01-05",
        end="2024-01-20T00:00:00Z",
        columns=["event_id", "user_id", "value"],
        limit=5,
        offset=0,
    ).collect()
    assert 0 < len(rows) <= 5
    assert set(rows[0].asDict()) == {"event_id", "user_id", "value"}
    assert all(r.user_id == 7 for r in rows)


def test_response_ts_formatting(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 5, 18, 30, 0, 123000),)], "ts timestamp")
    out = df.select(format_response_ts("ts").alias("s")).first().s
    # 18:30 UTC == 12:30 Mexico City (-0600)
    assert out == "2024-01-05 12:30:00.123 -0600"


def test_sql_quote_doubling():
    assert sql_quote("o'brien") == "'o''brien'"


def test_pushdown_subquery_shape():
    q = pushdown_subquery("public.t", ["d1", "d2"], "2025-01-01", "2025-02-01")
    assert q.startswith("(SELECT * FROM public.t WHERE")
    assert "report_type IN ('STATUS', 'ALERT')" in q
    assert "device_id IN ('d1', 'd2')" in q
    assert q.endswith(") AS src")


def test_jdbc_reader_options(spark):
    r = jdbc_pushdown_reader(
        spark,
        url="jdbc:postgresql://host/db",
        dbtable="(SELECT 1) AS src",
        user="u",
        password="p",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
    )
    opts = r._jreader.toString()  # reader configured without connecting
    assert r is not None
    with pytest.raises(ValueError):
        jdbc_pushdown_reader(spark, "u", "t", "u", "p", partition_column="id")


def test_backfill_chunks():
    lines = ["a,b,c", "", "d", " e , f "]
    chunks = list(backfill_chunks(lines, 0, 3))
    assert chunks == [["a", "b", "c"], ["d"], ["e", "f"]]


# -- keyset (seek) pagination -------------------------------------------------


def test_seek_page_equals_offset_page(spark, sf_small):
    """The keyset contract: seeking from page N's last row reproduces
    page N+1 of the OFFSET path exactly (same sort, same universe)."""
    from datalakehouse_spark.pipelines.api import compile_seek_request

    ev = load_table(spark, sf_small, "events")
    kw = dict(device_id=7, start="2024-01-05", end="2024-01-20T00:00:00Z", limit=10)
    page1 = compile_page_request(ev, offset=0, **kw).collect()
    page2_offset = compile_page_request(ev, offset=10, **kw).collect()
    last = page1[-1]
    page2_seek = compile_seek_request(
        ev,
        after_ts=last["ts"].isoformat(),
        after_id=last["event_id"],
        **kw,
    ).collect()
    assert [r["event_id"] for r in page2_seek] == [
        r["event_id"] for r in page2_offset
    ]


def test_seek_multi_device_crosses_device_boundary(spark, sf_small):
    """Without a pinned device, the cursor's device branch must advance
    ACROSS devices in (device ASC, ts DESC, id ASC) order — i.e. the
    seek reproduces the offset page over the multi-device universe."""
    from datalakehouse_spark.pipelines.api import compile_seek_request

    ev = load_table(spark, sf_small, "events").where("user_id IN (3, 4)")
    kw = dict(start="2024-01-05", end="2024-01-07T00:00:00Z", limit=500)
    page1 = compile_page_request(ev, offset=0, **kw).collect()
    # pick a cursor row near a device boundary: last row of device 3
    idx = max(i for i, r in enumerate(page1) if r["user_id"] == 3)
    cursor = page1[idx]
    seek = compile_seek_request(
        ev,
        after_device=cursor["user_id"],
        after_ts=cursor["ts"].isoformat(),
        after_id=cursor["event_id"],
        limit=5,
        start=kw["start"],
        end=kw["end"],
    ).collect()
    assert [r["event_id"] for r in seek] == [
        r["event_id"] for r in page1[idx + 1 : idx + 6]
    ]
    assert seek[0]["user_id"] == 4  # really crossed the device boundary


def test_seek_validation():
    from datalakehouse_spark.pipelines.api import compile_seek_request

    with pytest.raises(BadRequest):
        compile_seek_request(None, device_id=7, after_ts="2024-01-05")  # no after_id
    with pytest.raises(BadRequest):
        compile_seek_request(None, after_ts="2024-01-05", after_id=1)  # no device anchor
    with pytest.raises(BadRequest):
        compile_seek_request(
            None, device_id=7, after_ts="2024-01-05", after_id="xyz"
        )
