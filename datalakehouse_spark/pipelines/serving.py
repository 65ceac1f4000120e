"""Serving-layer queries — the REST API as a parameterized plan factory.

The reference API compiles each request into predicate + projection +
sort + OFFSET/FETCH pagination plus a separate COUNT query over Trino
(reference: services/telematics_api/main.py:241-308,311-374).  Rebuild:
pure functions `(df, params) -> DataFrame` with the identical plan shape
— filter -> select -> orderBy -> offset -> limit (Spark 3.4+ has a native
``offset``).

Pagination determinism: the reference sorts on (device_id, gps_epoch
DESC), a non-unique key (SURVEY.md §7 risk list); we append the
correlation-id as a deterministic tiebreaker so page windows are stable
under reruns — required both by the oracle hash-compare and by any real
paginated API.

Scale: the equality + range predicates land on the partition/sort
columns (device bucket + day), so at 100 TB the scan prunes to one
device-bucket × few days; TakeOrderedAndProject handles the top-k
without a global sort.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: API page clamp (main.py:171-174,247): limit 1..10000, offset >= 0.
MAX_PAGE_SIZE = 10_000


def clamp_page(limit: int, offset: int) -> tuple[int, int]:
    return max(1, min(int(limit), MAX_PAGE_SIZE)), max(0, int(offset))


def _predicate(
    df: DataFrame,
    device_col: str,
    ts_col: str,
    device_id,
    ts_start,
    ts_end,
) -> Column:
    pred = F.lit(True)
    if device_id is not None:
        pred = pred & (F.col(device_col) == F.lit(device_id))
    if ts_start is not None:
        pred = pred & (F.col(ts_col) >= F.lit(ts_start))
    if ts_end is not None:
        pred = pred & (F.col(ts_col) < F.lit(ts_end))
    return pred


def page_query(
    df: DataFrame,
    *,
    device_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    device_id=None,
    ts_start: dt.datetime | None = None,
    ts_end: dt.datetime | None = None,
    columns: Sequence[str] | None = None,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """The GET /telematics_real_time page query (main.py:272-292)."""
    limit, offset = clamp_page(limit, offset)
    out = df.where(_predicate(df, device_col, ts_col, device_id, ts_start, ts_end)).orderBy(
        F.col(device_col).asc(), F.col(ts_col).desc(), F.col(tiebreak_col).asc()
    )
    if columns:
        out = out.select(*columns)
    # offset=0 special case mirrors main.py:182-187
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def page_after(
    df: DataFrame,
    *,
    device_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    device_id=None,
    ts_start: dt.datetime | None = None,
    ts_end: dt.datetime | None = None,
    columns: Sequence[str] | None = None,
    limit: int = 100,
    last_device=None,
    last_ts: dt.datetime | None = None,
    last_key=None,
) -> DataFrame:
    """Keyset (seek) pagination — the deep-page scale path the
    reference's OFFSET pagination (main.py:284) lacks.

    OFFSET n re-sorts the full filtered universe and SKIPS n rows per
    page: page p costs O(p·limit) and the API's 10 000-row cap only
    papers over it.  Keyset instead takes the LAST ROW of the previous
    page as a cursor ``(last_device, last_ts, last_key)`` and compiles
    it into a strictly-after predicate in the page sort order
    ``(device ASC, ts DESC, tiebreak ASC)``::

        device > d  OR  (device = d AND (ts < t OR (ts = t AND key > k)))

    so every page is filter + top-``limit`` — constant cost at any
    depth, and the ``ts < t`` branch is a plain range predicate that
    reaches the parquet scan (row-group skipping on min/max stats).
    With ``device_id`` pinned (the common per-device feed), pass only
    ``last_ts``/``last_key`` and the device branch collapses.

    The plan stays TakeOrderedAndProject (asserted in
    tests/test_plans.py): no offset node, no global sort.
    """
    limit, _ = clamp_page(limit, 0)
    if (last_ts is None) != (last_key is None):
        raise ValueError("last_ts and last_key must be passed together")
    pred = _predicate(df, device_col, ts_col, device_id, ts_start, ts_end)
    if last_ts is not None:
        within = (F.col(ts_col) < F.lit(last_ts)) | (
            (F.col(ts_col) == F.lit(last_ts)) & (F.col(tiebreak_col) > F.lit(last_key))
        )
        if last_device is not None:
            pred = pred & (
                (F.col(device_col) > F.lit(last_device))
                | ((F.col(device_col) == F.lit(last_device)) & within)
            )
        else:
            if device_id is None:
                raise ValueError(
                    "multi-device seek needs last_device (or pin device_id)"
                )
            pred = pred & within
    out = df.where(pred).orderBy(
        F.col(device_col).asc(), F.col(ts_col).desc(), F.col(tiebreak_col).asc()
    )
    if columns:
        out = out.select(*columns)
    return out.limit(limit)


def count_query(
    df: DataFrame,
    *,
    device_col: str = "user_id",
    ts_col: str = "ts",
    device_id=None,
    ts_start: dt.datetime | None = None,
    ts_end: dt.datetime | None = None,
) -> DataFrame:
    """The separate pagination COUNT query (main.py:281-299)."""
    return (
        df.where(_predicate(df, device_col, ts_col, device_id, ts_start, ts_end))
        .agg(F.count(F.lit(1)).alias("total"))
    )
