"""In-process round-trip of the WSGI serving layer (§2.12 end-to-end):
token auth (401), rules authorization (403), validation (400), page
payload + count (200) — the reference's FastAPI surface
(main.py:241-374) bound over the compile layer with zero external
dependencies (bare PEP 3333, exercised both via a crafted environ and
over a real localhost socket)."""

import io
import json
import threading
import urllib.request
from wsgiref.simple_server import WSGIRequestHandler, make_server

import pytest

from datalakehouse_spark.io import load_table
from datalakehouse_spark.pipelines.http_api import ServingApp

SF = "/root/testdata/sf0.001"

TOKENS = {"sek-analyst": "analyst", "sek-intern": "intern"}
RULES = {
    "catalogs": [
        {"user": "analyst", "catalog": "iceberg", "allow": "read-only"},
        {"user": "intern", "catalog": "iceberg", "allow": "none"},
    ],
    "tables": [
        {
            "user": "analyst",
            "catalog": "iceberg",
            "schema": "telematics",
            "table": "events",
            "privileges": ["SELECT"],
        }
    ],
}


@pytest.fixture(scope="module")
def app(spark):
    ev = load_table(spark, SF, "events")
    return ServingApp({"events": ev}, TOKENS, RULES)


def _call(app, path, query="", auth=None):
    environ = {
        "REQUEST_METHOD": "GET",
        "PATH_INFO": path,
        "QUERY_STRING": query,
        "wsgi.input": io.BytesIO(),
    }
    if auth:
        environ["HTTP_AUTHORIZATION"] = auth
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])
        captured["headers"] = dict(headers)

    body = b"".join(app(environ, start_response))
    return captured["status"], captured["headers"], json.loads(body)


def test_page_payload_roundtrip(app):
    status, _, body = _call(
        app,
        "/events",
        "device_id=7&limit=5&columns=event_id,user_id,event_type",
        auth="Bearer sek-analyst",
    )
    assert status == 200
    assert body["n"] == len(body["rows"]) <= 5
    for row in body["rows"]:
        assert set(row) == {"event_id", "user_id", "event_type"}
        assert row["user_id"] == 7


def test_count_matches_page_universe(app):
    status, _, body = _call(app, "/events/count", "device_id=7", auth="Bearer sek-analyst")
    assert status == 200 and body["total"] > 0


def test_missing_and_invalid_token_401(app):
    status, headers, body = _call(app, "/events")
    assert status == 401 and headers["WWW-Authenticate"] == "Bearer"
    status, _, body = _call(app, "/events", auth="Bearer nope")
    assert status == 401 and body["detail"] == "Invalid token"  # main.py:70 wording


def test_rules_deny_403(app):
    status, _, _ = _call(app, "/events", auth="Bearer sek-intern")
    assert status == 403


def test_validation_400_and_unknown_404(app):
    status, _, body = _call(app, "/events", "start=not-a-ts", auth="Bearer sek-analyst")
    assert status == 400
    status, _, _ = _call(app, "/nope", auth="Bearer sek-analyst")
    assert status == 404
    status, _, _ = _call(app, "/events/bogus", auth="Bearer sek-analyst")
    assert status == 404


def test_live_socket_roundtrip(app):
    """The same app over a real localhost socket (wsgiref), proving the
    WSGI glue is wire-correct, not just environ-correct."""

    class Quiet(WSGIRequestHandler):
        def log_message(self, *a):
            pass

    with make_server("127.0.0.1", 0, app, handler_class=Quiet) as httpd:
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.handle_request, daemon=True)
        t.start()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/events?limit=3",
            headers={"Authorization": "Bearer sek-analyst"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
        t.join(timeout=60)
    assert body["n"] == 3


def test_jsonable_handles_nested_temporal_and_decimal():
    """Row.asDict is shallow — struct/array/map columns carry their
    datetimes/Decimals/bytes through, and they must serialize to the
    JSON contract, not crash into a raw WSGI 500 (round-8 review)."""
    import datetime as dt
    import decimal

    from pyspark.sql import Row

    from datalakehouse_spark.pipelines.http_api import _jsonable

    nested = {
        "arr": [dt.date(2024, 1, 1), decimal.Decimal("1.50")],
        "m": {"k": b"\x01\x02"},
        # a REAL Row: it subclasses tuple, so ordering of the Row vs
        # list/tuple branches decides whether struct field names survive
        "s": Row(ts=dt.datetime(2024, 1, 2, 3, 4, 5), n=1),
    }
    out = _jsonable(nested)
    import json as _json

    assert _json.dumps(out)  # serializes
    assert out["arr"] == ["2024-01-01", 1.5]
    assert out["m"]["k"] == "0102"
    assert out["s"]["ts"] == "2024-01-02 03:04:05"


def test_unexpected_exception_maps_to_json_500(app, caplog):
    """Anything beyond the typed auth/validation errors (Py4J analysis
    failure, executor loss at collect time) must stay inside the JSON
    contract as a 500 with a generic detail — never a raw WSGI crash or
    a leaked traceback — and the underlying exception must be logged."""
    import logging

    broken = ServingApp(
        {"events": _Exploding()}, TOKENS, RULES
    )
    with caplog.at_level(logging.ERROR, logger="datalakehouse_spark.pipelines.http_api"):
        status, _, body = _call(broken, "/events", "limit=1", auth="Bearer sek-analyst")
    assert status == 500
    assert body == {"detail": "internal error"}
    assert any("unhandled error" in r.message for r in caplog.records)
    assert any(r.exc_info for r in caplog.records)  # traceback captured


class _Exploding:
    """DataFrame stand-in whose every attribute access raises — models a
    Py4J failure surfacing inside the compile/collect path."""

    def __getattr__(self, name):
        raise RuntimeError("py4j went away")


def test_seek_param_roundtrip_and_exclusivity(app):
    """after_ts/after_id compile the keyset page over HTTP; mixing them
    with offset is a 400 (two pagination modes, one request)."""
    status, _, p1 = _call(
        app,
        "/events",
        "device_id=7&limit=5&start=2024-01-05&end=2024-01-20",
        auth="Bearer sek-analyst",
    )
    assert status == 200 and p1["n"] == 5
    last = p1["rows"][-1]
    status, _, p2 = _call(
        app,
        "/events",
        "device_id=7&limit=5&start=2024-01-05&end=2024-01-20"
        f"&after_ts={last['ts'].replace(' ', 'T')}&after_id={last['event_id']}",
        auth="Bearer sek-analyst",
    )
    assert status == 200 and p2["n"] == 5
    assert {r["event_id"] for r in p1["rows"]}.isdisjoint(
        r["event_id"] for r in p2["rows"]
    )
    status, _, body = _call(
        app,
        "/events",
        "device_id=7&limit=5&offset=5&after_ts=2024-01-10T00:00:00&after_id=1",
        auth="Bearer sek-analyst",
    )
    assert status == 400 and "mutually exclusive" in body["detail"]
