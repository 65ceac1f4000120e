"""HTTP binding for the serving layer — §2.12 end-to-end.

The reference serves three REST endpoints over its query tables from a
FastAPI process (services/telematics_api/main.py:241-374) behind a
bearer-token check (main.py:64-70) and Trino's file-based access rules
(config/trino/rules.json).  The rebuild keeps the query compile layer
(pipelines/api.py), auth (pipelines/auth.py), and pagination SQL
(pipelines/serving.py) as pure functions; this module is the thin HTTP
skin that binds them.

It is written against bare WSGI (PEP 3333, stdlib-only) rather than
FastAPI because the build container ships no web framework — the app
is fully exercisable in-process (call it with a WSGI environ, no
socket), and ``serve`` wraps it in ``wsgiref.simple_server`` for a
real port when wanted.  A FastAPI/uvicorn deployment wraps the same
``ServingApp.handle`` in a route function one line long.

Endpoints (query-string params mirror main.py:241-308):

- ``GET /{table}``        -> page query  (device_id, start, end,
                             columns, limit, offset — or keyset:
                             after_ts + after_id [+ after_device],
                             mutually exclusive with offset)
- ``GET /{table}/count``  -> pagination count
- anything else           -> 404

Every request needs ``Authorization: Bearer <token>`` (401 otherwise)
and SELECT privilege on (catalog, schema, table) per the rules file
(403 otherwise) — the same two-layer gate the reference deploys.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import logging
from collections.abc import Mapping
from urllib.parse import parse_qs

from pyspark.sql import DataFrame

from datalakehouse_spark.pipelines.api import (
    BadRequest,
    compile_count_request,
    compile_page_request,
    compile_seek_request,
)
from datalakehouse_spark.pipelines.auth import (
    AccessRules,
    Forbidden,
    Unauthorized,
    require_token,
)
__all__ = ["ServingApp", "serve"]

_LOG = logging.getLogger(__name__)

_STATUS = {
    200: "200 OK",
    400: "400 Bad Request",
    401: "401 Unauthorized",
    403: "403 Forbidden",
    404: "404 Not Found",
    405: "405 Method Not Allowed",
    500: "500 Internal Server Error",
}


def _jsonable(v):
    """Recursive: temporal/Decimal/bytes values arrive nested inside
    array/map/struct columns too (Row.asDict is shallow), and a value
    json.dumps cannot serialize would otherwise escape as a raw WSGI
    500 instead of this module's JSON contract."""
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    # Row BEFORE list/tuple: pyspark.sql.Row subclasses tuple, and the
    # tuple branch would strip a struct's field names into a bare array
    if hasattr(v, "asDict"):  # nested Row (struct column)
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


class ServingApp:
    """WSGI application over a set of named query DataFrames.

    ``tables`` maps URL table name -> DataFrame (already normalized via
    io.load_table); ``tokens`` is bearer-token -> principal;
    ``rules`` the parsed rules.json mapping.  ``device_col``/``ts_col``
    name the predicate columns per table (defaults match the events
    fixture standing in for telematics_real_time).
    """

    def __init__(
        self,
        tables: Mapping[str, DataFrame],
        tokens: Mapping[str, str],
        rules: Mapping,
        catalog: str = "iceberg",
        schema: str = "telematics",
        device_col: str = "user_id",
        ts_col: str = "ts",
        tiebreak_col: str = "event_id",
    ):
        self._tables = dict(tables)
        self._tokens = dict(tokens)
        self._rules = AccessRules(rules)
        self._catalog, self._schema = catalog, schema
        self._device_col, self._ts_col = device_col, ts_col
        self._tiebreak_col = tiebreak_col

    # -- request handling (transport-independent core) ------------------

    def handle(
        self, method: str, path: str, query: Mapping[str, str], auth_header: str | None
    ) -> tuple[int, dict]:
        """(status, body) for one request — the piece a FastAPI route
        would call directly."""
        try:
            token = None
            if auth_header and auth_header.startswith("Bearer "):
                token = auth_header[len("Bearer ") :]
            user = require_token(token, self._tokens)

            if method != "GET":
                return 405, {"detail": "method not allowed"}
            parts = [p for p in path.split("/") if p]
            if not parts or parts[0] not in self._tables or len(parts) > 2:
                return 404, {"detail": "unknown resource"}
            table = parts[0]
            want_count = len(parts) == 2
            if want_count and parts[1] != "count":
                return 404, {"detail": "unknown resource"}

            self._rules.authorize(
                user, "SELECT", self._catalog, self._schema, table
            )

            df = self._tables[table]
            device_id = query.get("device_id")
            if device_id is not None:
                try:
                    device_id = int(device_id)
                except ValueError as exc:
                    raise BadRequest(f"device_id must be integral: {device_id!r}") from exc
            if want_count:
                out = compile_count_request(
                    df,
                    device_id=device_id,
                    start=query.get("start"),
                    end=query.get("end"),
                    device_col=self._device_col,
                    ts_col=self._ts_col,
                )
                return 200, {"total": out.first()["total"]}
            columns = query.get("columns")
            cols = [c.strip() for c in columns.split(",")] if columns else None
            if "after_ts" in query or "after_id" in query:
                # keyset (seek) page: constant cost at any depth — the
                # client echoes the previous page's last sort key
                if "offset" in query:
                    raise BadRequest("offset and after_* are mutually exclusive")
                page = compile_seek_request(
                    df,
                    device_id=device_id,
                    start=query.get("start"),
                    end=query.get("end"),
                    columns=cols,
                    limit=query.get("limit", 100),
                    after_ts=query.get("after_ts"),
                    after_id=query.get("after_id"),
                    after_device=query.get("after_device"),
                    device_col=self._device_col,
                    ts_col=self._ts_col,
                    tiebreak_col=self._tiebreak_col,
                )
            else:
                page = compile_page_request(
                    df,
                    device_id=device_id,
                    start=query.get("start"),
                    end=query.get("end"),
                    columns=cols,
                    limit=query.get("limit", 100),
                    offset=query.get("offset", 0),
                    device_col=self._device_col,
                    ts_col=self._ts_col,
                    tiebreak_col=self._tiebreak_col,
                )
            rows = [
                {k: _jsonable(v) for k, v in r.asDict().items()} for r in page.collect()
            ]
            return 200, {"rows": rows, "n": len(rows)}
        except Unauthorized as exc:
            return 401, {"detail": str(exc)}
        except Forbidden as exc:
            return 403, {"detail": str(exc)}
        except BadRequest as exc:
            return 400, {"detail": str(exc)}
        except Exception:  # noqa: BLE001 — the JSON-contract backstop
            # Py4J/AnalysisException at collect time, executor loss,
            # anything unanticipated: stay inside the module's JSON
            # contract (the reference's FastAPI layer does the same via
            # its default 500 handler) and log the traceback for the
            # operator; never leak internals to the client.
            _LOG.exception("unhandled error serving %s %s", method, path)
            return 500, {"detail": "internal error"}

    # -- WSGI glue -------------------------------------------------------

    def __call__(self, environ, start_response):
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        query = {k: v[-1] for k, v in qs.items()}
        status, body = self.handle(
            environ.get("REQUEST_METHOD", "GET"),
            environ.get("PATH_INFO", "/"),
            query,
            environ.get("HTTP_AUTHORIZATION"),
        )
        payload = json.dumps(body).encode()
        headers = [
            ("Content-Type", "application/json"),
            ("Content-Length", str(len(payload))),
        ]
        if status == 401:
            headers.append(("WWW-Authenticate", "Bearer"))
        start_response(_STATUS[status], headers)
        return [payload]


def serve(app: ServingApp, host: str = "127.0.0.1", port: int = 8080):
    """Blocking dev server (wsgiref) — production puts the same app
    behind any WSGI server, or rewraps ``app.handle`` in FastAPI."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, app) as httpd:
        httpd.serve_forever()
