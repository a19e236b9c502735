"""Minimal HTTP query boundary (reference README.adoc:14 context —
upstream core2 ships an HTTP server module alongside pgwire/Flight;
SURVEY.md §3 client boundary).

One read surface, two encodings:

- ``POST /query`` with JSON body ``{"sql": "..."}`` →
  - ``Accept: application/vnd.apache.arrow.stream`` → Arrow IPC
    stream bytes (the zero-copy path a data client wants),
  - anything else → JSON ``{"columns": [...], "rows": [[...], ...]}``
    (the curl/browser path);
- ``POST /tx`` with ``{"statements": ["...", ...], "tx_time": ...?}``
  → the statements run as ONE engine transaction via
  ``Engine.sql_dml_many`` (requires an attached engine); response
  carries the committed transaction time;
- ``GET /tables`` → the table catalog (requires an attached engine);
- ``GET /basis`` → the current log head serialized as a portable
  basis token; ``POST /query`` accepts an optional ``"basis"`` field
  carrying such a token, so a client can pin one snapshot and run
  many queries against it across requests — the reference's
  pass-a-basis contract over HTTP;
- ``GET /changes?table=t&since=...[&until=...]`` → the CDC feed
  (``Snapshot.changes``) for that window, Arrow IPC or JSON by
  ``Accept`` — an HTTP consumer can tail the transaction log with
  nothing but a cursor over its last-seen system time.

Like the Flight server, HTTP is a RESULT boundary: the
``max_result_rows`` guard refuses to materialize unreduced scans on
the driver.  The temporal dialect flows through unchanged since
execution goes through the supplied executor (typically
``Snapshot.sql``).
"""

from __future__ import annotations

import json
import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
from pyspark.sql import DataFrame

from core2_spark.flight_server import df_to_arrow

ARROW_MIME = "application/vnd.apache.arrow.stream"


def _table_to_ipc(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue().to_pybytes()


def _table_to_json(table: pa.Table) -> bytes:
    cols = table.column_names
    rows = [
        [None if v is None else (v if isinstance(v, (int, float, str, bool)) else str(v)) for v in rec]
        for rec in zip(*[table.column(c).to_pylist() for c in cols])
    ]
    return json.dumps({"columns": cols, "rows": rows}).encode()


class SqlHttpServer:
    """Serve ``executor(sql) -> DataFrame`` over HTTP on a background
    thread.  ``port=0`` picks a free port (exposed as ``.port``)."""

    def __init__(
        self,
        executor: Callable[[str], DataFrame],
        port: int = 0,
        max_result_rows: int = 1_000_000,
        engine=None,
    ):
        self._executor = executor
        self._max_result_rows = max_result_rows
        self._engine = engine
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet test output
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _error(self, code: int, message: str) -> None:
                self._send(code, json.dumps({"error": message}).encode(), "application/json")

            def do_GET(self):
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                if parsed.path == "/changes":
                    return self._do_changes(parse_qs(parsed.query))
                if parsed.path == "/basis":
                    if outer._engine is None:
                        return self._error(400, "no engine attached")
                    from core2_spark.basis import basis_to_json

                    token = basis_to_json(outer._engine.db().basis)
                    return self._send(
                        200,
                        json.dumps({"basis": token}).encode(),
                        "application/json",
                    )
                if parsed.path != "/tables":
                    return self._error(404, f"no route {self.path}")
                if outer._engine is None:
                    return self._error(400, "no engine attached")
                body = json.dumps(
                    {"tables": sorted(outer._engine._all_tables())}
                ).encode()
                self._send(200, body, "application/json")

            def _do_changes(self, params: dict) -> None:
                if outer._engine is None:
                    return self._error(400, "no engine attached")
                try:
                    table = params["table"][0]
                    since = params["since"][0]
                except (KeyError, IndexError):
                    return self._error(
                        400, "required query params: table, since (until optional)"
                    )
                until = params.get("until", [None])[0]
                try:
                    feed = outer._engine.db().changes(
                        table, since=since, until=until
                    )
                    result = df_to_arrow(feed, outer._max_result_rows)
                except Exception as exc:
                    return self._error(400, str(exc) or repr(exc))
                if ARROW_MIME in self.headers.get("Accept", ""):
                    self._send(200, _table_to_ipc(result), ARROW_MIME)
                else:
                    self._send(200, _table_to_json(result), "application/json")

            def do_POST(self):
                if self.path == "/tx":
                    return self._do_tx()
                if self.path == "/xtql":
                    return self._do_xtql()
                if self.path != "/query":
                    return self._error(404, f"no route {self.path}")
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    spec = json.loads(self.rfile.read(n).decode())
                    sql = spec["sql"]
                except (ValueError, KeyError) as exc:
                    return self._error(400, f"bad request body: {exc!r}")
                try:
                    token = spec.get("basis")
                    if token is not None:
                        if outer._engine is None:
                            return self._error(
                                400, "basis tokens need an attached engine"
                            )
                        from core2_spark.basis import basis_from_json

                        df = outer._engine.db(basis_from_json(token)).sql(sql)
                    else:
                        df = outer._executor(sql)
                    table = df_to_arrow(df, outer._max_result_rows)
                except Exception as exc:  # surface executor errors as 400s
                    return self._error(400, repr(exc))
                if ARROW_MIME in self.headers.get("Accept", ""):
                    self._send(200, _table_to_ipc(table), ARROW_MIME)
                else:
                    self._send(200, _table_to_json(table), "application/json")

            def _do_xtql(self):
                """``POST /xtql`` with ``{"query": [<pipeline ops>],
                "basis": token?}`` — the reference serves its pipeline
                language over HTTP as JSON; the ops are exactly the
                xtql.py dict representation.  Same dual Arrow/JSON
                response negotiation as /query."""
                if outer._engine is None:
                    return self._error(400, "no engine attached")
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    spec = json.loads(self.rfile.read(n).decode())
                    pipeline = spec["query"]
                    assert isinstance(pipeline, list) and pipeline
                except (ValueError, KeyError, AssertionError) as exc:
                    return self._error(400, f"bad request body: {exc!r}")
                try:
                    token = spec.get("basis")
                    if token is not None:
                        from core2_spark.basis import basis_from_json

                        snap = outer._engine.db(basis_from_json(token))
                    else:
                        snap = outer._engine.db()
                    table = df_to_arrow(
                        snap.xtql(pipeline), outer._max_result_rows
                    )
                except Exception as exc:
                    return self._error(400, repr(exc))
                if ARROW_MIME in self.headers.get("Accept", ""):
                    self._send(200, _table_to_ipc(table), ARROW_MIME)
                else:
                    self._send(200, _table_to_json(table), "application/json")

            def _do_tx(self):
                if outer._engine is None:
                    return self._error(400, "no engine attached")
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    spec = json.loads(self.rfile.read(n).decode())
                    statements = spec["statements"]
                    assert isinstance(statements, list) and statements
                except (ValueError, KeyError, AssertionError) as exc:
                    return self._error(400, f"bad request body: {exc!r}")
                try:
                    basis = outer._engine.sql_dml_many(
                        statements, tx_time=spec.get("tx_time")
                    )
                except Exception as exc:
                    return self._error(400, str(exc) or repr(exc))
                body = json.dumps(
                    {"tx_time": basis.current_time.isoformat()}
                ).encode()
                self._send(200, body, "application/json")

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def http_query(port: int, sql: str, arrow: bool = False):
    """Client helper: POST a query; returns a pyarrow Table (arrow=True)
    or the decoded JSON payload."""
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query",
        data=json.dumps({"sql": sql}).encode(),
        headers={
            "Content-Type": "application/json",
            "Accept": ARROW_MIME if arrow else "application/json",
        },
    )
    with urllib.request.urlopen(req) as resp:
        body = resp.read()
    if arrow:
        return pa.ipc.open_stream(body).read_all()
    return json.loads(body)
