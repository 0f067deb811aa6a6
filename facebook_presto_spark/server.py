"""HTTP statement protocol — the reference's entry point A.

Clients (CLI / JDBC / StatementClientV1) drive Presto exclusively through
``POST /v1/statement`` and then follow ``nextUri`` pages
(presto-main/.../server/protocol/StatementResource.java:84;
presto-client/.../QueryResults.java:52-62 defines the wire shape:
id / infoUri / nextUri / columns / data / stats / error / updateType /
updateCount; Column.java:32 name+type).

This module serves that protocol over the engine.  Execution is
synchronous (local Spark session — no cluster scheduler to defer to);
results page out 1000 rows per response exactly like the reference's
client loop expects: keep GETting ``nextUri`` until it disappears,
DELETE cancels.  ``X-Presto-Session: k=v,...`` headers apply the same
session-property surface ``SET SESSION`` uses (properties.py).

Usage::

    from facebook_presto_spark.server import serve
    srv = serve(engine, port=8080)          # background thread
    # POST http://localhost:8080/v1/statement with the SQL as the body
    srv.shutdown()
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from facebook_presto_spark.infoschema import presto_type_name

PAGE_SIZE = 1000


def _json_cell(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, dt.time):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_cell(x) for k, x in v.items()}
    if hasattr(v, "asDict"):  # Row (struct): positional list like the client
        return [_json_cell(x) for x in v]
    return str(v)


class _Query:
    def __init__(self, qid: str, columns, rows):
        self.id = qid
        self.columns = columns
        self.rows = rows


class _Handler(BaseHTTPRequestHandler):
    server_version = "PrestoSpark/0"

    def log_message(self, *args):  # quiet
        pass

    # -- helpers -----------------------------------------------------------

    def _reply(self, payload: dict, code: int = 200) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _base(self) -> str:
        host = self.headers.get("Host") or f"localhost:{self.server.server_port}"
        return f"http://{host}"

    def _page_payload(self, q: _Query, page: int) -> dict:
        start, end = page * PAGE_SIZE, (page + 1) * PAGE_SIZE
        chunk = q.rows[start:end]
        done = end >= len(q.rows)
        out = {
            "id": q.id,
            "infoUri": f"{self._base()}/v1/query/{q.id}",
            "columns": q.columns,
            "data": chunk or None,
            "stats": {"state": "FINISHED" if done else "RUNNING"},
            "error": None,
            "updateType": None,
            "updateCount": None,
        }
        if not done:
            out["nextUri"] = f"{self._base()}/v1/statement/{q.id}/{page + 1}"
        if not chunk:
            out.pop("data")
        return out

    # -- protocol ----------------------------------------------------------

    def do_POST(self) -> None:
        if self.path.rstrip("/") != "/v1/statement":
            self._reply({"error": {"message": "not found"}}, 404)
            return
        length = int(self.headers.get("Content-Length") or 0)
        sql = self.rfile.read(length).decode()
        qid = f"{dt.date.today():%Y%m%d}_{uuid.uuid4().hex[:12]}"
        engine = self.server.engine
        try:
            for prop in (self.headers.get("X-Presto-Session") or "").split(","):
                if "=" in prop:
                    from facebook_presto_spark.properties import set_session_property

                    name, _, value = prop.partition("=")
                    set_session_property(engine.spark, name.strip(), value.strip())
            df = engine.sql(sql)
            schema = df.schema
            rows = [[_json_cell(c) for c in r] for r in df.collect()]
            columns = [
                {"name": f.name, "type": presto_type_name(f.dataType.simpleString())}
                for f in schema.fields
            ]
        except Exception as e:  # QueryError shape (QueryResults.error)
            self._reply({
                "id": qid,
                "infoUri": f"{self._base()}/v1/query/{qid}",
                "columns": None,
                "stats": {"state": "FAILED"},
                "error": {
                    "message": str(e).split("\n")[0][:1000],
                    "errorCode": 1,
                    "errorName": "GENERIC_USER_ERROR",
                    "errorType": "USER_ERROR",
                },
            })
            return
        q = _Query(qid, columns, rows)
        self.server.queries[qid] = q
        self._reply(self._page_payload(q, 0))

    def do_GET(self) -> None:
        parts = self.path.strip("/").split("/")
        if len(parts) == 4 and parts[:2] == ["v1", "statement"]:
            q = self.server.queries.get(parts[2])
            if q is None:
                self._reply({"error": {"message": "query not found"}}, 404)
                return
            self._reply(self._page_payload(q, int(parts[3])))
            return
        self._reply({"error": {"message": "not found"}}, 404)

    def do_DELETE(self) -> None:
        parts = self.path.strip("/").split("/")
        if len(parts) >= 3 and parts[:2] == ["v1", "statement"]:
            self.server.queries.pop(parts[2], None)
            self.send_response(204)
            self.end_headers()
            return
        self._reply({"error": {"message": "not found"}}, 404)


class PrestoHttpServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.engine = engine
        self.queries: dict[str, _Query] = {}


def serve(engine, host: str = "127.0.0.1", port: int = 0) -> PrestoHttpServer:
    """Start the statement server on a daemon thread; returns the server
    (``server_port`` holds the bound port; call ``shutdown()`` to stop)."""
    srv = PrestoHttpServer(engine, host, port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
