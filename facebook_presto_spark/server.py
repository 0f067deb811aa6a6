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
import re
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
    """Streaming paging state: rows are pulled lazily from
    ``df.toLocalIterator()`` one page at a time, like the reference's
    root-stage page flow (StatementResource.java:84 streams pages from
    the output buffer — it never materializes the result).  Only the
    most recently produced page is retained (for idempotent client
    retries of the current nextUri); older pages are gone, matching the
    reference's consume-once buffer."""

    def __init__(self, qid: str, columns, row_iter):
        self.id = qid
        self.columns = columns
        self._it = row_iter
        self._lock = threading.Lock()
        self._page_no = -1      # index of the buffered page
        self._page: list = []
        self._exhausted = False
        self.killed = False     # set by CALL system.runtime.kill_query

    def page(self, page_no: int):
        """(chunk, has_next) for ``page_no``; None if the page is no
        longer (or not yet) available."""
        with self._lock:
            while self._page_no < page_no and not (
                self._exhausted and self._page_no >= 0
            ):
                chunk = []
                try:
                    while len(chunk) < PAGE_SIZE:
                        row = next(self._it)
                        chunk.append([_json_cell(c) for c in row])
                except StopIteration:
                    self._exhausted = True
                self._page_no += 1
                self._page = chunk
            if page_no != self._page_no:
                return None
            has_next = not self._exhausted
            return self._page, has_next


class _Handler(BaseHTTPRequestHandler):
    server_version = "PrestoSpark/0"

    def log_message(self, *args):  # quiet
        pass

    # -- helpers -----------------------------------------------------------

    def _reply(self, payload: dict, code: int = 200,
               headers: dict | None = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for name, value in (headers or {}).items():
            self.send_header(name, value)
        self.end_headers()
        self.wfile.write(body)

    def _base(self) -> str:
        host = self.headers.get("Host") or f"localhost:{self.server.server_port}"
        return f"http://{host}"

    def _page_payload(self, q: _Query, page: int) -> dict | None:
        if q.killed:
            # administratively killed (KillQueryProcedure semantics):
            # surface the failure on the client's next poll, then evict
            self.server.queries.pop(q.id, None)
            return {
                "id": q.id,
                "infoUri": f"{self._base()}/v1/query/{q.id}",
                "columns": q.columns,
                "stats": {"state": "FAILED"},
                "error": {
                    "message": "Query killed",
                    "errorCode": 1,
                    "errorName": "ADMINISTRATIVELY_KILLED",
                    "errorType": "USER_ERROR",
                },
            }
        try:
            got = q.page(page)
        except Exception as e:  # runtime failure while streaming a page
            self.server.queries.pop(q.id, None)
            entry = self.server.engine.runtime.get(q.id)
            if entry is not None:
                entry.fail(str(e).split("\n")[0][:500])
            return {
                "id": q.id,
                "infoUri": f"{self._base()}/v1/query/{q.id}",
                "columns": q.columns,
                "stats": {"state": "FAILED"},
                "error": {
                    "message": str(e).split("\n")[0][:1000],
                    "errorCode": 1,
                    "errorName": "GENERIC_USER_ERROR",
                    "errorType": "USER_ERROR",
                },
            }
        if got is None:
            return None
        chunk, has_next = got
        out = {
            "id": q.id,
            "infoUri": f"{self._base()}/v1/query/{q.id}",
            "columns": q.columns,
            "data": chunk or None,
            "stats": {"state": "RUNNING" if has_next else "FINISHED"},
            "error": None,
            "updateType": None,
            "updateCount": None,
        }
        if has_next:
            out["nextUri"] = f"{self._base()}/v1/statement/{q.id}/{page + 1}"
        else:
            # last page served — evict; the normal client loop (GET until
            # nextUri disappears) never sends DELETE, so this is the
            # only path that frees the paging state
            self.server.queries.pop(q.id, None)
            entry = self.server.engine.runtime.get(q.id)
            if entry is not None:
                entry.finish()
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
        # register with the runtime registry (system.runtime.queries /
        # kill_query) as the OUTER frame: engine.sql's nested enter
        # reuses this entry, and it stays RUNNING until paging completes
        entry, _owner = engine.runtime.enter(
            sql,
            user=self.headers.get("X-Presto-User") or "presto",
            source=self.headers.get("X-Presto-Source"),
            qid=qid,
        )
        snap = {}
        reply_headers: dict[str, str] = {}
        try:
            # X-Presto-Prepared-Statement: name=urlencoded-sql, … — the
            # client replays its prepared statements per request
            # (StatementClientV1.java:103-110; Session is rebuilt from
            # headers), so EXECUTE works against a stateless server
            import urllib.parse as _up

            for pair in (self.headers.get("X-Presto-Prepared-Statement") or "").split(","):
                name, eq, body64 = pair.strip().partition("=")
                if eq:
                    engine._prepared[_up.unquote(name).lower()] = _up.unquote(body64)
            m = re.match(r"\s*PREPARE\s+([A-Za-z_]\w*)\s+FROM\s+(.+)$", sql,
                         re.I | re.S)
            if m:
                # echo the registration back (PRESTO_ADDED_PREPARE), the
                # reference's contract for client-side statement caches
                reply_headers["X-Presto-Added-Prepare"] = (
                    _up.quote(m.group(1).lower(), safe="")
                    + "=" + _up.quote(m.group(2).strip(), safe="")
                )
            m = re.match(r"\s*DEALLOCATE\s+PREPARE\s+([A-Za-z_]\w*)", sql, re.I)
            if m:
                reply_headers["X-Presto-Deallocated-Prepare"] = _up.quote(
                    m.group(1).lower(), safe=""
                )
            # X-Presto-Transaction-Id: the client replays its transaction
            # id per request (PrestoHeaders.java:35; the Session is
            # rebuilt from headers) — bind it to this request's thread
            txn_id = (self.headers.get("X-Presto-Transaction-Id") or "").strip()
            if txn_id and txn_id.upper() != "NONE":
                engine.transactions.get(txn_id)  # raises for unknown ids
                engine.set_current_transaction(txn_id)
            engine.txn_event = None
            # X-Presto-Path: the client replays its SQL path per request
            # (PrestoHeaders.java:22); SET PATH answers X-Presto-Set-Path
            engine.set_current_path(
                (self.headers.get("X-Presto-Path") or "").strip()
            )
            engine.path_event = None
            props = [
                prop.partition("=")
                for prop in (self.headers.get("X-Presto-Session") or "").split(",")
                if "=" in prop
            ]
            if props:
                from facebook_presto_spark.properties import (
                    set_session_property, snapshot_confs,
                )

                # statement-scoped, like the reference (Session built from
                # headers per request) — snapshot first, restore in finally
                snap = snapshot_confs(engine.spark, [n for n, _, _ in props])
                for name, _, value in props:
                    set_session_property(engine.spark, name.strip(), value.strip())
            df = engine.sql(sql)
            ev = engine.txn_event
            if ev is not None:
                # PrestoHeaders.java:36-37 — the client adopts/clears its
                # transaction id from these response headers
                if ev[0] == "started":
                    reply_headers["X-Presto-Started-Transaction-Id"] = ev[1]
                else:
                    reply_headers["X-Presto-Clear-Transaction-Id"] = "true"
            if engine.path_event is not None:
                reply_headers["X-Presto-Set-Path"] = engine.path_event
            schema = df.schema
            # toLocalIterator streams partition-by-partition: the driver
            # holds at most one partition + one page, never the result
            rows = df.toLocalIterator()
            columns = [
                {"name": f.name, "type": presto_type_name(f.dataType.simpleString())}
                for f in schema.fields
            ]
        except Exception as e:  # QueryError shape (QueryResults.error)
            entry.fail(str(e).split("\n")[0][:500])
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
        finally:
            engine.runtime.exit()
            engine.set_current_transaction(None)
            if snap:
                from facebook_presto_spark.properties import restore_confs

                restore_confs(engine.spark, snap)
        q = _Query(qid, columns, rows)
        self.server.queries[qid] = q

        def _kill(query=q):
            query.killed = True

        entry.kill_cb = _kill
        payload = self._page_payload(q, 0)
        self._reply(payload, headers=reply_headers)

    def do_GET(self) -> None:
        parts = self.path.strip("/").split("/")
        if parts == ["v1", "info"]:
            # ServerInfoResource.java — version/environment/coordinator
            spark = self.server.engine.spark
            self._reply({
                "nodeVersion": {"version": f"spark-{spark.version}"},
                "environment": "spark",
                "coordinator": True,
                "starting": False,
            })
            return
        if len(parts) == 3 and parts[:2] == ["v1", "query"]:
            # QueryResource.java getQueryInfo — the infoUri target: basic
            # query info served from the runtime registry
            entry = self.server.engine.runtime.get(parts[2])
            if entry is None:
                self._reply({"error": {"message": "query not found"}}, 404)
                return
            self._reply({
                "queryId": entry.qid,
                "state": entry.state,
                "query": entry.query,
                "session": {"user": entry.user, "source": entry.source},
                "errorMessage": entry.error,
                "queryStats": {
                    "createTime": entry.created.isoformat(),
                    "endTime": entry.end.isoformat() if entry.end else None,
                },
            })
            return
        if len(parts) == 4 and parts[:2] == ["v1", "statement"]:
            q = self.server.queries.get(parts[2])
            if q is None:
                self._reply({"error": {"message": "query not found"}}, 404)
                return
            payload = self._page_payload(q, int(parts[3]))
            if payload is None:
                self._reply({"error": {"message": "page no longer available"}}, 410)
                return
            self._reply(payload)
            return
        self._reply({"error": {"message": "not found"}}, 404)

    def do_DELETE(self) -> None:
        parts = self.path.strip("/").split("/")
        if len(parts) == 3 and parts[:2] == ["v1", "query"]:
            # QueryResource.java cancelQuery — the admin kill endpoint
            try:
                self.server.engine.runtime.kill_query(parts[2], "canceled via API")
            except ValueError:
                pass  # idempotent cancel, like the reference
            self.send_response(204)
            self.end_headers()
            return
        if len(parts) >= 3 and parts[:2] == ["v1", "statement"]:
            self.server.queries.pop(parts[2], None)
            entry = self.server.engine.runtime.get(parts[2])
            if entry is not None:
                entry.fail("Query was canceled")
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
