"""The /v1/statement HTTP protocol (server.py) driven like a client.

Mirrors StatementClientV1's loop: POST the SQL, read columns+data,
follow nextUri until it disappears; errors come back in the
QueryResults.error field; DELETE cancels.
"""

import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(spark):
    from facebook_presto_spark.engine import PrestoSparkEngine
    from facebook_presto_spark.server import serve

    eng = PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)
    srv = serve(eng)
    yield srv
    srv.shutdown()


def _post(server, sql: str) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=sql.encode(),
        method="POST",
        headers={"X-Presto-User": "test"},
    )
    with urllib.request.urlopen(req) as r:
        return json.load(r)


def _post_headers(server, sql: str, headers: dict) -> tuple[dict, dict]:
    """(payload, response headers) for transaction-header round-trips."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=sql.encode(),
        method="POST",
        headers={"X-Presto-User": "test", **headers},
    )
    with urllib.request.urlopen(req) as r:
        return json.load(r), dict(r.headers)


def _drain(server, first: dict) -> list:
    rows = list(first.get("data") or [])
    nxt = first.get("nextUri")
    while nxt:
        with urllib.request.urlopen(nxt) as r:
            page = json.load(r)
        rows += page.get("data") or []
        nxt = page.get("nextUri")
    return rows


def test_statement_roundtrip(server):
    res = _post(server, "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 3")
    assert res["stats"]["state"] == "FINISHED" and res["error"] is None
    assert [c["name"] for c in res["columns"]] == ["n_name"]
    assert res["columns"][0]["type"] == "varchar"
    assert len(_drain(server, res)) == 3


def test_paging_follows_next_uri(server):
    res = _post(server, "SELECT o_orderkey FROM orders")
    rows = _drain(server, res)
    assert len(rows) > 1000  # crossed at least one page boundary
    assert res["stats"]["state"] == "RUNNING" and "nextUri" in res


def test_presto_dialect_through_protocol(server):
    res = _post(
        server,
        "SELECT strpos(n_name, 'A') AS p, approx_distinct(n_regionkey) AS d "
        "FROM nation GROUP BY n_name ORDER BY n_name LIMIT 1",
    )
    # strpos maps to Spark instr (INTEGER where Presto says BIGINT — the
    # documented integer-width difference); the dialect call itself and
    # the Presto-named aggregate both resolve through the protocol
    assert res["error"] is None
    assert res["columns"][0]["type"] in ("integer", "bigint")
    assert res["columns"][1]["type"] == "bigint"


def test_error_in_query_results_error_field(server):
    res = _post(server, "SELECT no_such_column FROM nation")
    assert res["stats"]["state"] == "FAILED"
    assert res["error"]["errorType"] == "USER_ERROR"
    assert "no_such_column" in res["error"]["message"]


def test_delete_cancels(server):
    res = _post(server, "SELECT o_orderkey FROM orders")
    qid = res["id"]
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement/{qid}/1",
        method="DELETE",
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    # the paging state is gone
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(
            f"http://127.0.0.1:{server.server_port}/v1/statement/{qid}/1"
        )


def test_session_property_header(server):
    res = _post(server, "SELECT 1 AS x")  # header-less baseline works
    assert res["error"] is None


def test_large_result_streams_pages(server):
    """Pages are produced lazily from toLocalIterator — the server never
    holds the whole result.  Asserted structurally: the paging state
    retains only the current page, and draining still sees every row."""
    res = _post(server, "SELECT l_orderkey, l_partkey FROM lineitem")
    qid = res["id"]
    q = server.queries[qid]
    # after the POST only page 0 is buffered
    assert q._page_no == 0 and len(q._page) <= 1000
    rows = _drain(server, res)
    assert len(rows) > 5000  # crossed many page boundaries
    # the streaming buffer never grew past one page
    assert len(q._page) <= 1000


def test_finished_query_is_evicted(server):
    """The normal client loop (GET until nextUri disappears) frees the
    paging state without a DELETE."""
    res = _post(server, "SELECT o_orderkey FROM orders")
    qid = res["id"]
    assert qid in server.queries  # multi-page: alive after page 0
    _drain(server, res)
    assert qid not in server.queries
    # single-page results are evicted on the POST response itself
    res = _post(server, "SELECT 1 AS x")
    assert "nextUri" not in res and res["id"] not in server.queries


def test_session_property_scoped_to_statement(server):
    """X-Presto-Session applies to its statement only — the shared
    SparkSession's conf is restored afterwards (the reference builds a
    per-request Session from headers; nothing leaks across clients)."""
    spark_conf = server.engine.spark.conf
    before = spark_conf.get("spark.sql.shuffle.partitions")
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=b"SELECT count(*) AS c FROM nation",
        method="POST",
        headers={
            "X-Presto-User": "test",
            "X-Presto-Session": "hash_partition_count=7",
        },
    )
    with urllib.request.urlopen(req) as r:
        res = json.load(r)
    assert res["error"] is None
    assert spark_conf.get("spark.sql.shuffle.partitions") == before


def test_system_runtime_queries_and_kill(server):
    # a long (multi-page) query stays RUNNING in system.runtime.queries
    # while its pages are outstanding
    res = _post(server, "SELECT o_orderkey FROM orders")
    qid = res["id"]
    assert res["stats"]["state"] == "RUNNING"
    eng = server.engine
    running = {
        r.query_id: r.state
        for r in eng.sql(
            "SELECT query_id, state FROM system.runtime.queries"
        ).collect()
    }
    assert running.get(qid) == "RUNNING"

    # CALL system.runtime.kill_query poisons the paging state
    # (KillQueryProcedure.java:53-76) — the client's next poll gets
    # ADMINISTRATIVELY_KILLED and the query is evicted
    eng.sql(f"CALL system.runtime.kill_query('{qid}', 'test kill')")
    with urllib.request.urlopen(res["nextUri"]) as r:
        page = json.load(r)
    assert page["stats"]["state"] == "FAILED"
    assert page["error"]["errorName"] == "ADMINISTRATIVELY_KILLED"
    entry = eng.runtime.get(qid)
    assert entry.state == "FAILED" and "test kill" in entry.error

    # killing it again: no longer running (reference error text)
    import pytest as _pytest

    with _pytest.raises(Exception, match="not running"):
        eng.sql(f"CALL system.runtime.kill_query('{qid}', 'again')")
    with _pytest.raises(Exception, match="not found"):
        eng.sql("CALL system.runtime.kill_query('bogus_id', 'x')")

    # server-tracked user from the X-Presto-User header
    row = [
        r
        for r in eng.sql(
            "SELECT query_id, user, state FROM system.runtime.queries"
        ).collect()
        if r.query_id == qid
    ]
    assert row and row[0].user == "test" and row[0].state == "FAILED"


def test_system_runtime_nodes_and_tasks(server):
    eng = server.engine
    nodes = eng.sql(
        "SELECT node_id, node_version, coordinator, state FROM system.runtime.nodes"
    ).collect()
    assert len(nodes) == 1 and nodes[0].coordinator is True
    assert nodes[0].state == "active" and nodes[0].node_version.startswith("spark-")
    # tasks: schema matches TaskSystemTable.java:47-78's core columns;
    # a synchronous engine usually has no active stage at read time
    tasks = eng.sql("SELECT * FROM system.runtime.tasks")
    assert tasks.columns[:5] == ["node_id", "task_id", "stage_id", "query_id", "state"]
    tasks.collect()


def test_info_and_query_resources(server):
    # /v1/info (ServerInfoResource shape)
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.server_port}/v1/info"
    ) as r:
        info = json.load(r)
    assert info["coordinator"] is True and info["starting"] is False
    assert info["nodeVersion"]["version"].startswith("spark-")

    # /v1/query/{id} — the infoUri target resolves to basic query info
    res = _post(server, "SELECT n_nationkey FROM nation")
    _drain(server, res)
    with urllib.request.urlopen(res["infoUri"]) as r:
        qinfo = json.load(r)
    assert qinfo["queryId"] == res["id"]
    assert qinfo["state"] == "FINISHED"
    assert qinfo["session"]["user"] == "test"

    # DELETE /v1/query/{id} kills a running paged query (QueryResource
    # cancelQuery); idempotent on finished ones
    res2 = _post(server, "SELECT o_orderkey FROM orders")
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/query/{res2['id']}",
        method="DELETE",
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 204
    with urllib.request.urlopen(res2["nextUri"]) as r:
        page = json.load(r)
    assert page["error"]["errorName"] == "ADMINISTRATIVELY_KILLED"


def test_prepared_statement_headers(server):
    import urllib.parse

    # PREPARE echoes X-Presto-Added-Prepare (StatementClientV1 caches it)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=b"PREPARE hdr_q FROM SELECT n_name FROM nation WHERE n_nationkey = ?",
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        added = r.headers.get("X-Presto-Added-Prepare")
    assert added and added.startswith("hdr_q=")
    name, _, body = added.partition("=")
    assert "n_nationkey" in urllib.parse.unquote(body)

    # a STATELESS client replays the prepared statement via the request
    # header and EXECUTEs — the reference's session-rebuild contract
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=b"EXECUTE replayed USING 3",
        method="POST",
        headers={
            "X-Presto-Prepared-Statement": "replayed="
            + urllib.parse.quote(
                "SELECT n_name FROM nation WHERE n_nationkey = ?", safe=""
            )
        },
    )
    with urllib.request.urlopen(req) as r:
        res = json.load(r)
    rows = _drain(server, res)
    assert len(rows) == 1 and rows[0][0].endswith("_3")

    # DEALLOCATE echoes X-Presto-Deallocated-Prepare
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_port}/v1/statement",
        data=b"DEALLOCATE PREPARE hdr_q",
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers.get("X-Presto-Deallocated-Prepare") == "hdr_q"


def test_system_jdbc_metadata(server):
    """system.jdbc.* (connector/system/jdbc/*.java) — the JDBC driver's
    DatabaseMetaData source, served from the live catalog."""
    eng = server.engine
    cats = eng.sql("SELECT * FROM system.jdbc.catalogs").collect()
    assert [r.table_cat for r in cats] == ["spark"]
    types = {r.table_type for r in eng.sql("SELECT * FROM system.jdbc.table_types").collect()}
    assert types == {"TABLE", "VIEW"}
    cols = {
        r.column_name: (r.data_type, r.type_name)
        for r in eng.sql(
            "SELECT column_name, data_type, type_name FROM system.jdbc.columns "
            "WHERE table_name = 'nation'"
        ).collect()
    }
    # java.sql.Types codes: INTEGER=4, VARCHAR=12 (ColumnJdbcTable:169)
    assert cols["n_nationkey"] == (4, "integer")
    assert cols["n_name"] == (12, "varchar")
    tables = {
        r.table_name
        for r in eng.sql(
            "SELECT table_name FROM system.jdbc.tables WHERE table_schem = 'default'"
        ).collect()
    }
    assert {"nation", "orders", "lineitem"} <= tables


def test_transaction_header_roundtrip(server):
    """The JDBC client's transaction flow (PrestoHeaders.java:35-37 +
    StatementClientV1): START TRANSACTION returns
    X-Presto-Started-Transaction-Id; subsequent statements replay it as
    X-Presto-Transaction-Id; writes inside a READ ONLY transaction fail
    with InMemoryTransactionManager.java:456's message; COMMIT/ROLLBACK
    return X-Presto-Clear-Transaction-Id."""
    res, hdr = _post_headers(server, "START TRANSACTION READ ONLY", {})
    assert res["error"] is None
    tid = hdr["X-Presto-Started-Transaction-Id"]
    assert tid
    # a read inside the transaction works and shows in the system table
    res, _h = _post_headers(
        server,
        "SELECT transaction_id, read_only FROM system.runtime.transactions",
        {"X-Presto-Transaction-Id": tid},
    )
    rows = _drain(server, res)
    assert [tid, True] in rows
    # a write is rejected with the reference's READ_ONLY_VIOLATION text
    res, _h = _post_headers(
        server,
        "CREATE TABLE memory.default.txn_w AS SELECT 1 AS x",
        {"X-Presto-Transaction-Id": tid},
    )
    assert res["stats"]["state"] == "FAILED"
    assert "read-only transaction" in res["error"]["message"]
    # ROLLBACK clears: response carries the clear header, table empties
    res, hdr = _post_headers(
        server, "ROLLBACK", {"X-Presto-Transaction-Id": tid}
    )
    assert res["error"] is None
    assert hdr["X-Presto-Clear-Transaction-Id"] == "true"
    res, _h = _post_headers(
        server, "SELECT count(*) AS n FROM system.runtime.transactions", {}
    )
    assert _drain(server, res) == [[0]]
    # an unknown/expired id fails loudly, not silently autocommits
    res, _h = _post_headers(
        server, "SELECT 1", {"X-Presto-Transaction-Id": tid}
    )
    assert res["stats"]["state"] == "FAILED"
    assert "Unknown transaction ID" in res["error"]["message"]


def test_set_path_headers(server):
    """SET PATH answers X-Presto-Set-Path; the client replays it as
    X-Presto-Path (PrestoHeaders.java:22,29)."""
    res, hdr = _post_headers(server, "SET PATH memory.default", {})
    assert res["error"] is None
    assert hdr["X-Presto-Set-Path"] == "memory.default"
    res, _h = _post_headers(
        server, "SELECT current_path AS p",
        {"X-Presto-Path": "memory.default"},
    )
    assert _drain(server, res) == [["memory.default"]]
    # without the replayed header the path is session-default empty
    res, _h = _post_headers(server, "SELECT current_path AS p", {})
    assert _drain(server, res) == [[""]]


def test_system_metadata_and_transactions(server):
    """system.metadata.{catalogs,table_properties} (CatalogSystemTable,
    AbstractPropertiesSystemTable) + system.runtime.transactions
    (TransactionsSystemTable — empty outside an explicit transaction;
    the live-transaction rows are covered in
    test_transaction_header_roundtrip / test_access.py)."""
    eng = server.engine
    cats = {
        r.catalog_name: r.connector_id
        for r in eng.sql("SELECT * FROM system.metadata.catalogs").collect()
    }
    assert cats["spark"] == "spark"
    # every registered connector catalog is listed (CatalogSystemTable)
    assert cats["example"] == "example-http"
    for name in ("memory", "blackhole", "localfile", "jmx", "tpch",
                 "system"):
        assert cats[name] == name
    props = {
        r.property_name: r.type
        for r in eng.sql(
            "SELECT property_name, type FROM system.metadata.table_properties"
        ).collect()
    }
    assert props["format"] == "varchar" and props["bucket_count"] == "integer"
    tx = eng.sql("SELECT * FROM system.runtime.transactions")
    assert tx.columns[:4] == [
        "transaction_id", "isolation_level", "read_only", "auto_commit_context"
    ]
    assert tx.count() == 0


def test_concurrent_sessions_soak(server):
    """Concurrency soak (round 5): N client threads drive mixed queries
    through /v1/statement while system.runtime.queries is polled live
    and kill_query terminates a mid-flight paged query —
    KillQueryProcedure.java:53 semantics under real thread concurrency,
    not single-threaded sequencing."""
    import threading

    eng = server.engine
    errors: list = []
    done_counts: list = []

    STATEMENTS = [
        "SELECT count(*) AS n FROM lineitem",
        "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 5",
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY 1",
        "SELECT r_regionkey + 1 AS k FROM region",
        "SELECT max(l_extendedprice) AS m FROM lineitem",
    ]

    def worker(seed: int) -> None:
        try:
            n_done = 0
            for i in range(5):
                sql = STATEMENTS[(seed + i) % len(STATEMENTS)]
                res = _post(server, sql)
                rows = _drain(server, res)
                assert rows, f"no rows for {sql!r}"
                n_done += 1
            done_counts.append(n_done)
        except Exception as exc:  # noqa: BLE001 — collected for the assert
            errors.append(exc)

    def monitor() -> None:
        try:
            for _ in range(8):
                rows = eng.sql(
                    "SELECT query_id, state FROM system.runtime.queries"
                ).collect()
                assert rows is not None
                eng.sql(
                    "SELECT count(*) AS n FROM system.runtime.tasks"
                ).collect()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    threads.append(threading.Thread(target=monitor))

    # a paged query left mid-flight, killed while the workers hammer
    victim = _post(server, "SELECT o_orderkey FROM orders")
    assert victim["stats"]["state"] == "RUNNING"

    for t in threads:
        t.start()
    eng.sql(
        f"CALL system.runtime.kill_query('{victim['id']}', 'soak kill')"
    )
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "soak thread hung"

    assert errors == []
    assert done_counts == [5] * 6

    # the victim's next poll reports the administrative kill
    with urllib.request.urlopen(victim["nextUri"]) as r:
        page = json.load(r)
    assert page["stats"]["state"] == "FAILED"
    assert page["error"]["errorName"] == "ADMINISTRATIVELY_KILLED"

    # registry settled: no RUNNING leftovers from the soak (the
    # introspection statement itself legitimately snapshots as RUNNING)
    leftovers = [
        r.query
        for r in eng.sql(
            "SELECT query, state FROM system.runtime.queries"
        ).collect()
        if r.state == "RUNNING" and "system.runtime.queries" not in r.query
    ]
    assert leftovers == []
