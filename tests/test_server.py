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
