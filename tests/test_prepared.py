"""PREPARE / EXECUTE / DEALLOCATE through the engine.

Reference: execution/QueryPreparer.java:55-85 unwraps prepared statements
and substitutes `?` parameters positionally before analysis; the grammar
(SqlBase.g4 `parameter`) allows `?` anywhere an expression may appear.
"""

from __future__ import annotations

import pytest

from facebook_presto_spark.engine import PrestoSparkEngine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def test_prepare_execute_roundtrip(engine):
    engine.sql("PREPARE nations_below FROM SELECT n_name FROM nation WHERE n_nationkey < ? ORDER BY n_name")
    rows = engine.sql("EXECUTE nations_below USING 3").collect()
    assert [r.n_name for r in rows] == ["NATION_0", "NATION_1", "NATION_2"]
    # re-execute with a different binding
    assert len(engine.sql("EXECUTE nations_below USING 10").collect()) == 10


def test_execute_multiple_params_and_exprs(engine):
    engine.sql(
        "PREPARE o_between FROM SELECT count(*) AS n FROM orders "
        "WHERE o_orderkey BETWEEN ? AND ? AND o_orderpriority <> ?"
    )
    got = engine.sql("EXECUTE o_between USING 1 + 1, 50, 'nope'").first()["n"]
    assert got == 49


def test_deallocate_and_missing(engine):
    engine.sql("PREPARE tmp_q FROM SELECT 1 AS x")
    assert engine.sql("EXECUTE tmp_q").first()["x"] == 1
    engine.sql("DEALLOCATE PREPARE tmp_q")
    with pytest.raises(ValueError, match="not found"):
        engine.sql("EXECUTE tmp_q")


def test_describe_input_output(engine):
    engine.sql(
        "PREPARE di FROM SELECT n_name, n_nationkey + ? AS shifted FROM nation WHERE n_nationkey < ?"
    )
    inp = engine.sql("DESCRIBE INPUT di").collect()
    assert [r.position for r in inp] == [0, 1]
    out = {r.column_name: r.type for r in engine.sql("DESCRIBE OUTPUT di").collect()}
    assert out["n_name"] == "string"
    assert "shifted" in out


def test_slow_path_udfs_reachable_from_sql(engine):
    row = engine.sql(
        "SELECT url_encode('a b&c') AS e, url_decode('a+b%26c') AS d, "
        "word_stem('running') AS st"
    ).first()
    assert (row.e, row.d, row.st) == ("a+b%26c", "a b&c", "runn")


def test_show_stats(engine):
    rows = {r.column_name: r for r in engine.sql("SHOW STATS FOR orders").collect()}
    assert rows[None].row_count > 0          # summary row
    ok = rows["o_orderkey"]
    assert ok.distinct_values_count > 0 and ok.nulls_fraction == 0.0
    assert ok.low_value == "0"
    assert rows["o_orderstatus"].data_size > 0


def test_use_and_reset_session(engine, sf_dir):
    engine.register_schema("use_test", sf_dir)
    try:
        engine.sql("USE use_test")
        n = engine.sql("SELECT count(*) AS n FROM use_test.nation").first()["n"]
        assert n > 0
        engine.sql("USE tpch.use_test")  # catalog prefix accepted
    finally:
        engine.spark.catalog.setCurrentDatabase("default")
        engine.spark.sql("DROP DATABASE IF EXISTS use_test CASCADE")
    engine.sql("SET SESSION hash_partition_count = 7")
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    engine.sql("RESET SESSION hash_partition_count")
    assert engine.spark.conf.get("spark.sql.shuffle.partitions") != "7"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.sql("RESET SESSION not_a_property")


def test_explain_statements(engine):
    plain = engine.sql("EXPLAIN SELECT count(*) FROM nation").collect()
    assert plain and "plan" in plain[0][0].lower() or len(plain) > 0
    validated = engine.sql("EXPLAIN (TYPE VALIDATE) SELECT n_name FROM nation").first()
    assert validated["valid"] is True
    analyzed = engine.sql("EXPLAIN ANALYZE SELECT count(*) AS n FROM nation").collect()
    assert any("Aggregate" in r.query_plan for r in analyzed)
    import pytest as _pytest

    with _pytest.raises(Exception):
        engine.sql("EXPLAIN (TYPE VALIDATE) SELECT nope FROM nation").collect()


def test_qualified_table_names(engine, sf_dir):
    engine.register_schema("tiny", sf_dir)
    try:
        direct = engine.sql("SELECT count(*) AS n FROM tiny.orders").first()["n"]
        qualified = engine.sql("SELECT count(*) AS n FROM tpch.tiny.orders").first()["n"]
        bare = engine.sql("SELECT count(*) AS n FROM orders").first()["n"]
        assert direct == qualified == bare > 0
        joined = engine.sql(
            "SELECT count(*) AS n FROM tpch.tiny.orders o "
            "JOIN tpch.tiny.customer c ON o.o_custkey = c.c_custkey"
        ).first()["n"]
        assert joined > 0
    finally:
        engine.spark.sql("DROP DATABASE IF EXISTS tiny CASCADE")


def test_ipaddress_cast_canonicalizes(engine):
    row = engine.sql(
        "SELECT CAST('2001:0db8:0000:0000:0000:0000:0000:0001' AS IPADDRESS) AS v6, "
        "CAST('192.168.001.1' AS IPADDRESS) AS bad4, "
        "CAST('10.0.0.1' AS IPADDRESS) AS v4, "
        "try_cast('not-an-ip' AS IPADDRESS) AS inv"
    ).first()
    assert row.v6 == "2001:db8::1"
    assert row.v4 == "10.0.0.1"
    assert row.bad4 is None  # leading zeros are invalid per inet_pton
    assert row.inv is None


def test_show_session_and_functions(engine):
    props = {r.name for r in engine.sql("SHOW SESSION").collect()}
    assert "join_distribution_type" in props
    fns = {r.function_name: r.implementation for r in engine.sql("SHOW FUNCTIONS").collect()}
    assert len(fns) >= 300
    assert fns["strpos"] == "builtin"
    assert fns["url_encode"] == "pandas_udf"


def test_parameter_count_mismatch(engine):
    engine.sql("PREPARE one_param FROM SELECT ? AS x")
    with pytest.raises(ValueError, match="parameters"):
        engine.sql("EXECUTE one_param USING 1, 2")
    with pytest.raises(ValueError, match="parameters"):
        engine.sql("EXECUTE one_param")
