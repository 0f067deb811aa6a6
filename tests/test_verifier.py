"""The presto-verifier tier (tools/verifier.py) on real query pairs.

Mirrors Validator.java's states: MATCH on equivalent spellings,
MISMATCH with a row diff on genuine divergence, NONDETERMINISTIC when
the control can't reproduce itself, INVALID when the control fails
(the pair is then not chargeable to the test side).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verifier import DEFAULT_PRECISION, QueryPair, results_match, verify_pair


@pytest.fixture(scope="module")
def engine(spark):
    from facebook_presto_spark.engine import PrestoSparkEngine

    return PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)


def test_equivalent_spellings_match(engine):
    r = verify_pair(engine, QueryPair(
        control="SELECT o_orderpriority, count(*) AS c FROM orders "
                "GROUP BY o_orderpriority",
        test="SELECT o_orderpriority, count(*) AS c FROM orders "
             "GROUP BY 1 ORDER BY 1",
    ))
    assert r.state == "MATCH" and r.control_rows == r.test_rows > 0


def test_mismatch_reports_row_diff(engine):
    r = verify_pair(engine, QueryPair(
        control="SELECT count(*) AS c FROM orders",
        test="SELECT count(*) + 1 AS c FROM orders",
    ))
    assert r.state == "MISMATCH"
    assert "Control 1 rows, Test 1 rows" in r.comparison
    assert len(r.changed) == 2  # one REMOVED + one ADDED


def test_nondeterministic_control_detected(engine):
    r = verify_pair(engine, QueryPair(
        control="SELECT rand() AS x",
        test="SELECT 0.5 AS x",
    ))
    assert r.state == "NONDETERMINISTIC"


def test_invalid_control_not_charged_to_test(engine):
    r = verify_pair(engine, QueryPair(
        control="SELECT no_such_column FROM orders",
        test="SELECT 1",
    ))
    assert r.state == "INVALID"


def test_precision_compare_matches_validator():
    # Validator.precisionCompare: doubles equal on N significant digits
    assert results_match([(1.000001,)], [(1.0000010001,)], DEFAULT_PRECISION)
    assert not results_match([(1.0001,)], [(1.0002,)], DEFAULT_PRECISION)
    # nulls and integers compare exactly (columnComparator nullsFirst)
    assert results_match([(None, 3)], [(None, 3)])
    assert not results_match([(None,)], [(0,)])


def test_duckdb_oracle_control(engine):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    )
    r = verify_pair(
        engine,
        QueryPair(control="SELECT count(*) AS c FROM orders",
                  test="SELECT count(*) AS c FROM orders"),
        oracle=lambda sql: con.execute(sql).fetchall(),
    )
    assert r.state == "MATCH"
