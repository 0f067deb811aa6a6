"""Drop-in surface spot-checks: documentation-style Presto expressions a
migrating user would paste first, through engine.sql, with exact results.
(Complement to the oracle-differential and golden-corpus tiers — these
pin the behaviors, not just run them.)"""

from __future__ import annotations

import datetime

import pytest

from facebook_presto_spark.engine import PrestoSparkEngine


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def _one(engine, sql):
    row = engine.sql(sql).first()
    return row[0]


def test_array_and_string_concat_operator(engine):
    assert _one(engine, "SELECT ARRAY[1,2] || ARRAY[3]") == [1, 2, 3]
    assert _one(engine, "SELECT 'v' || CAST(7 AS VARCHAR)") == "v7"


def test_values_inline_table(engine):
    rows = engine.sql(
        "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t (id, name) ORDER BY id"
    ).collect()
    assert [(r.id, r.name) for r in rows] == [(1, "a"), (2, "b")]


def test_interval_month_end_clamp(engine):
    assert _one(engine, "SELECT DATE '2024-01-31' + INTERVAL '1' MONTH") == datetime.date(2024, 2, 29)


def test_row_type_cast_and_field_access(engine):
    assert _one(engine, "SELECT CAST(ROW(1, 'x') AS ROW(a BIGINT, b VARCHAR)).a") == 1


def test_lambda_compositions(engine):
    assert _one(
        engine,
        "SELECT reduce(filter(sequence(1,10), x -> x % 2 = 0), 0, (s,x) -> s + x, s -> s)",
    ) == 30
    assert _one(
        engine, "SELECT transform(ARRAY[1,2,3], x -> transform(ARRAY[x], y -> y * 2))"
    ) == [[2], [4], [6]]


def test_position_and_mysql_date_format(engine):
    assert _one(engine, "SELECT position('b' IN 'abc')") == 2
    assert _one(
        engine,
        "SELECT date_format(TIMESTAMP '2024-03-05 10:30:00', '%Y-%m-%d %H:%i')",
    ) == "2024-03-05 10:30"


def test_is_distinct_from(engine):
    row = engine.sql(
        "SELECT 1 IS DISTINCT FROM NULL AS a, NULL IS NOT DISTINCT FROM NULL AS b"
    ).first()
    assert (row.a, row.b) == (True, True)


def test_grouping_function(engine):
    rows = engine.sql(
        "SELECT o_orderstatus, grouping(o_orderstatus) AS g FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), ()) ORDER BY g, o_orderstatus"
    ).collect()
    assert rows[-1].g == 1 and all(r.g == 0 for r in rows[:-1])


def test_exists_in_projection(engine):
    assert _one(engine, "SELECT EXISTS (SELECT 1 FROM region)") is True


def test_approx_percentile_array_form(engine):
    got = _one(
        engine,
        "SELECT approx_percentile(o_totalprice, ARRAY[0.25e0, 0.75e0]) FROM orders",
    )
    assert len(got) == 2 and got[0] < got[1]
