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


def test_zip_pads_with_nulls(engine):
    got = _one(engine, "SELECT zip(ARRAY[1,2,3], ARRAY['a','b'])")
    assert [tuple(r) for r in got] == [(1, "a"), (2, "b"), (3, None)]
    assert _one(
        engine,
        "SELECT transform(zip(ARRAY[1,2], ARRAY[10,20]), r -> r.field0 + r.field1)",
    ) == [11, 22]


def test_json_size_and_contains(engine):
    assert _one(engine, """SELECT json_size('{"a": [1,2,3]}', '$.a')""") == 3
    assert _one(engine, """SELECT json_size('{"a": {"b":1}}', '$.a')""") == 1
    assert _one(engine, """SELECT json_size('{"a": 5}', '$.a')""") == 0
    assert _one(engine, """SELECT json_size('{"a": 5}', '$.zz')""") is None
    assert _one(engine, "SELECT json_array_contains('[1,2,3]', 2)") is True
    assert _one(engine, """SELECT json_array_contains('["x","y"]', 'y')""") is True


def test_varchar_char_cast_semantics(engine):
    assert _one(engine, "SELECT CAST('abcdef' AS VARCHAR(3))") == "abc"
    assert _one(engine, "SELECT CAST('ab' AS CHAR(4))") == "ab  "


def test_array_agg_order_by(engine):
    assert _one(
        engine, "SELECT array_agg(x ORDER BY x DESC) FROM (VALUES 3, 1, 2) t(x)"
    ) == [3, 2, 1]
    assert _one(
        engine,
        "SELECT array_agg(x ORDER BY y) FROM (VALUES ('b', 2), ('a', 1), ('c', 0)) t(x, y)",
    ) == ["c", "a", "b"]


def test_if_two_arg_and_format(engine):
    assert _one(engine, "SELECT if(1 > 2, 'yes')") is None
    assert _one(engine, "SELECT format('%s-%d', 'x', 7)") == "x-7"


def test_n_variant_aggregates(engine):
    assert _one(engine, "SELECT min(x, 2) FROM (VALUES 5, 1, 3) t(x)") == [1, 3]
    assert _one(engine, "SELECT max(x, 2) FROM (VALUES 5, 1, 3) t(x)") == [5, 3]
    assert _one(
        engine, "SELECT max_by(n, v, 2) FROM (VALUES ('a', 1), ('b', 3), ('c', 2)) t(n, v)"
    ) == ["b", "c"]
    assert _one(
        engine, "SELECT min_by(n, v, 1) FROM (VALUES ('a', 1), ('b', 3)) t(n, v)"
    ) == ["a"]


def test_map_shaped_aggregates(engine):
    assert _one(
        engine, "SELECT histogram(x) FROM (VALUES 'a', 'b', 'a') t(x)"
    ) == {"a": 2, "b": 1}
    got = _one(
        engine,
        "SELECT multimap_agg(k, v) FROM (VALUES ('x', 1), ('x', 2), ('y', 3)) t(k, v)",
    )
    assert got == {"x": [1, 2], "y": [3]}
    got = _one(
        engine,
        "SELECT map_union(m) FROM (VALUES map(ARRAY['a'], ARRAY[1]), map(ARRAY['b'], ARRAY[2])) t(m)",
    )
    assert got == {"a": 1, "b": 2}


def test_reduce_agg(engine):
    assert _one(
        engine,
        "SELECT reduce_agg(x, 0, (a, b) -> a + b, (a, b) -> a + b) FROM (VALUES 1, 2, 3) t(x)",
    ) == 6


def test_standalone_unnest(engine):
    rows = engine.sql(
        "SELECT k, v FROM UNNEST(map(ARRAY['a','b'], ARRAY[1,2])) AS t(k, v) ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [("a", 1), ("b", 2)]
    rows = engine.sql(
        "SELECT x, i FROM UNNEST(ARRAY['p','q']) WITH ORDINALITY AS t(x, i) ORDER BY 2"
    ).collect()
    assert [tuple(r) for r in rows] == [("p", 1), ("q", 2)]


def test_extract_iso_fields(engine):
    # 2024-03-05 is a Tuesday: Presto DOW is ISO (Mon=1) → 2
    assert _one(engine, "SELECT extract(DOW FROM DATE '2024-03-05')") == 2
    assert _one(engine, "SELECT extract(DAY_OF_WEEK FROM DATE '2024-03-10')") == 7
    # 2021-01-01 belongs to ISO week 53 of 2020
    assert _one(engine, "SELECT extract(YOW FROM DATE '2021-01-01')") == 2020


def test_ngrams(engine):
    assert _one(engine, "SELECT ngrams(ARRAY['a','b','c'], 2)") == [["a", "b"], ["b", "c"]]
    assert _one(engine, "SELECT ngrams(ARRAY['a'], 3)") == [["a"]]


def test_ctas_with_table_properties(engine):
    engine.sql(
        "CREATE TABLE __sc_bkt WITH (format = 'PARQUET', "
        "bucketed_by = ARRAY['k'], bucket_count = 4, "
        "partitioned_by = ARRAY['p']) AS "
        "SELECT n_nationkey AS k, n_name AS v, n_regionkey AS p FROM nation"
    ).collect()
    try:
        assert _one(engine, "SELECT count(*) FROM __sc_bkt") == 25
        # the engine renders Presto-dialect DDL (ShowQueriesRewrite),
        # so the layout comes back as the WITH table-property clause
        ddl = engine.sql("SHOW CREATE TABLE __sc_bkt").first()[0]
        assert "bucketed_by = ARRAY['k']" in ddl
        assert "partitioned_by = ARRAY['p']" in ddl
        assert "bucket_count = 4" in ddl
    finally:
        engine.sql("DROP TABLE IF EXISTS __sc_bkt").collect()


def test_create_view_statement(engine):
    engine.sql("CREATE VIEW __sc_view AS SELECT count(*) AS c FROM region")
    try:
        assert _one(engine, "SELECT c FROM __sc_view") == 5
    finally:
        engine.sql("DROP VIEW __sc_view")


def test_sql_standard_string_forms(engine):
    assert _one(engine, "SELECT substring('abcdef' FROM 2 FOR 3)") == "bcd"
    assert _one(engine, "SELECT trim(BOTH 'x' FROM 'xxaxx')") == "a"
    assert _one(engine, "SELECT X'1F2A'") == bytearray(b"\x1f*")


def test_ansi_trim_spellings(engine):
    # SqlBase.g4 trim production: [BOTH|LEADING|TRAILING] [chars] FROM s
    cases = [
        ("trim(LEADING 'x' FROM 'xxaxx')", "axx"),
        ("trim(TRAILING 'x' FROM 'xxaxx')", "xxa"),
        ("trim(BOTH FROM '  a  ')", "a"),
        ("trim(LEADING FROM '  a  ')", "a  "),
        ("trim(TRAILING FROM '  a  ')", "  a"),
        ("trim(FROM '  a  ')", "a"),
        ("trim('x' FROM 'xxaxx')", "a"),
        ("trim(BOTH 'xy' FROM 'yxayx')", "a"),
        # plain forms still strip the full Character.isWhitespace set
        ("trim(' a ')", "a"),
        ("trim(' a')", " a"),  # NBSP is NOT Java whitespace
    ]
    for expr, want in cases:
        assert _one(engine, f"SELECT {expr}") == want, expr


def test_typed_literals(engine):
    import decimal

    assert _one(engine, "SELECT DECIMAL '1.23' + 1") == decimal.Decimal("2.23")
    assert _one(engine, "SELECT date '2024-01-02'") == datetime.date(2024, 1, 2)


def test_sequence_over_dates(engine):
    got = _one(engine, "SELECT sequence(DATE '2024-01-01', DATE '2024-01-03', INTERVAL '1' DAY)")
    assert got == [datetime.date(2024, 1, d) for d in (1, 2, 3)]


def test_array_sort_with_comparator(engine):
    got = _one(
        engine,
        "SELECT array_sort(ARRAY[3,1,2], (x, y) -> CASE WHEN x < y THEN 1 WHEN x > y THEN -1 ELSE 0 END)",
    )
    assert got == [3, 2, 1]


def test_row_comparison_and_tuple_in(engine):
    assert _one(engine, "SELECT ROW(1, 'a') = ROW(1, 'a')") is True
    got = _one(
        engine,
        "SELECT count(*) FROM orders WHERE (o_orderkey, o_custkey) IN "
        "(SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey < 10)",
    )
    assert got == 10


def test_in_list_null_semantics(engine):
    assert _one(engine, "SELECT 3 IN (1, 2, NULL)") is None
    assert _one(engine, "SELECT 1 IN (1, NULL)") is True


def test_distinct_agg_with_filter(engine):
    got = _one(
        engine,
        "SELECT count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000) FROM orders",
    )
    assert got > 0


def test_lateral_subquery(engine):
    rows = engine.sql(
        "SELECT r_name, t.c FROM region, LATERAL "
        "(SELECT count(*) AS c FROM nation WHERE n_regionkey = r_regionkey) t "
        "ORDER BY r_name"
    ).collect()
    assert len(rows) == 5 and all(r.c == 5 for r in rows)


def test_datetime_function_family(engine):
    assert _one(
        engine, "SELECT format_datetime(TIMESTAMP '2024-03-05 10:30:00', 'yyyy-MM-dd HH:mm')"
    ) == "2024-03-05 10:30"
    assert _one(engine, "SELECT to_milliseconds(INTERVAL '2' MINUTE)") == 120000
    assert _one(engine, "SELECT millisecond(TIMESTAMP '2024-01-01 00:00:00.123')") == 123
    assert _one(engine, "SELECT localtimestamp IS NOT NULL") is True


def test_normalize_and_width_bucket(engine):
    # U+212B ANGSTROM SIGN normalizes to U+00C5 under NFC
    assert _one(engine, "SELECT normalize('Å')") == "Å"
    assert _one(engine, "SELECT width_bucket(3.5e0, ARRAY[1e0, 2e0, 5e0])") == 2
    assert _one(engine, "SELECT width_bucket(0.5e0, ARRAY[1e0, 2e0])") == 0


def test_approx_percentile_array_form(engine):
    got = _one(
        engine,
        "SELECT approx_percentile(o_totalprice, ARRAY[0.25e0, 0.75e0]) FROM orders",
    )
    assert len(got) == 2 and got[0] < got[1]
