"""TPC-H in *Presto-dialect SQL text*, executed through the sqlfront.

The reference's users submit SQL strings (POST /v1/statement →
StatementResource.java:84 → SqlParser.java:45).  These queries prove the
drop-in path: the exact Presto-dialect text — date_add/date_diff unit
strings, strpos, typed literals, approx_distinct, ordinal GROUP BY — is
translated by ``sqlfront.translate`` and planned by Catalyst, and must
hash-match the same DuckDB oracles as the DataFrame-built twins in
``plans/tpch.py``.

Shares the integer-cents determinism design of plans/tpch.py (money sums
in exact integer cents so cross-engine float addition order is moot).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from facebook_presto_spark.catalog import register_views
from facebook_presto_spark.plans.tpch import (
    Q01_SQL,
    Q03_SQL,
    Q04_SQL,
    Q05_SQL,
    Q06_SQL,
    Q10_SQL,
    Q14_SQL,
    Q18_SQL,
    Q22_SQL,
)
from facebook_presto_spark.sqlfront import translate

# Presto-specific integer-cents spelling (identical in Presto and DuckDB).
_C = "CAST(round({}*100) AS BIGINT)"
_CENT_PRICE = _C.format("l_extendedprice")
_CENT_DISC = _C.format("l_discount")
_CENT_QTY = _C.format("l_quantity")
_CENT_TAX = _C.format("l_tax")
_CENT_BAL = _C.format("c_acctbal")

PRESTO_SQL: dict[str, str] = {
    # q01 — pricing summary; text matches the reference's q01.sql shape.
    "prestosql_q01": f"""
        SELECT l_returnflag, l_linestatus,
               sum({_CENT_QTY})/1e2 AS sum_qty,
               sum({_CENT_PRICE})/1e2 AS sum_base_price,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS sum_disc_price,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}) * (100 + {_CENT_TAX}))/1e6 AS sum_charge,
               sum({_CENT_QTY})/count(*)/1e2 AS avg_qty,
               sum({_CENT_PRICE})/count(*)/1e2 AS avg_price,
               sum({_CENT_DISC})/count(*)/1e2 AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    # q03 — shipping priority (join + grouped agg + top-n).
    "prestosql_q03": f"""
        SELECT l_orderkey, o_orderdate,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-06-01'
        JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
        WHERE l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    # q04 — EXISTS semi-join; Presto date_add('day', …) spelling.
    "prestosql_q04": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > date_add('day', 60, o_orderdate)
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    # q05 — 6-way join with the "local supplier" condition.
    "prestosql_q05": f"""
        SELECT n_name,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    # q06 — the reference's benchmark floor; date_add('year', …) + typed DATE.
    "prestosql_q06": f"""
        SELECT sum({_CENT_PRICE} * {_CENT_DISC})/1e4 AS revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < date_add('year', 1, DATE '1997-01-01')
          AND {_CENT_DISC} BETWEEN 5 AND 7 AND l_quantity < 24
    """,
    # q10 — returned-item reporting; ordinal GROUP BY (SqlBase.g4 groupBy).
    "prestosql_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    # q14 — promo revenue (conditional agg over a derived table).
    "prestosql_q14": f"""
        SELECT 1e2 * sum(CASE WHEN p_type = 'PROMO' THEN vol ELSE 0 END) / sum(vol) AS promo_revenue
        FROM (
          SELECT {_CENT_PRICE} * (100 - {_CENT_DISC}) AS vol, p_type
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
        )
    """,
    # q18 — large-volume customer (IN subquery with HAVING).
    "prestosql_q18": f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum({_CENT_QTY})/1e2 AS sum_qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING sum({_CENT_QTY}) > 15000
        )
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    # q22 — global-sales opportunity (scalar subquery + NOT EXISTS anti-join).
    "prestosql_q22": f"""
        SELECT n_name AS cntrycode, count(*) AS numcust,
               sum({_CENT_BAL})/1e2 AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
            SELECT sum({_CENT_BAL})/count(*)/1e2
            FROM customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY 1
        ORDER BY cntrycode
    """,
    # dialect stress: string functions whose Presto spelling differs
    # (StringFunctions.java — strpos→instr, codepoint→ascii).
    "prestosql_strings": """
        SELECT n_name,
               strpos(n_name, 'A') AS pos_a,
               codepoint(substr(n_name, 1, 1)) AS first_cp,
               length(n_name) AS len,
               reverse(lower(n_name)) AS rev_lower,
               concat(n_name, '_', upper(n_name)) AS tagged
        FROM nation
        ORDER BY n_nationkey
    """,
    # dialect stress: MySQL-format date_format, ISO day_of_week, date_diff
    # (DateTimeFunctions.java unit-string signatures).
    "prestosql_datetime": """
        SELECT o_orderkey,
               date_format(o_orderdate, '%Y-%m-%d') AS iso_day,
               day_of_week(o_orderdate) AS isodow,
               date_diff('day', o_orderdate, TIMESTAMP '1998-12-01') AS days_left,
               year(o_orderdate) * 100 + month(o_orderdate) AS yyyymm
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
}


def _runner(sql_text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(translate(sql_text))

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _runner(sql) for name, sql in PRESTO_SQL.items()
}

ORACLE: dict[str, str] = {
    "prestosql_q01": Q01_SQL,
    "prestosql_q03": Q03_SQL,
    "prestosql_q04": Q04_SQL,
    "prestosql_q05": Q05_SQL,
    "prestosql_q06": Q06_SQL,
    "prestosql_q10": Q10_SQL,
    "prestosql_q14": Q14_SQL,
    "prestosql_q18": Q18_SQL,
    "prestosql_q22": Q22_SQL,
    # DuckDB speaks these directly (strpos/ascii are native there).
    "prestosql_strings": """
        SELECT n_name,
               strpos(n_name, 'A') AS pos_a,
               ascii(substr(n_name, 1, 1)) AS first_cp,
               length(n_name) AS len,
               reverse(lower(n_name)) AS rev_lower,
               concat(n_name, '_', upper(n_name)) AS tagged
        FROM nation
        ORDER BY n_nationkey
    """,
    "prestosql_datetime": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
               isodow(o_orderdate) AS isodow,
               date_diff('day', o_orderdate, TIMESTAMP '1998-12-01') AS days_left,
               year(o_orderdate) * 100 + month(o_orderdate) AS yyyymm
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
}
