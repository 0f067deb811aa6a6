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
    Q02_SQL,
    Q03_SQL,
    Q04_SQL,
    Q05_SQL,
    Q06_SQL,
    Q07_SQL,
    Q08_SQL,
    Q09_SQL,
    Q10_SQL,
    Q11_SQL,
    Q12_SQL,
    Q13_SQL,
    Q14_SQL,
    Q15_SQL,
    Q16_SQL,
    Q17_SQL,
    Q18_SQL,
    Q19_SQL,
    Q20_SQL,
    Q21_SQL,
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
    # q02 — minimum-cost supplier (CTE reused for the min-cost filter).
    "prestosql_q02": """
        WITH ps AS (
          SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY 1, 2
        ), joined AS (
          SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
          FROM ps
          JOIN part ON l_partkey = p_partkey AND p_size <= 15 AND p_type = 'STANDARD'
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(unit_cost, 2) AS unit_cost
        FROM joined j
        JOIN (SELECT p_partkey AS mc_partkey, min(unit_cost) AS min_cost
              FROM joined GROUP BY 1) m
          ON j.p_partkey = m.mc_partkey AND j.unit_cost = m.min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    # q07 — volume shipping between two nations (dual-aliased nation join).
    "prestosql_q07": f"""
        SELECT supp_nation, cust_nation, l_year, sum(rev)/1e4 AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 {_CENT_PRICE} * (100 - {_CENT_DISC}) AS rev
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    # q08 — market share (8-way join, conditional share aggregation).
    "prestosql_q08": f"""
        SELECT o_year,
               sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) / sum(vol) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 {_CENT_PRICE} * (100 - {_CENT_DISC}) AS vol,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    # q09 — product-type profit (LIKE filter + 5-way join + ordinal GROUP BY).
    "prestosql_q09": f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    # q11 — important stock (HAVING vs scalar-subquery threshold).
    "prestosql_q11": f"""
        WITH base AS (
          SELECT l_partkey, {_CENT_PRICE} * CAST(l_quantity AS BIGINT) AS val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_5'
        )
        SELECT l_partkey, CAST(sum(val) AS BIGINT)/1e2 AS part_value
        FROM base
        GROUP BY l_partkey
        HAVING CAST(sum(val) AS BIGINT) > (SELECT CAST(sum(val) AS BIGINT) FROM base) * 1e-3
        ORDER BY part_value DESC, l_partkey
    """,
    # q12 — shipping modes (conditional counts).
    "prestosql_q12": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    # q13 — customer order-count distribution (outer join + double agg).
    "prestosql_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    # q15 — top supplier (CTE + scalar-subquery max).
    "prestosql_q15": f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum({_CENT_PRICE} * (100 - {_CENT_DISC})) AS rev_int
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, CAST(rev_int AS BIGINT)/1e4 AS total_revenue
        FROM revenue JOIN supplier ON supplier_no = s_suppkey
        WHERE rev_int = (SELECT max(rev_int) FROM revenue)
        ORDER BY s_suppkey
    """,
    # q16 — parts/supplier relationship (NOT IN subquery + count distinct).
    "prestosql_q16": """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 14, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    # q17 — small-quantity revenue (join vs per-part average).
    "prestosql_q17": f"""
        SELECT sum({_CENT_PRICE})/1e2/7.0e0 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
        JOIN (
          SELECT l_partkey AS aq_partkey,
                 sum({_CENT_QTY})/count(*)/1e2 AS avg_qty
          FROM lineitem GROUP BY 1
        ) aq ON l_partkey = aq_partkey
        WHERE l_quantity < 2e-1 * avg_qty
    """,
    # q19 — discounted revenue (disjunction of conjunctions; pushdown stress).
    "prestosql_q19": f"""
        SELECT sum({_CENT_PRICE} * (100 - {_CENT_DISC}))/1e4 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    # q20 — potential part promotion (nested IN with grouped HAVING).
    "prestosql_q20": f"""
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red %'
            AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING sum({_CENT_QTY}) > 5000
        )
        ORDER BY s_name
    """,
    # q21 — suppliers who kept orders waiting (correlated EXISTS +
    # NOT EXISTS — the hardest decorrelation shape, via date_add).
    "prestosql_q21": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
        WHERE l1.l_shipdate > date_add('day', 60, o_orderdate)
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > date_add('day', 60, o_orderdate)
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
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
    "prestosql_q02": Q02_SQL,
    "prestosql_q03": Q03_SQL,
    "prestosql_q04": Q04_SQL,
    "prestosql_q05": Q05_SQL,
    "prestosql_q06": Q06_SQL,
    "prestosql_q07": Q07_SQL,
    "prestosql_q08": Q08_SQL,
    "prestosql_q09": Q09_SQL,
    "prestosql_q10": Q10_SQL,
    "prestosql_q11": Q11_SQL,
    "prestosql_q12": Q12_SQL,
    "prestosql_q13": Q13_SQL,
    "prestosql_q14": Q14_SQL,
    "prestosql_q15": Q15_SQL,
    "prestosql_q16": Q16_SQL,
    "prestosql_q17": Q17_SQL,
    "prestosql_q18": Q18_SQL,
    "prestosql_q19": Q19_SQL,
    "prestosql_q20": Q20_SQL,
    "prestosql_q21": Q21_SQL,
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
