"""The reference's literal benchmark SQL analyzes end-to-end.

Reads the actual 22 query files the reference benchmarks with
(presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/q*.sql),
substitutes the benchto catalog placeholders, translates the Presto
dialect, and fully analyzes each against the standard TPC-H schema
(empty views — resolution and type-checking without execution).  This is
the drop-in proof at the SQL-text level: a reference user's exact query
corpus plans on this engine unchanged.
"""

from __future__ import annotations

import glob

import pytest

from facebook_presto_spark.sqlfront import translate

REF_DIR = "/root/reference/presto-benchto-benchmarks/src/main/resources/sql/presto/tpch"
CASES = sorted(glob.glob(f"{REF_DIR}/q*.sql"))

# benchto TPC-H schema: unprefixed column names
TPCH_SCHEMAS = {
    "region": "regionkey bigint, name string, comment string",
    "nation": "nationkey bigint, name string, regionkey bigint, comment string",
    "supplier": (
        "suppkey bigint, name string, address string, nationkey bigint, "
        "phone string, acctbal double, comment string"
    ),
    "customer": (
        "custkey bigint, name string, address string, nationkey bigint, "
        "phone string, acctbal double, mktsegment string, comment string"
    ),
    "part": (
        "partkey bigint, name string, mfgr string, brand string, type string, "
        "size int, container string, retailprice double, comment string"
    ),
    "partsupp": (
        "partkey bigint, suppkey bigint, availqty int, supplycost double, "
        "comment string"
    ),
    "orders": (
        "orderkey bigint, custkey bigint, orderstatus string, totalprice double, "
        "orderdate date, orderpriority string, clerk string, shippriority int, "
        "comment string"
    ),
    "lineitem": (
        "orderkey bigint, partkey bigint, suppkey bigint, linenumber int, "
        "quantity double, extendedprice double, discount double, tax double, "
        "returnflag string, linestatus string, shipdate date, commitdate date, "
        "receiptdate date, shipinstruct string, shipmode string, comment string"
    ),
}


@pytest.fixture(scope="module")
def tpch_views(spark):
    for name, schema in TPCH_SCHEMAS.items():
        spark.createDataFrame([], schema).createOrReplaceTempView(name)
    yield
    for name in TPCH_SCHEMAS:
        spark.catalog.dropTempView(name)


def _load(path: str) -> str:
    sql = open(path).read()
    # benchto placeholders: "${database}"."${schema}"."${prefix}tbl" → "tbl"
    sql = sql.replace('"${database}"."${schema}"."${prefix}', '"')
    return sql.strip().rstrip(";")


@pytest.mark.parametrize("path", CASES, ids=[p.rsplit("/", 1)[1][:-4] for p in CASES])
def test_reference_query_analyzes(spark, tpch_views, path):
    spark_sql = translate(_load(path))
    df = spark.sql(spark_sql)
    assert len(df.schema.fields) > 0  # full analysis (resolution + typing)


def test_sketch_sql_matches_dataframe_twins(spark):
    """The SQL-path sketch surface and the Column-API twins share one
    expression tree — same inputs must give identical results."""
    from facebook_presto_spark.engine import PrestoSparkEngine
    from facebook_presto_spark.functions import call
    from pyspark.sql import functions as F

    eng = PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    sql = eng.sql(
        "SELECT o_orderpriority AS p, cardinality(make_set_digest(o_custkey)) AS c "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ).collect()
    dfr = (
        orders.groupBy(F.col("o_orderpriority").alias("p"))
        .agg(call("cardinality_setdigest", call("make_set_digest", "o_custkey")).alias("c"))
        .orderBy("p")
        .collect()
    )
    got, want = [tuple(r) for r in sql], [tuple(r) for r in dfr]
    assert got == want, f"SQL path {got} != DataFrame path {want}"

    sql_q = eng.sql(
        "SELECT value_at_quantile(qdigest_agg(o_orderkey), 0.5) AS v FROM orders"
    ).collect()[0].v
    dfr_q = (
        orders.agg(
            call("value_at_quantile", call("qdigest_agg", "o_orderkey"), 0.5).alias("v")
        ).collect()[0].v
    )
    assert sql_q == dfr_q, f"SQL {sql_q} != DataFrame {dfr_q}"


def test_for_dir_recovers_shadowed_views(spark):
    """A same-name temp view with a DIFFERENT schema (the product-test
    fixtures register an unprefixed `orders`) must not survive
    re-registration — the memo validates schemas, not mere existence.
    This was a real resolution bug: the full suite's fixture shadowing
    made a later engine silently read the impostor table."""
    from facebook_presto_spark.engine import PrestoSparkEngine

    PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)
    spark.createDataFrame(
        [(1, "x")], "orderkey: long, clerk: string"
    ).createOrReplaceTempView("orders")
    eng = PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)
    rows = eng.sql("SELECT count(*) AS n FROM orders").collect()
    assert rows[0].n == 1500  # the sf0.001 table, not the impostor
