"""Bucketed tables → co-located (exchange-free) joins.

Reference: Hive-connector bucketing (presto-hive HiveTableProperties
bucketed_by/bucket_count) and grouped execution (execution/Lifespan.java,
SystemSessionProperties.java:61-62) let Presto join bucket-by-bucket with
no redistribution.  Spark's equivalent is bucketBy + sort-merge join:
both sides bucketed on the join key with the same count plan with no
Exchange — this suite asserts that plan shape, which is the property that
holds at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.ddl import create_bucketed_table
from facebook_presto_spark.plans.tpch import _t


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    create_bucketed_table(
        spark, "b_orders", orders, bucket_by=["o_orderkey"], bucket_count=8,
        sort_by=["o_orderkey"], mode="overwrite",
    )
    create_bucketed_table(
        spark, "b_lineitem", lineitem, bucket_by=["l_orderkey"], bucket_count=8,
        sort_by=["l_orderkey"], mode="overwrite",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _joined(spark):
    return (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # force the sort-merge path (a broadcast join would trivially skip the
    # exchange and prove nothing about co-location)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan, plan
        # no shuffle on either join input: the only allowed Exchange is the
        # one AFTER the join for the groupBy
        before_agg = plan.split("HashAggregate")[-1]
        assert "Exchange" not in before_agg, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed):
    bucketed_rows = {(r.o_orderstatus, r.n) for r in _joined(spark).collect()}
    plain = (
        _t(spark, sf_dir, "lineitem")
        .join(_t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert bucketed_rows == {(r.o_orderstatus, r.n) for r in plain.collect()}
