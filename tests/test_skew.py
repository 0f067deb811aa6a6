"""Skew primitives (plans/skew.py): correctness + plan shape.

The salted collect must produce identical results for any salt count
(determinism = array_sort at merge), and its physical plan must contain
TWO aggregate phases keyed differently (the whole point: a hot key's
elements flow through `salt` reducers before merging).  The replicated
join must equal the plain join row-for-row.
"""

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.plans import skew


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [(0, f"v{i}") for i in range(900)] + [
        (k, f"t{k}_{i}") for k in range(1, 11) for i in range(10)
    ]
    return spark.createDataFrame(rows, "k int, v string")


def test_salted_collect_matches_plain(spark, skewed):
    plain = {
        r["k"]: sorted(r["vs"])
        for r in skewed.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    for salt in (1, 4, 16):
        got = {
            r["k"]: list(r["values"])
            for r in skew.salted_collect(skewed, "k", "v", salt=salt).collect()
        }
        assert got == plain, f"salt={salt}"


def test_salted_collect_plan_has_two_aggregate_phases(spark, skewed):
    df = skew.salted_collect(skewed, "k", "v", salt=8)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # two logical Aggregates: (k, __salt) partials then the k merge
    assert plan.count("Aggregate") >= 2
    assert "__salt" in plan


def test_replicated_skew_join_matches_plain_join(spark, skewed):
    dims = spark.createDataFrame(
        [(k, f"name{k}") for k in range(11)], "k int, name string"
    )
    plain = sorted(
        tuple(r) for r in skewed.join(dims, "k").select("k", "v", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.replicated_skew_join(skewed, dims, "k", salt=4)
        .select("k", "v", "name")
        .collect()
    )
    assert salted == plain


def test_replicated_skew_join_left_outer_matches(spark, skewed):
    dims = spark.createDataFrame(
        [(k, f"name{k}") for k in range(5)], "k int, name string"
    )
    plain = sorted(
        tuple(r)
        for r in skewed.join(dims, "k", "left").select("k", "v", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.replicated_skew_join(skewed, dims, "k", salt=4, how="left")
        .select("k", "v", "name")
        .collect()
    )
    assert salted == plain


def test_replicated_skew_join_rejects_build_preserving_types(spark, skewed):
    import pytest

    dims = spark.createDataFrame([(1, "a")], "k int, name string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="not supported"):
            skew.replicated_skew_join(skewed, dims, "k", how=how)
