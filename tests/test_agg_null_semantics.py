"""Aggregate NULL/empty-input semantics vs the reference (round 10).

The reference's per-aggregate input channel metadata decides whether
NULL inputs reach the accumulator, and every accumulator appends SQL
NULL — never an empty container — when it saw no input:

* array_agg keeps NULL elements (arrayagg/ArrayAggregationFunction
  .java:120 NULLABLE_BLOCK_INPUT_CHANNEL) and is NULL over zero rows
  (output:135);
* map_agg / map_union skip NULL keys, keep the FIRST value per key
  (KeyValuePairs.add:113 inserts only when !keyExists), keep NULL
  values, NULL when empty (MapAggregationFunction.java:109-110,
  MapUnionAggregation.java:107-118);
* multimap_agg skips NULL keys, keeps NULL values
  (MultimapAggregationFunction.java:115-116);
* histogram skips NULLs (Histogram.java:117) and is NULL when empty;
* arbitrary skips NULLs (ArbitraryAggregationFunction.java:154);
* min(x,n)/max(x,n) are NULL — not [] — over zero non-null inputs
  (AbstractMinMaxNAggregationFunction.output:148);
* checksum CONSUMES nulls (ChecksumAggregationFunction.java:104
  NULLABLE channel) — checksum of a NULL row differs from no rows.

This battery was written after a real bug in this class (min(x,n)
FILTER excluding a whole group returned [] where the reference appends
null) and pins both the SQL path and the Column registry path.
"""

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.engine import PrestoSparkEngine
from facebook_presto_spark.functions import call


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


@pytest.fixture(scope="module")
def t(spark):
    rows = [
        (0, None, None, None),
        (0, None, None, None),
        (1, 5, "a", 50),
        (1, None, "a", 51),
        (1, 7, None, 52),
        (1, 5, "b", None),
    ]
    df = spark.createDataFrame(rows, "g int, x int, k string, v int") \
        .repartition(3)
    df.createOrReplaceTempView("aggnull_t")
    return df


def _by_g(eng, sql):
    return {r.g: r.r for r in eng.sql(
        f"SELECT g, {sql} AS r FROM aggnull_t GROUP BY g").collect()}


def test_array_agg_keeps_nulls_and_null_on_empty(eng, t):
    got = _by_g(eng, "array_agg(x)")
    assert sorted(got[1], key=lambda v: (v is None, v)) == [5, 5, 7, None]
    assert got[0] == [None, None]  # all-NULL group: kept, not dropped
    # zero rows (global over empty input): NULL, not []
    row = eng.sql("SELECT array_agg(x) AS r FROM aggnull_t WHERE g = 9") \
        .collect()[0]
    assert row.r is None
    # Column path agrees
    col = {r.g: r.r for r in t.groupBy("g").agg(
        call("array_agg", F.col("x")).alias("r")).collect()}
    assert col[0] == [None, None]


def test_arbitrary_skips_nulls(eng, t):
    got = _by_g(eng, "arbitrary(x)")
    assert got[1] in (5, 7)  # never None: nulls skipped
    assert got[0] is None
    got2 = _by_g(eng, "any_value(x)")
    assert got2[1] in (5, 7)


def test_map_agg_null_and_duplicate_keys(eng, t):
    got = _by_g(eng, "map_agg(k, v)")
    # NULL key (row 52) skipped; duplicate key 'a' keeps the FIRST value
    assert set(got[1].keys()) == {"a", "b"}
    assert got[1]["b"] is None  # NULL values kept
    assert got[1]["a"] in (50, 51)  # first-seen (order within group)
    assert got[0] is None  # all keys NULL → empty state → NULL
    row = eng.sql("SELECT map_agg(k, v) AS r FROM aggnull_t WHERE g = 9") \
        .collect()[0]
    assert row.r is None


def test_map_union_first_wins_and_null_on_empty(eng, spark):
    spark.sql("SELECT 1 AS i, map('a', 1) AS m UNION ALL "
              "SELECT 2, map('a', 2)").createOrReplaceTempView("mu_t")
    got = eng.sql("SELECT map_union(m) AS r FROM mu_t").collect()[0].r
    assert set(got) == {"a"} and got["a"] in (1, 2)
    row = eng.sql("SELECT map_union(m) AS r FROM mu_t WHERE i = 9") \
        .collect()[0]
    assert row.r is None


def test_multimap_agg_null_keys_skipped(eng, t):
    got = _by_g(eng, "multimap_agg(k, v)")
    assert set(got[1].keys()) == {"a", "b"}
    assert sorted(got[1]["a"]) == [50, 51] and got[1]["b"] == [None]
    assert got[0] is None


def test_histogram_null_on_empty(eng, t):
    got = _by_g(eng, "histogram(x)")
    assert got[1] == {5: 2, 7: 1}
    assert got[0] is None


def test_min_max_n_null_on_empty(eng, t):
    got = _by_g(eng, "max(x, 2)")
    assert got[1] == [7, 5]
    assert got[0] is None  # [] would diverge (output:148 appendNull)
    row = eng.sql(
        "SELECT min(x, 3) FILTER (WHERE x > 100) AS r, max(x, 3) AS m "
        "FROM aggnull_t").collect()[0]
    assert row.r is None and row.m == [7, 5, 5]


def test_checksum_consumes_nulls(eng, t):
    # a NULL row must CHANGE the checksum (NULLABLE input channel):
    # checksum over g=1's x (5,NULL,7,5) != checksum over only non-nulls
    a = eng.sql("SELECT checksum(x) AS r FROM aggnull_t WHERE g = 1") \
        .collect()[0].r
    b = eng.sql("SELECT checksum(x) AS r FROM aggnull_t "
                "WHERE g = 1 AND x IS NOT NULL").collect()[0].r
    assert a != b


def test_count_and_sum_baselines(eng, t):
    got = _by_g(eng, "count(x)")
    assert got == {0: 0, 1: 3}
    got = _by_g(eng, "sum(x)")
    assert got == {0: None, 1: 17}


def test_filter_splices_onto_every_collection_site(eng, spark):
    """FILTER over the collection-composed aggregates (map_agg,
    histogram, multimap_agg repeat their collected array inside the
    rewrite): the mask must reach EVERY collect_list site, and an
    all-excluded group yields NULL, matching the reference's per-arm
    input mask + empty-state null."""
    spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11), (1, None, 12), (1, "b", None),
         (2, "c", 1)],
        "g int, k string, v int").createOrReplaceTempView("aggnull_f")
    rows = {r.g: r for r in eng.sql(
        "SELECT g, map_agg(k, v) FILTER (WHERE v IS NOT NULL OR k = 'b') "
        "AS m, array_agg(v) FILTER (WHERE v > 10) AS a, "
        "histogram(k) FILTER (WHERE v > 10) AS h "
        "FROM aggnull_f GROUP BY g").collect()}
    assert rows[1].m == {"a": 10, "b": None}  # first-wins, null-key skip
    assert rows[1].a == [11, 12] and rows[1].h == {"a": 1}
    assert rows[2].m == {"c": 1}
    assert rows[2].a is None and rows[2].h is None  # empty → NULL


def test_min_max_by_n_skips_null_keys(eng, spark):
    """min_by/max_by(x, y, n): rows with a NULL ordering key never enter
    the heap (AbstractMinMaxBy input:169 non-nullable key channel) —
    Spark's ascending sort_array would otherwise rank them FIRST; zero
    retained rows → NULL."""
    spark.createDataFrame(
        [("v1", None), ("v2", 5), ("v3", 3), (None, 1)],
        "x string, y int").createOrReplaceTempView("aggnull_mb")
    r = eng.sql(
        "SELECT min_by(x, y) AS a, max_by(x, y) AS b, "
        "min_by(x, y, 2) AS an, max_by(x, y, 2) AS bn, "
        "min_by(x, y, 2) FILTER (WHERE y > 99) AS empty "
        "FROM aggnull_mb").collect()[0]
    assert r.a is None and r.b == "v2"  # y=1 row carries a NULL value
    assert r.an == [None, "v3"] and r.bn == ["v2", "v3"]
    assert r.empty is None
    # Column path agrees
    from pyspark.sql import functions as F
    df = spark.table("aggnull_mb")
    row = df.agg(call("min_by", F.col("x"), F.col("y"), 2).alias("an"),
                 call("max_by", F.col("x"), F.col("y"), 2).alias("bn"),
                 call("min", F.col("y"), 9).alias("mn")).collect()[0]
    assert row.an == [None, "v3"] and row.bn == ["v2", "v3"]
    assert row.mn == [1, 3, 5]


def test_greatest_least_null_on_any_null(eng, spark):
    """greatest/least return NULL when ANY argument is NULL
    (AbstractGreatestLeast.java:118 RETURN_NULL_ON_NULL); Spark's
    built-ins skip NULL arguments instead — both API paths guard."""
    r = eng.sql("SELECT greatest(1, NULL) AS a, least(2, NULL) AS b, "
                "greatest(1, 2, 3) AS c, least(4, 2, 9) AS d").collect()[0]
    assert r.a is None and r.b is None and r.c == 3 and r.d == 2
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, None)], "x int, y int")
    row = df.select(
        call("greatest", F.col("x"), F.col("y")).alias("g"),
        call("least", F.col("x"), F.lit(0)).alias("l")).collect()[0]
    assert row.g is None and row.l == 0


def test_map_concat_last_wins(eng, spark):
    """map_concat: the value from the LAST map containing a key wins
    (MapConcatFunction.java:123-170 walks maps back-to-front); Spark's
    built-in raises DUPLICATED_MAP_KEY on overlap instead."""
    r = eng.sql(
        "SELECT map_concat(map(array[1,2], array['a','b']), "
        "map(array[2,3], array['B','c'])) AS m, "
        "map_concat(map(array[1], array['x']), "
        "map(array[1], array['y']), map(array[1], array['z'])) AS m3"
    ).collect()[0]
    assert r.m == {1: "a", 2: "B", 3: "c"}
    assert r.m3 == {1: "z"}
    from pyspark.sql import functions as F
    df = spark.range(1).select(
        F.create_map(F.lit("k"), F.lit(1)).alias("a"),
        F.create_map(F.lit("k"), F.lit(2)).alias("b"))
    row = df.select(call("map_concat", F.col("a"), F.col("b"))
                    .alias("m")).collect()[0]
    assert row.m == {"k": 2}


def test_array_min_max_null_element(eng, spark):
    """array_min/array_max return NULL when the array CONTAINS a null
    element (ArrayMinMaxUtils.java:41); Spark's built-ins skip nulls."""
    r = eng.sql("SELECT array_min(array[2, NULL, 1]) AS a, "
                "array_max(array[2, NULL]) AS b, "
                "array_min(array[3, 1]) AS c").collect()[0]
    assert r.a is None and r.b is None and r.c == 1
    from pyspark.sql import functions as F
    df = spark.range(1).select(
        F.array(F.lit(1), F.lit(None).cast("int")).alias("arr"))
    assert df.select(call("array_min", F.col("arr")).alias("m")) \
        .collect()[0].m is None
