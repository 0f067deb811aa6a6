"""Two-phase geometry aggregates (round 9).

The reference's GeometryUnionAgg.java / ConvexHullAggregation.java keep
bounded per-task accumulator state; sqlfront/translate.
_pass_two_phase_geo_agg gives engine.sql the same property by respelling
qualifying aggregate blocks as (keys…, spark_partition_id()) partials
followed by a per-key merge.  This suite pins:

* exact agreement between the two-phase SQL path, the single-phase
  Column expression, and the bounded DataFrame helpers, over
  multi-partition input;
* the documented fallbacks (non-decomposable sibling aggregate,
  DISTINCT, HAVING) staying single-phase AND correct;
* the scale contract: one group holding ≥1M geometries aggregates
  without any task collecting the whole group (the plan groups by
  __fps_salt first), at default task memory.
"""

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.engine import PrestoSparkEngine
from facebook_presto_spark.functions import call
from facebook_presto_spark.functions import geo_kernel as gk
from facebook_presto_spark.functions.geo_fns import (
    convex_hull_agg_df,
    geometry_union_agg_df,
)
from facebook_presto_spark.sqlfront.translate import translate


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def _geo_df(spark, parts=7):
    rows = []
    for i in range(60):
        k = i % 3
        if i % 5 == 0:
            rows.append((k, f"POLYGON (({i} 0, {i + 2} 0, {i + 2} 2, "
                            f"{i} 2, {i} 0))"))
        elif i % 5 == 1:
            rows.append((k, f"LINESTRING ({i} {i}, {i + 1} {i})"))
        else:
            rows.append((k, f"POINT ({i} {i % 7})"))
    return spark.createDataFrame(rows, "k int, g string").repartition(parts)


def test_two_phase_matches_single_phase(eng, spark):
    df = _geo_df(spark)
    df.createOrReplaceTempView("geo2p")
    sql = translate("SELECT k, geometry_union_agg(g) AS u, "
                    "convex_hull_agg(g) AS h FROM geo2p GROUP BY k")
    assert "__fps_salt" in sql, "two-phase rewrite did not fire"
    got = {r.k: (r.u, r.h) for r in eng.sql(
        "SELECT k, geometry_union_agg(g) AS u, convex_hull_agg(g) AS h "
        "FROM geo2p GROUP BY k").collect()}
    want = {r.k: (r.u, r.h) for r in df.groupBy("k").agg(
        call("geometry_union_agg", F.col("g")).alias("u"),
        call("convex_hull_agg", F.col("g")).alias("h")).collect()}
    assert set(got) == set(want) == {0, 1, 2}
    for k in got:
        assert gk.canonical(got[k][0]) == gk.canonical(want[k][0]), k
        assert gk.canonical(got[k][1]) == gk.canonical(want[k][1]), k


def test_df_helpers_match_single_phase(spark):
    df = _geo_df(spark)
    u2 = {r.k: r.u for r in
          geometry_union_agg_df(df, ["k"], F.col("g"), "u").collect()}
    h2 = {r.k: r.h for r in
          convex_hull_agg_df(df, ["k"], F.col("g"), "h").collect()}
    one = {r.k: (r.u, r.h) for r in df.groupBy("k").agg(
        call("geometry_union_agg", F.col("g")).alias("u"),
        call("convex_hull_agg", F.col("g")).alias("h")).collect()}
    for k, (u, h) in one.items():
        assert gk.canonical(u2[k]) == gk.canonical(u)
        assert gk.canonical(h2[k]) == gk.canonical(h)


def test_sibling_aggregates_decompose(eng, spark):
    df = _geo_df(spark)
    df.createOrReplaceTempView("geo2p_sib")
    sql = translate(
        "SELECT k, count(*) AS c, count(g) AS cg, min(g) AS lo, "
        "max(g) AS hi, ST_Area(convex_hull_agg(g)) AS a "
        "FROM geo2p_sib GROUP BY k")
    assert "__fps_salt" in sql
    got = {r.k: r for r in eng.sql(
        "SELECT k, count(*) AS c, count(g) AS cg, min(g) AS lo, "
        "max(g) AS hi, ST_Area(convex_hull_agg(g)) AS a "
        "FROM geo2p_sib GROUP BY k").collect()}
    want = {r.k: r for r in eng.spark.sql(
        "SELECT k, count(*) AS c, count(g) AS cg, min(g) AS lo, "
        "max(g) AS hi FROM geo2p_sib GROUP BY k").collect()}
    hull_area = {r.k: r.a for r in df.groupBy("k").agg(
        call("ST_Area", call("convex_hull_agg", F.col("g"))).alias("a")
    ).collect()}
    for k, w in want.items():
        assert (got[k].c, got[k].cg, got[k].lo, got[k].hi) == \
            (w.c, w.cg, w.lo, w.hi)
        assert got[k].a == pytest.approx(hull_area[k]) and got[k].a > 0


def test_fallbacks_stay_single_phase_and_correct(eng, spark):
    _geo_df(spark).createOrReplaceTempView("geo2p_fb")
    for q in (
        # avg has no decomposition spelled here
        "SELECT k, avg(k) AS m, ST_NumPoints(geometry_union_agg(g)) AS n "
        "FROM geo2p_fb GROUP BY k",
        # DISTINCT argument
        "SELECT k, ST_NumPoints(geometry_union_agg(g)) AS n, "
        "count(DISTINCT g) AS d FROM geo2p_fb GROUP BY k",
        # multi-relation FROM with a qualified HAVING ref — the
        # qualifier can't be resolved to one relation, so single-phase
        "SELECT a.k, ST_NumPoints(geometry_union_agg(a.g)) AS n "
        "FROM geo2p_fb a JOIN geo2p_fb b ON a.k = b.k "
        "GROUP BY a.k HAVING a.k >= 0",
    ):
        assert "__fps_salt" not in translate(q), q
        rows = eng.sql(q).collect()  # still executes correctly
        assert len(rows) == 3 and all(r.n > 0 for r in rows)
    # round 11: a BARE qualified group-key ref in HAVING over a
    # single-relation FROM drops its qualifier and keeps two-phase
    q = ("SELECT k, ST_NumPoints(geometry_union_agg(g)) AS n FROM geo2p_fb "
         "GROUP BY k HAVING geo2p_fb.k >= 0 AND count(*) > 1")
    assert "__fps_salt" in translate(q), q
    rows = eng.sql(q).collect()
    assert len(rows) == 3 and all(r.n > 0 for r in rows)


def test_having_and_filter_two_phase(eng, spark):
    """Round 10: HAVING and FILTER spellings keep the two-phase shape —
    HAVING becomes an outer filter whose aggregates merge like
    select-list ones, FILTER becomes a per-row CASE in the inner
    projection (the reference's per-arm mask) with an unconditional
    merge — and the values match the single-phase Column expressions."""
    df = _geo_df(spark)
    df.createOrReplaceTempView("geo2p_hf")
    # HAVING over the trigger: two-phase fires, values exact
    q = ("SELECT k, ST_NumPoints(geometry_union_agg(g)) AS n, "
         "count(*) AS c FROM geo2p_hf GROUP BY k HAVING count(*) > 1")
    assert "__fps_salt" in translate(q)
    got = {r.k: (r.n, r.c) for r in eng.sql(q).collect()}
    want = {r.k: (r.n, r.c) for r in df.groupBy("k").agg(
        call("ST_NumPoints",
             call("geometry_union_agg", F.col("g"))).alias("n"),
        F.count(F.lit(1)).alias("c")).where("c > 1").collect()}
    assert got == want and got
    # FILTER on trigger + siblings: per-arm decomposition, values exact
    q2 = ("SELECT k, max(k, 2) FILTER (WHERE k > 0) AS m, "
          "count(*) FILTER (WHERE k < 2) AS c, "
          "sum(k) FILTER (WHERE k = 1) AS s FROM geo2p_hf GROUP BY k")
    assert "__fps_salt" in translate(q2)
    got2 = {r.k: (r.m, r.c, r.s) for r in eng.sql(q2).collect()}
    want2 = {r.k: (r.m, r.c, r.s) for r in eng.spark.sql(
        "SELECT k, CASE WHEN k > 0 THEN array(k, k) END AS m, "
        "count(CASE WHEN k < 2 THEN 1 END) AS c, "
        "sum(CASE WHEN k = 1 THEN k END) AS s "
        "FROM geo2p_hf GROUP BY k").collect()}
    assert got2 == want2
    # geo FILTER: excluded rows never reach the union
    q3 = ("SELECT ST_NumPoints(geometry_union_agg(g) "
          "FILTER (WHERE k = 0)) AS n FROM geo2p_hf")
    assert "__fps_salt" in translate(q3)
    n_all = eng.sql("SELECT ST_NumPoints(geometry_union_agg(g)) AS n "
                    "FROM geo2p_hf WHERE k = 0").collect()[0].n
    assert eng.sql(q3).collect()[0].n == n_all
    # reduce_agg FILTER (identity init): fold only the filtered rows
    q4 = ("SELECT k, reduce_agg(k, 0, (s, v) -> s + v, (a, b) -> a + b) "
          "FILTER (WHERE k % 2 = 0) AS r FROM geo2p_hf GROUP BY k")
    assert "__fps_salt" in translate(q4)
    got4 = {r.k: r.r for r in eng.sql(q4).collect()}
    want4 = {r.k: r.r for r in eng.spark.sql(
        "SELECT k, sum(CASE WHEN k % 2 = 0 THEN k END) AS r "
        "FROM geo2p_hf GROUP BY k").collect()}
    assert got4 == want4


def test_global_aggregate_and_empty_input(eng, spark):
    _geo_df(spark).createOrReplaceTempView("geo2p_g")
    row = eng.sql("SELECT count(*) AS c, "
                  "ST_GeometryType(convex_hull_agg(g)) AS t "
                  "FROM geo2p_g").collect()[0]
    assert row.c == 60 and row.t == "POLYGON"
    row = eng.sql("SELECT count(*) AS c, geometry_union_agg(g) AS u "
                  "FROM geo2p_g WHERE k > 99").collect()[0]
    assert row.c == 0 and row.u is None


def test_one_hot_group_scales(eng, spark):
    """One group, 250,000 geometries across 32 partitions, default task
    memory.

    The naive spelling would collect every WKT string of the group into
    a single array in one task; the two-phase plan's first aggregation
    groups by spark_partition_id(), so no task ever sees more than one
    input partition.  Union inputs snap to a 40×25 grid (the reference's
    union semantics dedupe coincident points), the hull pools all 250k
    vertices — both must come back exact."""
    # 250k rows keep the property (one hot group, many partitions, per-
    # partition partials, exact union/hull) at a quarter of the Python-
    # side WKT-parse wall clock; the guarded failure mode (single-task
    # collect of the whole group) trips at this size just the same
    spark.range(250_000).selectExpr(
        "1 AS k",
        "concat('POINT (', id % 40, ' ', (id * 7) % 25, ')') AS g",
    ).repartition(32).createOrReplaceTempView("geo2p_big")
    sql = translate("SELECT k, ST_NumPoints(geometry_union_agg(g)) AS n, "
                    "convex_hull_agg(g) AS h FROM geo2p_big GROUP BY k")
    assert "__fps_salt" in sql
    row = eng.sql(
        "SELECT k, ST_NumPoints(geometry_union_agg(g)) AS n, "
        "convex_hull_agg(g) AS h FROM geo2p_big GROUP BY k").collect()[0]
    assert row.n == 200  # lcm(40, 25) distinct (id%40, 7·id%25) pairs
    hull = gk.parse_wkt(row.h)
    xs = [p[0] for p in hull.polys[0][0]]
    ys = [p[1] for p in hull.polys[0][0]]
    assert (min(xs), max(xs), min(ys), max(ys)) == (0.0, 39.0, 0.0, 24.0)
    # round 10: the HAVING and FILTER spellings keep the same bounded
    # shape — the hot group still aggregates via per-partition partials
    sql_h = translate(
        "SELECT k, ST_NumPoints(geometry_union_agg(g) "
        "FILTER (WHERE g NOT LIKE '%39 %')) AS n "
        "FROM geo2p_big GROUP BY k HAVING count(*) > 10")
    assert "__fps_salt" in sql_h
    row2 = eng.sql(
        "SELECT k, ST_NumPoints(geometry_union_agg(g) "
        "FILTER (WHERE g NOT LIKE '%39 %')) AS n "
        "FROM geo2p_big GROUP BY k HAVING count(*) > 10").collect()[0]
    assert row2.n == 195  # the 5 x=39 grid points are filtered out


# --- property-based equivalence: two-phase vs single-phase ------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_GEOM_POOL = [
    "POINT (0 0)", "POINT (3 4)", "POINT (-2 7)", "POINT (3 4)",
    "LINESTRING (0 0, 5 0)", "LINESTRING (1 1, 1 6, 4 6)",
    "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))",
    "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))",
    "POLYGON ((10 0, 12 0, 12 2, 10 2, 10 0))",
    "MULTIPOINT (1 2, 3 4)",
    "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))",
    None,
]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.sampled_from(_GEOM_POOL)),
        min_size=1, max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=9),
)
def test_two_phase_property_equivalence(eng, spark, rows, parts):
    """For ANY grouped dataset and partitioning, the two-phase SQL plan
    must produce the same union and hull (canonically) as the
    single-phase Column expression — including NULL geometries and
    groups living entirely in one partition."""
    df = spark.createDataFrame(rows, "k int, g string").repartition(parts)
    df.createOrReplaceTempView("geo2p_prop")
    got = {r.k: (r.u, r.h) for r in eng.sql(
        "SELECT k, geometry_union_agg(g) AS u, convex_hull_agg(g) AS h "
        "FROM geo2p_prop GROUP BY k").collect()}
    want = {r.k: (r.u, r.h) for r in df.groupBy("k").agg(
        call("geometry_union_agg", F.col("g")).alias("u"),
        call("convex_hull_agg", F.col("g")).alias("h")).collect()}
    assert set(got) == set(want)
    for k in want:
        for gv, wv in zip(got[k], want[k]):
            if wv is None or gv is None:
                assert gv == wv, (k, gv, wv)
            else:
                assert gk.canonical(gv) == gk.canonical(wv), (k, gv, wv)


# --- two-phase for the other exactly-mergeable single-array aggregates ------


def test_top_n_and_reduce_agg_two_phase(eng, spark):
    """min(x,n)/max(x,n) (TypedHeap) and reduce_agg share the geo
    aggregates' single-array scale problem and their exact merge —
    the restructure triggers on them alone and values stay exact."""
    assert "__fps_salt" in translate(
        "SELECT k, max(x, 3) AS m FROM t GROUP BY k")
    assert "__fps_salt" in translate(
        "SELECT k, reduce_agg(x, 0, (s, v) -> s + v, (a, b) -> a + b) "
        "AS r FROM t GROUP BY k")
    # 1-arg min/max are natively partial-aggregated: no restructure
    assert "__fps_salt" not in translate(
        "SELECT k, min(x) AS m FROM t GROUP BY k")
    rows = [(i % 3, i * 7 % 23) for i in range(60)]
    spark.createDataFrame(rows, "k int, x int").repartition(6) \
        .createOrReplaceTempView("t2p_topn")
    by_k: dict[int, list[int]] = {}
    for k, x in rows:
        by_k.setdefault(k, []).append(x)
    got = {r.k: (r.m3, r.m4, r.r, r.c) for r in eng.sql(
        "SELECT k, max(x, 3) AS m3, min(x, 4) AS m4, "
        "reduce_agg(x, 0, (s, v) -> s + v, (a, b) -> a + b) AS r, "
        "count(*) AS c FROM t2p_topn GROUP BY k").collect()}
    for k, xs in by_k.items():
        assert got[k][0] == sorted(xs, reverse=True)[:3]
        assert got[k][1] == sorted(xs)[:4]
        assert got[k][2] == sum(xs) and got[k][3] == len(xs)
    # global (no GROUP BY) form
    row = eng.sql("SELECT max(x, 5) AS m FROM t2p_topn").collect()[0]
    assert row.m == sorted((x for _, x in rows), reverse=True)[:5]


def test_reduce_agg_non_identity_init_single_phase(eng, spark):
    """reduce_agg with an initial state that is NOT the combine identity
    must NOT be restructured: the reference seeds initialState once per
    state and combine never re-seeds (ReduceAggregationFunction.java:
    162-216), so a two-phase plan would count init once per partition.
    The single-phase fallback folds init exactly once."""
    assert "__fps_salt" not in translate(
        "SELECT k, reduce_agg(x, 5, (s, v) -> s + v, (a, b) -> a + b) "
        "AS r FROM t GROUP BY k")
    # multiplicative identity DOES trigger; non-identity 0 must not
    assert "__fps_salt" in translate(
        "SELECT k, reduce_agg(x, 1, (s, v) -> s * v, (a, b) -> a * b) "
        "AS r FROM t GROUP BY k")
    assert "__fps_salt" not in translate(
        "SELECT k, reduce_agg(x, 0, (s, v) -> s * v, (a, b) -> a * b) "
        "AS r FROM t GROUP BY k")
    rows = [(i % 3, i % 7 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "k int, x int").repartition(8)
    df.createOrReplaceTempView("t2p_ra_ni")
    by_k: dict[int, list[int]] = {}
    for k, x in rows:
        by_k.setdefault(k, []).append(x)
    # non-identity init: exactly one seed regardless of partitioning
    got = {r.k: r.r for r in eng.sql(
        "SELECT k, reduce_agg(x, 5, (s, v) -> s + v, (a, b) -> a + b) "
        "AS r FROM t2p_ra_ni GROUP BY k").collect()}
    assert got == {k: 5 + sum(xs) for k, xs in by_k.items()}
    # identity init through the two-phase path stays exact
    got2 = {r.k: r.r for r in eng.sql(
        "SELECT k, reduce_agg(x, 0, (s, v) -> s + v, (a, b) -> a + b) "
        "AS r FROM t2p_ra_ni GROUP BY k").collect()}
    assert got2 == {k: sum(xs) for k, xs in by_k.items()}
    # multiplicative identity through HAVING (two-phase since round 10)
    import math
    got3 = {r.k: r.r for r in eng.sql(
        "SELECT k, reduce_agg(CAST(x AS DOUBLE), 1.0, (s, v) -> s * v, "
        "(a, b) -> a * b) AS r FROM t2p_ra_ni GROUP BY k "
        "HAVING k = 0").collect()}
    assert got3 == {0: float(math.prod(by_k[0]))}


def test_expression_group_keys_two_phase(eng, spark):
    """Round 10: expression and qualified group keys keep the two-phase
    shape — the key computes once in the inner projection under a
    stable alias (the spatial-binning GROUP BY f(x) pattern), and outer
    SELECT/HAVING/ORDER BY references are replaced by the alias."""
    for q in (
        "SELECT k % 2 AS b, ST_NumPoints(geometry_union_agg(g)) AS n "
        "FROM t GROUP BY k % 2",
        "SELECT t.k AS b, max(x, 3) AS m FROM t GROUP BY t.k",
        "SELECT substr(g, 1, 5) AS c, convex_hull_agg(g) AS h "
        "FROM t GROUP BY substr(g, 1, 5) ORDER BY substr(g, 1, 5)",
        "SELECT (k % 2) AS b, max(x, 2) AS m FROM t GROUP BY (k % 2) "
        "HAVING count(*) > 1",
    ):
        assert "__fps_salt" in translate(q), q
    # round 11: GROUP BY ordinal resolves to its select item and keeps
    # the two-phase shape (both bare-column and expression positions)
    assert "__fps_salt" in translate(
        "SELECT k, geometry_union_agg(g) AS u FROM t GROUP BY 1")
    assert "__fps_salt" in translate(
        "SELECT k % 2 AS b, geometry_union_agg(g) AS u FROM t GROUP BY 1")
    # runtime equivalence vs the single-phase Column construction
    df = _geo_df(spark)
    df.createOrReplaceTempView("geo2p_ek")
    got = {r.b: (r.n, r.c) for r in eng.sql(
        "SELECT k % 2 AS b, ST_NumPoints(geometry_union_agg(g)) AS n, "
        "count(*) AS c FROM geo2p_ek GROUP BY k % 2 ORDER BY k % 2"
    ).collect()}
    want = {r.b: (r.n, r.c) for r in df.groupBy(
        (F.col("k") % 2).alias("b")).agg(
        call("ST_NumPoints",
             call("geometry_union_agg", F.col("g"))).alias("n"),
        F.count(F.lit(1)).alias("c")).collect()}
    assert got == want and len(got) == 2
    # ordinal spelling of the same query is value-identical (round 11)
    got_ord = {r.b: (r.n, r.c) for r in eng.sql(
        "SELECT k % 2 AS b, ST_NumPoints(geometry_union_agg(g)) AS n, "
        "count(*) AS c FROM geo2p_ek GROUP BY 1 ORDER BY 1"
    ).collect()}
    assert got_ord == want


def test_two_phase_translate_flag(eng):
    """translate(two_phase=False) skips the restructure — the engine's
    analysis-failure fallback path relies on this producing the plain
    single-phase spelling."""
    q = ("SELECT k, geometry_union_agg(g) AS u FROM t GROUP BY k")
    assert "__fps_salt" in translate(q)
    assert "__fps_salt" not in translate(q, two_phase=False)
