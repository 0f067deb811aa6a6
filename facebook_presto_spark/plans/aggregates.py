"""Aggregate long-tail: map aggs, N-variants, reduce_agg, sketches.

Completes SURVEY.md §2.3 beyond the common aggregates already covered in
plans/relational.py.  Reference implementations:

- map_agg        — operator/aggregation/MapAggregationFunction.java:48
- multimap_agg   — operator/aggregation/multimapagg/MultimapAggregationFunction.java:52
- map_union      — operator/aggregation/MapUnionAggregation.java:46
- min/max(x, n)  — operator/aggregation/MinNAggregationFunction.java (TypedHeap)
- min_by/max_by(x, y, n) — operator/aggregation/AbstractMinMaxByNAggregationFunction.java
- reduce_agg     — operator/aggregation/ReduceAggregationFunction.java
- numeric_histogram — operator/aggregation/NumericHistogram.java
- approx_set / merge / cardinality — ApproximateSetAggregation.java,
  MergeHyperLogLogAggregation.java, scalar/HyperLogLogFunctions.java

Spark-first design notes:

- map columns never cross the oracle boundary directly (entry order is
  engine-specific); queries project deterministic scalars out of the maps
  (element_at / sorted entries) so the hash compare is meaningful.
- N-variants are `slice(sort_array(collect_list(struct…)), 1, n)` — the
  collect is bounded per group by the subsequent slice, and Catalyst's
  partial aggregation keeps the shuffle small.  (Presto's TypedHeap caps
  memory at n; for huge groups the window-filter form in
  relational.window_topk_per_group is the scale path.)
- reduce_agg uses F.aggregate over a collected array: correct for the
  bounded-group shapes Presto documents (the reference itself warns
  reduce_agg state must stay small).
- HLL parity: Spark's hll_sketch_agg is the same Apache DataSketches HLL
  family; below ~thousands of distinct values per group the sparse
  representation is exact, which the oracle (exact COUNT DISTINCT)
  exploits — same trick the reference's own tests use for approx_distinct
  on tiny TPCH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# shared reader: inherits the split-staged multi-file layout (scan
# parallelism, guide §6) from the tpch plan module
from facebook_presto_spark.plans.tpch import _t  # noqa: E402,F401


# --------------------------------------------------------------------------
# map_agg: per priority, map of order-status → order count; probe the map.
def agg_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("o_orderstatus", "cnt")))
    )
    return (
        per_status.groupBy("o_orderpriority")
        .agg(m.alias("m"))
        .select(
            "o_orderpriority",
            F.map_keys(F.col("m")).alias("statuses"),  # sorted by construction
            F.element_at(F.col("m"), "F").alias("n_f"),
            F.element_at(F.col("m"), "O").alias("n_o"),
            F.cardinality(F.col("m")).alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_MAP_AGG = """
SELECT o_orderpriority,
       list(DISTINCT o_orderstatus ORDER BY o_orderstatus) AS statuses,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# multimap_agg: nation → all its customer keys (as a sorted list per key);
# map_union: disjoint per-status maps merged across rows.
def agg_multimap_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # multimap_agg(c_nationkey, c_custkey) ≡ map<nation, array<custkey>>;
    # the grouped collect IS the multimap's value side.
    mm = cust.groupBy("c_nationkey").agg(
        F.sort_array(F.collect_list("c_custkey")).alias("custkeys")
    )
    # map_union over per-row singleton maps (disjoint keys ⇒ deterministic):
    # aggregate the entry set, then rebuild one map.
    merged = mm.select(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("c_nationkey", "custkeys")))
        ).alias("m")
    )
    return merged.select(
        F.cardinality(F.col("m")).alias("n_nations"),
        F.size(F.element_at(F.col("m"), F.lit(0))).alias("n0_customers"),
        F.element_at(F.element_at(F.col("m"), F.lit(0)), 1).alias("n0_first_key"),
    )


ORACLE_MULTIMAP = """
SELECT count(DISTINCT c_nationkey) AS n_nations,
       count(*) FILTER (WHERE c_nationkey = 0) AS n0_customers,
       min(c_custkey) FILTER (WHERE c_nationkey = 0) AS n0_first_key
FROM customer
"""


# --------------------------------------------------------------------------
# min(x,n) / max(x,n) / min_by(x,y,n) / max_by(x,y,n)
def agg_minmax_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    price = F.round(F.col("o_totalprice") * 100).cast("long")
    lo3 = F.slice(F.sort_array(F.collect_list(price)), 1, 3)
    hi3 = F.slice(F.sort_array(F.collect_list(price), asc=False), 1, 3)
    # min_by(o_orderkey, price, 3): keys of the 3 cheapest orders
    by_price = F.collect_list(F.struct(price.alias("p"), F.col("o_orderkey").alias("k")))
    minby3 = F.transform(F.slice(F.sort_array(by_price), 1, 3), lambda s: s["k"])
    maxby3 = F.transform(F.slice(F.sort_array(by_price, asc=False), 1, 3), lambda s: s["k"])
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(lo3.cast("array<string>"), ",").alias("min3"),
            F.array_join(hi3.cast("array<string>"), ",").alias("max3"),
            F.array_join(minby3.cast("array<string>"), ",").alias("minby3"),
            F.array_join(maxby3.cast("array<string>"), ",").alias("maxby3"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_MINMAX_N = """
WITH t AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS p
  FROM orders
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY p, o_orderkey) AS rn_asc,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY p DESC, o_orderkey DESC) AS rn_desc
  FROM t
)
SELECT o_orderpriority,
       string_agg(CASE WHEN rn_asc <= 3 THEN CAST(p AS VARCHAR) END, ',' ORDER BY rn_asc) AS min3,
       string_agg(CASE WHEN rn_desc <= 3 THEN CAST(p AS VARCHAR) END, ',' ORDER BY rn_desc) AS max3,
       string_agg(CASE WHEN rn_asc <= 3 THEN CAST(o_orderkey AS VARCHAR) END, ',' ORDER BY rn_asc) AS minby3,
       string_agg(CASE WHEN rn_desc <= 3 THEN CAST(o_orderkey AS VARCHAR) END, ',' ORDER BY rn_desc) AS maxby3
FROM ranked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# reduce_agg: per-nation product of (1 + supplier count mod 3) — a bounded
# custom fold, the reference's canonical reduce_agg example shape.
def agg_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    term = (F.col("s_suppkey") % 3 + 1).cast("long")
    return (
        supp.groupBy("s_nationkey")
        .agg(F.collect_list(term).alias("terms"))
        .select(
            "s_nationkey",
            F.aggregate("terms", F.lit(1).cast("long"), lambda acc, x: acc * x).alias(
                "product"
            ),
            F.aggregate("terms", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
                "fold_sum"
            ),
        )
        .orderBy("s_nationkey")
    )


ORACLE_REDUCE = """
SELECT s_nationkey,
       CAST(product(s_suppkey % 3 + 1) AS BIGINT) AS product,
       CAST(sum(s_suppkey % 3 + 1) AS BIGINT) AS fold_sum
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


# --------------------------------------------------------------------------
# numeric_histogram via width_bucket: fixed [0, 600k) price range, 6 buckets.
# (Presto's numeric_histogram is an adaptive V-optimal sketch with no exact
# cross-engine twin; the width_bucket form is the deterministic equivalent
# and width_bucket itself is MathFunctions.java surface.)
def agg_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(6))
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


ORACLE_NUMERIC_HISTOGRAM = """
SELECT CAST(least(greatest(floor(o_totalprice / 100000.0), -1), 6) + 1 AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# HLL sketch lifecycle: approx_set per group → merge(hll) across groups →
# cardinality.  Sparse-mode sketches are exact at these per-group sizes, so
# the oracle is exact COUNT DISTINCT.
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # lgConfigK=21: the DataSketches coupon (sparse) representation stays
    # exact well past the ~1.3k distinct customers per group at sf0.01, so
    # the exact-COUNT-DISTINCT oracle is valid; at 100 TB you'd drop back to
    # the default 12 and accept the documented ±2% error.
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", 21).alias("hll"),
        F.count(F.lit(1)).alias("n"),
    )
    per_group = per_prio.select(
        "o_orderpriority",
        F.hll_sketch_estimate("hll").alias("approx_customers"),
    )
    merged = per_prio.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_customers")
    ).select(F.lit("__ALL__").alias("o_orderpriority"), "approx_customers")
    return per_group.unionByName(merged).orderBy("o_orderpriority")


ORACLE_HLL = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS approx_customers
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT '__ALL__', count(DISTINCT o_custkey) FROM orders
ORDER BY o_orderpriority
"""


def agg_hll_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_set / merge / cardinality over the Presto/airlift WIRE
    format (spi/type/HyperLogLogType.java — sketches a real cluster can
    read back).  65536 buckets keep the sketch in its SPARSE_V2 regime
    at test cardinalities, where airlift's linear-counting estimate is
    exact — so the exact-COUNT-DISTINCT oracle is valid, same device as
    agg_hll_sketch above; at 100 TB you'd use the reference's default
    4096 and accept the documented ±1.6% error.  The plan pre-aggregates
    (group, hash-bucket) JVM-side, so at most min(distinct, 2^26) combined
    rows per group reach the Python packer."""
    from facebook_presto_spark.functions import presto_hll_spark as hs

    orders = _t(spark, sf_dir, "orders")
    sk = hs.approx_set_agg(
        orders, ["o_orderpriority"], "o_custkey", buckets=65536
    )
    per_group = sk.select(
        "o_orderpriority",
        hs.cardinality_hll("hll").alias("approx_customers"),
    )
    merged = sk.agg(hs.merge_hll_agg("hll").alias("m")).select(
        F.lit("__ALL__").alias("o_orderpriority"),
        hs.cardinality_hll("m").alias("approx_customers"),
    )
    return per_group.unionByName(merged).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# weighted approx_percentile (x, w, p) — Presto's qdigest-weighted estimate
# (ApproximateLongPercentileWeightedAggregations); ours is Spark's exact
# percentile-with-frequency, verified against DuckDB's quantile over
# weight-expanded rows (identical linear interpolation).
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from facebook_presto_spark.functions import call

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    w = F.col("l_quantity").cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(call("approx_percentile_weighted", cents, w, 0.5), 4).alias("wp50"),
            F.round(call("approx_percentile_weighted", cents, w, 0.9), 4).alias("wp90"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_WEIGHTED_PERCENTILE = """
WITH expanded AS (
  SELECT l_returnflag, CAST(round(l_extendedprice*100) AS BIGINT) AS cents
  FROM lineitem, LATERAL (SELECT unnest(range(CAST(l_quantity AS BIGINT)))) t
)
SELECT l_returnflag,
       round(quantile_cont(cents, 0.5), 4) AS wp50,
       round(quantile_cont(cents, 0.9), 4) AS wp90
FROM expanded
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# SetDigest (MinHash) lifecycle: make_set_digest per group → pairwise
# jaccard_index / intersection_cardinality / cardinality
# (type/setdigest/SetDigestFunctions.java:45-84).  Bottom-k digests are
# exact while per-group distinct custkeys (~1.4k at sf0.01) stay below
# k=8192, so the oracle is exact set arithmetic; at 100 TB the same plan
# degrades gracefully to the bottom-k estimators.
def agg_set_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from facebook_presto_spark.functions import call

    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy("o_orderpriority").agg(
        call("make_set_digest", "o_custkey").alias("dg")
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("a.o_orderpriority") < F.col("b.o_orderpriority"))
    return pairs.select(
        F.col("a.o_orderpriority").alias("p1"),
        F.col("b.o_orderpriority").alias("p2"),
        F.round(call("jaccard_index", F.col("a.dg"), F.col("b.dg")), 4).alias("jaccard"),
        call("intersection_cardinality", F.col("a.dg"), F.col("b.dg")).alias("icard"),
        call("cardinality_setdigest", F.col("a.dg")).alias("card1"),
    ).orderBy("p1", "p2")


ORACLE_SET_DIGEST = """
WITH s AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders),
cnt AS (SELECT p, count(*) AS n FROM s GROUP BY p),
inter AS (
  SELECT s1.p AS p1, s2.p AS p2, count(*) AS i
  FROM s s1 JOIN s s2 ON s1.c = s2.c AND s1.p < s2.p
  GROUP BY s1.p, s2.p
)
SELECT i.p1, i.p2,
       round(CAST(i.i AS DOUBLE) / (ca.n + cb.n - i.i), 4) AS jaccard,
       CAST(i.i AS BIGINT) AS icard,
       CAST(ca.n AS BIGINT) AS card1
FROM inter i
JOIN cnt ca ON ca.p = i.p1
JOIN cnt cb ON cb.p = i.p2
ORDER BY p1, p2
"""


def agg_set_digest_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetDigest over the Presto WIRE format (type/setdigest/
    SetDigest.java byte layout: version + airlift HLL + bottom-k
    murmur3 minhash with counts).  In the exact regime (< 8192 distinct
    per group) cardinality and intersection_cardinality are exact
    (SetDigest.java:147-157, SetDigestFunctions.java:52-74), so the
    COUNT-DISTINCT oracle is valid.  jaccard_index is a minhash
    ESTIMATE even over exact digests (it walks the first min(|A|,|B|)
    union keys in hash order — SetDigest.java:166-184), so it is
    covered by unit tests, not this oracle."""
    from facebook_presto_spark.functions import presto_setdigest as sd

    orders = _t(spark, sf_dir, "orders")
    d = sd.make_set_digest_agg(orders, ["o_orderpriority"], "o_custkey")
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, F.col("a.o_orderpriority") < F.col("b.o_orderpriority"))
    return pairs.select(
        F.col("a.o_orderpriority").alias("p1"),
        F.col("b.o_orderpriority").alias("p2"),
        sd.intersection_cardinality_wire(
            F.col("a.digest"), F.col("b.digest")
        ).alias("icard"),
        sd.cardinality_setdigest_wire(F.col("a.digest")).alias("card1"),
    ).orderBy("p1", "p2")


ORACLE_SET_DIGEST_WIRE = """
WITH s AS (SELECT DISTINCT o_orderpriority AS p, o_custkey AS c FROM orders),
cnt AS (SELECT p, count(*) AS n FROM s GROUP BY p),
inter AS (
  SELECT s1.p AS p1, s2.p AS p2, count(*) AS i
  FROM s s1 JOIN s s2 ON s1.c = s2.c AND s1.p < s2.p
  GROUP BY s1.p, s2.p
)
SELECT i.p1, i.p2, CAST(i.i AS BIGINT) AS icard, CAST(ca.n AS BIGINT) AS card1
FROM inter i
JOIN cnt ca ON ca.p = i.p1
ORDER BY p1, p2
"""


# --------------------------------------------------------------------------
# Quantile-digest lifecycle (QuantileDigestFunctions.java:41-91,
# QuantileDigestAggregationFunction.java:58): round 4 replaced the
# value-error bucket sketch on this path with the real rank-error
# q-digest (functions/presto_qdigest.py); the oracle asserts the rank
# CONTRACT — answers themselves are implementation-defined within ε·N,
# as in the reference.  The bucket-map scalars in sketch_fns.py remain
# the SQL-path surface (documented value-error variant).

_QD_EPS = 0.01  # the reference's default maxError (rank error)


def _qdigest_contract(vals: DataFrame, digests: DataFrame,
                      quantiles: dict[str, float]) -> DataFrame:
    """Join digest answers back to the data and assert the reference's
    rank contract per quantile: the answer's rank interval
    [#(x < a), #(x ≤ a)] must come within ε·N of q·N
    (QuantileDigest's maxError guarantee).  Output booleans hash-match
    a constant-true oracle — the contract IS the compared value, which
    is exactly how a rank-error sketch can be oracle-gated (the answers
    themselves are legitimately implementation-dependent)."""
    from facebook_presto_spark.functions.presto_qdigest import value_at_quantile_col

    ans = digests.select(
        "l_returnflag",
        *[
            value_at_quantile_col(F.col("qdigest"), q).alias(f"__a_{alias}")
            for alias, q in quantiles.items()
        ],
    )
    joined = vals.join(F.broadcast(ans), "l_returnflag")
    n = F.count(F.lit(1))
    aggs = [n.alias("n")]
    for alias, q in quantiles.items():
        a = F.first(F.col(f"__a_{alias}"))
        lo = F.sum((F.col("cents") < F.col(f"__a_{alias}")).cast("long"))
        hi = F.sum((F.col("cents") <= F.col(f"__a_{alias}")).cast("long"))
        margin = F.lit(_QD_EPS) * n + F.lit(1.0)
        ok = a.isNotNull() & (lo <= F.lit(q) * n + margin) & (
            hi >= F.lit(q) * n - margin
        )
        aggs.append(ok.alias(f"ok_{alias}"))
    return joined.groupBy("l_returnflag").agg(*aggs).orderBy("l_returnflag")


def _qd_contract_oracle(quantiles: dict[str, float]) -> str:
    oks = ", ".join(f"true AS ok_{alias}" for alias in quantiles)
    return f"""
SELECT l_returnflag, count(*) AS n, {oks}
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_qdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qdigest(x, 0.01) lifecycle with the reference's RANK-error
    contract (QuantileDigestAggregationFunction.java:58): per-group
    q-digests built distributed (mapInPandas partials → per-group
    merge, functions/presto_qdigest.py), then every value_at_quantile
    answer is checked against the exact ranks — see
    ``_qdigest_contract``.  The map-based value-error bucket sketch
    remains on the SQL scalar path (sketch_fns.py, documented)."""
    from facebook_presto_spark.functions.presto_qdigest import qdigest_build

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    vals = li.select("l_returnflag", cents.alias("cents"))
    digests = qdigest_build(vals, ["l_returnflag"], "cents", _QD_EPS)
    return _qdigest_contract(
        vals, digests, {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9}
    )


ORACLE_QDIGEST = _qd_contract_oracle({"p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9})


def agg_qdigest_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digests built per (returnflag, linestatus), then merge()d across
    linestatus — the reference's distributed-combine story
    (QuantileDigestAggregationFunction merge input function).  The
    merged digest must still satisfy the rank contract against the
    union's exact ranks (counts only move up the tree on merge, so the
    ε·N bound survives — presto_qdigest.py docstring)."""
    import pandas as pd

    from facebook_presto_spark.functions.presto_qdigest import (
        QDigest, qdigest_build,
    )

    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    vals = li.select("l_returnflag", "l_linestatus", cents.alias("cents"))
    per = qdigest_build(
        vals, ["l_returnflag", "l_linestatus"], "cents", _QD_EPS
    )

    def merge_status(pdf):
        d = QDigest(_QD_EPS)
        for buf in pdf["qdigest"]:
            d.merge(QDigest.deserialize(bytes(buf)), lazy=True)
        d.compress()
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "qdigest": [d.serialize()],
        })

    merged = per.groupBy("l_returnflag").applyInPandas(
        merge_status, "l_returnflag string, qdigest binary"
    )
    return _qdigest_contract(
        vals.drop("l_linestatus"), merged, {"p10": 0.1, "p50": 0.5, "p99": 0.99}
    )


ORACLE_QDIGEST_MERGE = _qd_contract_oracle({"p10": 0.1, "p50": 0.5, "p99": 0.99})




# --------------------------------------------------------------------------
# aggregate NULL/empty-state semantics (round 10): one query exercising the
# reference's input-channel contracts end-to-end through the SQL front —
# array_agg keeps NULLs (ArrayAggregationFunction.java:120) and region 0's
# all-NULL group returns [NULL…]; map_agg skips NULL keys
# (MapAggregationFunction.java:109); max(x,n)/min_by(x,y,n) skip NULL
# keys and return NULL over zero retained rows
# (AbstractMinMaxNAggregationFunction.output:148, AbstractMinMaxBy:169);
# arbitrary skips NULLs (ArbitraryAggregationFunction.java:154).
AGG_NULL_SQL = """
WITH t AS (
  SELECT n_regionkey AS g, n_nationkey AS k, n_name AS name,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS xn,
         CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS kn
  FROM nation)
SELECT g,
  array_join(transform(array_agg(xn ORDER BY k),
                       e -> coalesce(CAST(e AS VARCHAR), 'N')), ',') AS arr,
  cardinality(map_agg(kn, name)) AS m_n,
  array_join(max(xn, 3), ',') AS top3,
  min(xn, 2) FILTER (WHERE xn > 100) IS NULL AS topn_empty_is_null,
  arbitrary(CASE WHEN xn IS NULL THEN NULL ELSE 'x' END) AS arb,
  array_join(min_by(name, xn, 2), ',') AS by2
FROM t GROUP BY g ORDER BY g
"""


def agg_null_empty_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from facebook_presto_spark.engine import PrestoSparkEngine

    eng = PrestoSparkEngine.for_dir(sf_dir, spark=spark)
    return eng.sql(AGG_NULL_SQL)


ORACLE_AGG_NULL = """
WITH t AS (
  SELECT n_regionkey AS g, n_nationkey AS k, n_name AS name,
         CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS xn,
         CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS kn
  FROM nation)
SELECT g,
  array_to_string(list(coalesce(CAST(xn AS VARCHAR), 'N') ORDER BY k),
                  ',') AS arr,
  count(kn) AS m_n,
  array_to_string((list(xn ORDER BY xn DESC)
                   FILTER (WHERE xn IS NOT NULL))[1:3], ',') AS top3,
  TRUE AS topn_empty_is_null,
  CASE WHEN count(xn) = 0 THEN NULL ELSE 'x' END AS arb,
  array_to_string((list(name ORDER BY xn)
                   FILTER (WHERE xn IS NOT NULL))[1:2], ',') AS by2
FROM t GROUP BY g ORDER BY g
"""


QUERIES = {
    "agg_set_digest": agg_set_digest,
    "agg_qdigest": agg_qdigest,
    "agg_qdigest_merge": agg_qdigest_merge,
    "agg_weighted_percentile": agg_weighted_percentile,
    "agg_map_agg": agg_map_agg,
    "agg_multimap_union": agg_multimap_union,
    "agg_minmax_n": agg_minmax_n,
    "agg_reduce": agg_reduce,
    "agg_numeric_histogram": agg_numeric_histogram,
    "agg_hll_sketch": agg_hll_sketch,
    "agg_hll_wire": agg_hll_wire,
    "agg_set_digest_wire": agg_set_digest_wire,
    "agg_null_empty_semantics": agg_null_empty_semantics,
}

ORACLE = {
    "agg_set_digest": ORACLE_SET_DIGEST,
    "agg_qdigest": ORACLE_QDIGEST,
    "agg_qdigest_merge": ORACLE_QDIGEST_MERGE,
    "agg_weighted_percentile": ORACLE_WEIGHTED_PERCENTILE,
    "agg_map_agg": ORACLE_MAP_AGG,
    "agg_multimap_union": ORACLE_MULTIMAP,
    "agg_minmax_n": ORACLE_MINMAX_N,
    "agg_reduce": ORACLE_REDUCE,
    "agg_numeric_histogram": ORACLE_NUMERIC_HISTOGRAM,
    "agg_hll_sketch": ORACLE_HLL,
    "agg_hll_wire": ORACLE_HLL,
    "agg_null_empty_semantics": ORACLE_AGG_NULL,
    "agg_set_digest_wire": ORACLE_SET_DIGEST_WIRE,
}
