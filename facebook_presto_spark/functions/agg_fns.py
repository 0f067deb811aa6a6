"""Aggregate-function library (SURVEY §2.3 table).

Reference: presto-main/.../operator/aggregation/ — each row of the §2.3
table maps to a Spark aggregate expression builder here.  Most are direct
built-ins; the composed ones (checksum, geometric_mean, map_agg,
histogram, min/max-N, reduce_agg) follow the documented constructions.
All are Column *aggregate* expressions usable inside groupBy().agg().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


register("count")(lambda c=None: F.count(_c(c)) if c is not None else F.count(F.lit(1)))
register("count_if")(lambda c: F.count_if(_c(c)))
register("sum")(lambda c: F.sum(_c(c)))
register("avg")(lambda c: F.avg(_c(c)))
register("min")(lambda c, n=None: F.min(_c(c)) if n is None else min_n(c, n))
register("max")(lambda c, n=None: F.max(_c(c)) if n is None else max_n(c, n))
register("min_by")(lambda v, o, n=None: F.min_by(_c(v), _c(o)) if n is None else min_by_n(v, o, n))
register("max_by")(lambda v, o, n=None: F.max_by(_c(v), _c(o)) if n is None else max_by_n(v, o, n))
register("arbitrary")(lambda c: F.any_value(_c(c), ignoreNulls=True))
register("any_value")(lambda c: F.any_value(_c(c), ignoreNulls=True))
# array_agg KEEPS null elements (ArrayAggregationFunction.java:120,
# NULLABLE_BLOCK_INPUT_CHANNEL) and is NULL over zero rows (output:135);
# the never-null struct wrapper carries nulls through collect_list
register("array_agg")(lambda c: F.transform(
    F.nullif(F.collect_list(F.struct(_c(c).alias("v"))), F.array()),
    lambda s: s.getField("v")))
register("set_agg")(lambda c: F.collect_set(_c(c)))
register("set_union")(lambda c: F.array_distinct(F.flatten(F.collect_list(_c(c)))))
register("bool_and")(lambda c: F.bool_and(_c(c)))
register("every")(lambda c: F.bool_and(_c(c)))
register("bool_or")(lambda c: F.bool_or(_c(c)))
register("bitwise_and_agg")(lambda c: F.bit_and(_c(c)))
register("bitwise_or_agg")(lambda c: F.bit_or(_c(c)))
register("variance")(lambda c: F.var_samp(_c(c)))
register("var_samp")(lambda c: F.var_samp(_c(c)))
register("var_pop")(lambda c: F.var_pop(_c(c)))
register("stddev")(lambda c: F.stddev_samp(_c(c)))
register("stddev_samp")(lambda c: F.stddev_samp(_c(c)))
register("stddev_pop")(lambda c: F.stddev_pop(_c(c)))
register("skewness")(lambda c: F.skewness(_c(c)))


@register("kurtosis")
def kurtosis(c) -> Column:
    """Bias-corrected sample excess kurtosis G2, NULL when n < 4
    (CentralMomentsAggregation.java:71-87).  Spark's built-in is the
    population g2; G2 = (n-1)*((n+1)*g2 + 6)/((n-2)*(n-3)).  DuckDB's
    kurtosis uses the same correction, so this is oracle-exact too."""
    col = _c(c)
    n = F.count(col).cast("double")
    return F.when(
        n >= F.lit(4.0),
        (n - 1) * ((n + 1) * F.kurtosis(col) + F.lit(6.0))
        / ((n - 2) * (n - 3)),
    )
register("corr")(lambda a, b: F.corr(_c(a), _c(b)))
register("covar_samp")(lambda a, b: F.covar_samp(_c(a), _c(b)))
register("covar_pop")(lambda a, b: F.covar_pop(_c(a), _c(b)))
register("regr_slope")(lambda y, x: F.regr_slope(_c(y), _c(x)))
register("regr_intercept")(lambda y, x: F.regr_intercept(_c(y), _c(x)))
register("approx_distinct")(lambda c, e=None: F.approx_count_distinct(_c(c), rsd=e) if e else F.approx_count_distinct(_c(c)))
register("approx_percentile")(
    lambda c, p, accuracy=10000: F.percentile_approx(_c(c), p, accuracy)
)
# weighted form approx_percentile(x, w, p) (ApproximateLongPercentile
# WeightedAggregations): Spark's exact percentile takes a frequency column —
# a strict-accuracy superset of the reference's qdigest-weighted estimate.
register("approx_percentile_weighted")(
    lambda c, w, p: F.percentile(_c(c), p, _c(w).cast("long"))
)
register("percentile")(lambda c, p: F.percentile(_c(c), p))
# HLL sketch surface (HyperLogLogFunctions.java / ApproximateSetAggregation):
register("approx_set")(lambda c: F.hll_sketch_agg(_c(c)))
register("merge_hll")(lambda c: F.hll_union_agg(_c(c)))
register("cardinality_hll")(lambda sketch: F.hll_sketch_estimate(_c(sketch)))


@register("geometric_mean")
def geometric_mean(c) -> Column:
    return F.exp(F.avg(F.log(_c(c))))


@register("checksum")
def checksum(*cols) -> Column:
    """Order-independent checksum (ChecksumAggregationFunction.java): sum of
    per-row 64-bit hashes — the reference verifier's comparison primitive.
    Wrap-around addition semantics via sum over longs."""
    return F.sum(F.xxhash64(*[_c(c) for c in cols]))


def _dedup_entries_to_map(entries: Column) -> Column:
    """array<struct<key,value>> → map, FIRST value wins on duplicate keys
    (KeyValuePairs.add:113 only inserts when !keyExists; Spark's
    map_from_entries raises DUPLICATED_MAP_KEY by default).  Empty →
    NULL (the reference's empty state appends null)."""
    keys = F.nullif(
        F.array_distinct(F.transform(entries, lambda e: e.getField("key"))),
        F.array())
    vals = F.transform(
        keys,
        lambda k: F.element_at(
            F.filter(entries, lambda e: e.getField("key") == k), 1
        ).getField("value"),
    )
    return F.map_from_arrays(keys, vals)


@register("map_agg")
def map_agg(k, v) -> Column:
    """map_agg(K,V) (MapAggregationFunction.java:109-110): NULL keys are
    skipped (non-nullable key channel), the FIRST value wins on duplicate
    keys (KeyValuePairs.add:113), NULL values are kept, zero retained
    pairs → NULL."""
    return _dedup_entries_to_map(
        F.collect_list(F.when(
            _c(k).isNotNull(),
            F.struct(_c(k).alias("key"), _c(v).alias("value"))))
    )


@register("map_union")
def map_union(m) -> Column:
    """map_union(map) (MapUnionAggregation.java:107-118 — the same
    KeyValuePairs state as map_agg: first value wins)."""
    return _dedup_entries_to_map(
        F.flatten(F.collect_list(F.map_entries(_c(m))))
    )


@register("multimap_agg")
def multimap_agg(k, v) -> Column:
    """multimap_agg(K,V) (multimapagg/MultimapAggregationFunction.java:
    115-116): map<K, array<V>>; NULL keys skipped, NULL values kept,
    empty → NULL."""
    entries = F.collect_list(F.when(
        _c(k).isNotNull(),
        F.struct(_c(k).alias("key"), _c(v).alias("value"))))
    keys = F.nullif(
        F.array_distinct(F.transform(entries, lambda e: e.getField("key"))),
        F.array())
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda kk: F.transform(
                F.filter(entries, lambda e: e.getField("key") == kk),
                lambda e: e.getField("value"),
            ),
        ),
    )


@register("histogram")
def histogram(c) -> Column:
    """histogram(x) (histogram/Histogram.java:117): map<value,count>
    composed from collect_list + HOFs (exact; for huge cardinality use
    groupBy).  NULL keys skipped; empty → NULL."""
    vals = F.collect_list(_c(c))
    keys = F.nullif(F.array_distinct(vals), F.array())
    return F.map_from_arrays(
        keys,
        F.transform(keys, lambda k: F.size(F.filter(vals, lambda v: v == k)).cast("bigint")),
    )


@register("numeric_histogram")
def numeric_histogram(b, c, w=None) -> Column:
    """numeric_histogram(buckets, x[, weight]) (NumericHistogram.java /
    DoubleHistogramAggregation.java): map<double,double> of bucket key →
    total weight.  The reference's sketch is an adaptive V-optimal merge
    with engine-defined bucket boundaries; this is the deterministic
    equi-width construction over [min, max] keyed by bucket midpoint —
    same shape and arity, reproducible cross-engine.  Bounded-cardinality
    (collect_list) like reduce_agg; for unbounded groups pre-bucket with
    width_bucket + groupBy (the scale path, cf. plans/aggregates.py).
    """
    nb = F.lit(int(b)) if isinstance(b, int) else _c(b).cast("int")
    pairs = F.collect_list(
        F.struct(
            _c(c).cast("double").alias("v"),
            (F.lit(1.0) if w is None else _c(w).cast("double")).alias("w"),
        )
    )
    vs = F.transform(pairs, lambda p: p.getField("v"))
    lo, hi = F.array_min(vs), F.array_max(vs)
    width = F.when(hi == lo, F.lit(1.0)).otherwise((hi - lo) / nb.cast("double"))

    def bucket(v: Column) -> Column:
        return F.least(nb - 1, F.floor((v - lo) / width).cast("int"))

    general = F.map_from_entries(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), nb - 1),
                lambda i: F.struct(
                    (lo + (i.cast("double") + 0.5) * width).alias("key"),
                    F.aggregate(
                        F.filter(pairs, lambda p: bucket(p.getField("v")) == i),
                        F.lit(0.0),
                        lambda acc, p: acc + p.getField("w"),
                    ).alias("value"),
                ),
            ),
            lambda e: e.getField("value") > 0,
        )
    )
    single = F.map_from_arrays(
        F.array(lo),
        F.array(F.aggregate(pairs, F.lit(0.0), lambda a, p: a + p.getField("w"))),
    )
    return (
        F.when(F.size(pairs) == 0, F.lit(None))
        .when(hi == lo, single)
        .otherwise(general)
    )


def max_n(c, n: int) -> Column:
    """max(x, n) (MaxNAggregationFunction, TypedHeap): n largest values;
    NULL — not [] — over zero non-null inputs (output:148 appendNull)."""
    return F.nullif(
        F.slice(F.sort_array(F.collect_list(_c(c)), asc=False), 1, n),
        F.array())


def min_n(c, n: int) -> Column:
    return F.nullif(
        F.slice(F.sort_array(F.collect_list(_c(c)), asc=True), 1, n),
        F.array())


def _by_n_pairs(v, o) -> Column:
    # NULL keys never enter the heap (AbstractMinMaxBy input:169 — the
    # key channel is non-nullable); NULL values are kept
    return F.collect_list(F.when(
        _c(o).isNotNull(), F.struct(_c(o).alias("o"), _c(v).alias("v"))))


def max_by_n(v, o, n: int) -> Column:
    """max_by(x, y, n) (AbstractMinMaxByNAggregationFunction): x's for the n
    largest y's — struct-sort construction; NULL over zero retained rows."""
    pairs = _by_n_pairs(v, o)
    return F.nullif(
        F.slice(F.transform(F.reverse(F.array_sort(pairs)),
                            lambda s: s.getField("v")), 1, n),
        F.array())


def min_by_n(v, o, n: int) -> Column:
    pairs = _by_n_pairs(v, o)
    return F.nullif(
        F.slice(F.transform(F.array_sort(pairs),
                            lambda s: s.getField("v")), 1, n),
        F.array())


@register("reduce_agg")
def reduce_agg(c, initial, merge_two) -> Column:
    """reduce_agg (ReduceAggregationFunction.java): fold all input values
    with a binary lambda.  Bounded-cardinality construction via
    collect_list + aggregate (the reference evaluates the lambda per row;
    for unbounded groups prefer a dedicated built-in aggregate)."""
    return F.aggregate(F.collect_list(_c(c)), F.lit(initial), merge_two)


# merge(HyperLogLog) aggregate (MergeHyperLogLogAggregation.java) — the
# polymorphic reference name; HLL is by far the common operand.
register("merge")(lambda c: F.hll_union_agg(_c(c)))


@register("empty_approx_set")
def empty_approx_set() -> Column:
    """empty_approx_set() (HyperLogLogFunctions.java) — literal empty sketch.

    Computed once per session from an empty aggregation; cached bytes become
    a Column literal so repeated calls cost nothing.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    key = "_presto_spark_empty_hll"
    cached = getattr(spark, key, None)
    if cached is None:
        cached = spark.range(0).agg(F.hll_sketch_agg("id").alias("s")).collect()[0]["s"]
        setattr(spark, key, cached)
    return F.lit(bytearray(cached))
