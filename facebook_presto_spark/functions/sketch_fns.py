"""SetDigest (MinHash) and quantile-digest sketch functions.

Reference surface:
- ``make_set_digest`` / ``merge_set_digest`` aggregates
  (presto-main/.../type/setdigest/BuildSetDigestAggregation.java,
  MergeSetDigestAggregation.java) and scalars ``cardinality``,
  ``intersection_cardinality``, ``jaccard_index``, ``hash_counts``
  (type/setdigest/SetDigestFunctions.java:45-115), registered at
  metadata/FunctionRegistry.java:647-649.
- ``qdigest_agg`` (operator/aggregation/QuantileDigestAggregationFunction.java:58)
  and scalars ``value_at_quantile`` / ``values_at_quantiles``
  (operator/scalar/QuantileDigestFunctions.java:41-91).

Spark-first design
------------------
The reference SetDigest is an HLL plus a bottom-k MinHash table of xxhash64
values (SetDigest.java:53-54 — NUMBER_OF_BUCKETS=2048, DEFAULT_MAX_HASHES=8192).
We represent the digest as the **sorted bottom-k array<bigint> of xxhash64
hashes** — pure JVM array built-ins (collect_set/array_sort/slice), mergeable
via array_union + re-sort + slice, no Python in the hot path.  The Jaccard
estimator is the standard bottom-k one (identical to SetDigest.jaccardIndex's
MinHash math): S = bottom-k of the union, J = |S ∩ A ∩ B| / |S|.  Like the
reference's ``isExact()`` fast path (SetDigestFunctions.java:59-61), every
operation is *exact* while per-group distinct counts stay ≤ k; beyond k the
bottom-k order-statistic estimator takes over.  Multiplicity counts
(``hash_counts``) are reported as 1 per retained hash: the reference only
consults counts on the exact-intersection path, which our set representation
already answers exactly.

Scale path: the in-aggregate builder collects distinct hashes per group
before slicing, which is fine up to millions of distinct values per group.
For 100 TB groups use :func:`bottom_k_hashes` — a two-level plan (distinct →
per-group window top-k) that Spark 4 executes with per-group heaps
(InferWindowGroupLimit), never materializing a full group in memory.

The quantile digest is a MERGEABLE deterministic sketch: a bucket-count
map keyed by the value truncated to its top 8 significant bits (bounded
cardinality, exact key-wise merge, ≤2^-7 relative value error — see the
section comment below).  ``value_at_quantile`` walks the sorted buckets
to the requested rank; ``merge_qdigest`` combines digests losslessly,
giving the distributed-combine semantics the reference's merge() exists
for (verified by the agg_qdigest_merge oracle: merge(parts) ≡
digest(whole)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from facebook_presto_spark.functions.registry import register

DEFAULT_MAX_HASHES = 8192  # SetDigest.java:54


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --------------------------------------------------------------------------
# SetDigest aggregates


@register("make_set_digest")
def make_set_digest(c, k: int = DEFAULT_MAX_HASHES) -> Column:
    """Aggregate: bottom-k MinHash digest of a column's values."""
    return F.slice(F.array_sort(F.collect_set(F.xxhash64(_c(c)))), 1, k)


@register("merge_set_digest")
def merge_set_digest(d, k: int = DEFAULT_MAX_HASHES) -> Column:
    """Aggregate: merge digests (union of hash sets, re-bottom-k'd)."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(_c(d))))), 1, k
    )


def bottom_k_hashes(df: DataFrame, group_cols: list[str], col: str,
                    k: int = DEFAULT_MAX_HASHES) -> DataFrame:
    """Scalable make_set_digest: per-group bottom-k via window group-limit.

    distinct (hash-shuffle, map-side combine) → row_number ≤ k (per-group
    heap under InferWindowGroupLimit) → sorted collect of ≤ k values.
    Bounded memory per group regardless of group size.
    """
    h = df.select(*group_cols, F.xxhash64(_c(col)).alias("__h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("__h")).alias("digest"))
    )


# --------------------------------------------------------------------------
# SetDigest scalars

_TWO_64 = float(2**64)
_MIN_LONG = float(-(2**63))


def _bottom_k_cardinality(d: Column, k: int) -> Column:
    """Exact below k; bottom-k order-statistic estimator at/above k.

    The k-th smallest of n uniform hashes sits at normalized position
    ≈ k/(n+1) of the [-2^63, 2^63) hash space → n ≈ (k-1)/p.
    """
    kth = F.element_at(d, F.size(d))  # largest retained hash
    p = (kth.cast("double") - F.lit(_MIN_LONG)) / F.lit(_TWO_64)
    est = F.round((F.size(d).cast("double") - 1.0) / p)
    return F.when(F.size(d) < k, F.size(d).cast("long")).otherwise(est.cast("long"))


@register("cardinality_setdigest")
def cardinality_setdigest(d, k: int = DEFAULT_MAX_HASHES) -> Column:
    """cardinality(setdigest) — SetDigestFunctions.java:47."""
    return _bottom_k_cardinality(_c(d), k)


@register("jaccard_index")
def jaccard_index(a, b, k: int = DEFAULT_MAX_HASHES) -> Column:
    """jaccard_index(d1, d2) — SetDigestFunctions.java:77-84.

    |S ∩ A ∩ B| / |S| where S = bottom-k of A ∪ B.
    """
    a, b = _c(a), _c(b)
    s = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    inter = F.array_intersect(F.array_intersect(s, a), b)
    return F.size(inter).cast("double") / F.size(s).cast("double")


@register("intersection_cardinality")
def intersection_cardinality(a, b, k: int = DEFAULT_MAX_HASHES) -> Column:
    """intersection_cardinality(d1, d2) — SetDigestFunctions.java:52-74.

    Exact set intersection while both digests are exact (size < k),
    otherwise round(jaccard × |A ∪ B|) clamped by min(|A|, |B|), exactly
    mirroring the reference's estimate-and-clamp logic.
    """
    a, b = _c(a), _c(b)
    exact = F.size(F.array_intersect(a, b)).cast("long")
    union = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    est = F.round(
        jaccard_index(a, b, k) * _bottom_k_cardinality(union, k).cast("double")
    ).cast("long")
    clamped = F.least(
        est, _bottom_k_cardinality(a, k), _bottom_k_cardinality(b, k)
    )
    return F.when((F.size(a) < k) & (F.size(b) < k), exact).otherwise(clamped)


@register("hash_counts")
def hash_counts(d) -> Column:
    """hash_counts(setdigest) → map<bigint,smallint> — SetDigestFunctions.java:87.

    Our digest stores distinct hashes, so every count is 1 (the reference
    uses counts only for exact intersection, which we answer set-wise).
    """
    d = _c(d)
    return F.map_from_arrays(
        d, F.transform(d, lambda _: F.lit(1).cast("smallint"))
    )


# --------------------------------------------------------------------------
# Quantile digest — a MERGEABLE deterministic sketch
#
# The reference's qdigest (QuantileDigestAggregationFunction.java:58,
# spi QuantileDigest) is a compressed counting tree over the int64
# domain: bounded size, lossless merge.  The twin here keeps those two
# properties with a simpler, oracle-reproducible structure: a bucket
# count map keyed by the value truncated to its top QDIGEST_BITS
# significant bits.  Bucket cardinality is bounded by construction
# (≤ 64·2^8 keys over the whole int64 domain), merging two
# digests is exact key-wise count addition (associative, commutative,
# deterministic — merge(per-group digests) ≡ digest(union), which the
# agg_qdigest_merge oracle verifies by computing the union directly),
# and the value error is ≤ 2^-(QDIGEST_BITS-1) relative (≈0.8%), the same
# headline accuracy as the reference's default maxError 0.01 (whose
# bound is rank-based — a documented semantic substitution, COVERAGE.md).
# Not Presto-serializable binary, also documented.

QDIGEST_BITS = 8  # top significant bits → ≤2^-(8-1) ≈ 0.8% value error


@register("qdigest_bucket")
def qdigest_bucket(v: Column) -> Column:
    """Value → its bucket floor (top QDIGEST_BITS significant bits kept).
    Registered as the scale-path primitive: pre-aggregate with
    ``groupBy(key, qdigest_bucket(x)).count`` then merge_qdigest.

    Exact integer arithmetic only: bit length via bin() string length
    (log2 on doubles is off-by-ulp near powers of two and would split
    buckets differently per engine), 2^shift via pow (exact for powers
    of two), truncation via modulo."""
    v = _c(v)
    a = F.abs(v)
    bitlen = F.when(a == 0, F.lit(0)).otherwise(F.length(F.bin(a)))
    shift = F.greatest(bitlen - F.lit(QDIGEST_BITS), F.lit(0))
    p2 = F.pow(F.lit(2.0), shift).cast("long")
    fl = a - (a % p2)
    return F.when(v < 0, -fl).otherwise(fl)


def _count_map(vals: Column) -> Column:
    keys = F.array_sort(F.array_distinct(vals))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys, lambda k: F.size(F.filter(vals, lambda v: v == k)).cast("bigint")
        ),
    )


@register("qdigest_agg")
def qdigest_agg(c) -> Column:
    """qdigest(x) aggregate → map<bucket,count>.

    Single-expression form folds collect_list like histogram() — bounded
    by group size.  The 100 TB spelling is the two-level relational
    pre-aggregation ``groupBy(key, qdigest_bucket(x)).count`` (see
    plans/aggregates.agg_qdigest_merge), which shuffles only (key,
    bucket, count) triples and feeds merge_qdigest."""
    return _count_map(F.collect_list(qdigest_bucket(_c(c).cast("long"))))


@register("merge_qdigest")
def merge_qdigest(qd) -> Column:
    """merge(qdigest) aggregate — key-wise count addition
    (QuantileDigestAggregationFunction 'merge' input function).  Exact:
    merge(digests of parts) == digest of the union."""
    entries = F.flatten(F.transform(F.collect_list(_c(qd)), F.map_entries))
    keys = F.array_sort(
        F.array_distinct(F.transform(entries, lambda e: e["key"]))
    )
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.aggregate(
                F.filter(entries, lambda e: e["key"] == k),
                F.lit(0).cast("bigint"),
                lambda acc, e: acc + e["value"],
            ),
        ),
    )


@register("value_at_quantile")
def value_at_quantile(qd, q: float) -> Column:
    """value_at_quantile(qdigest, q) — QuantileDigestFunctions.java:41.

    The smallest bucket whose cumulative count reaches rank
    max(1, ceil(q·N)) — a true lower bound within the digest's value
    error, matching the reference's lower-bound traversal."""
    entries = F.array_sort(F.map_entries(_c(qd)))  # struct sort: key first
    n = F.aggregate(
        entries, F.lit(0).cast("bigint"), lambda acc, e: acc + e["value"]
    )
    target = F.greatest(F.lit(1).cast("bigint"), F.ceil(F.lit(float(q)) * n))
    walk = F.aggregate(
        entries,
        F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(None).cast("bigint").alias("found"),
        ),
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.when(
                acc["found"].isNull() & (acc["cum"] + e["value"] >= target),
                e["key"],
            ).otherwise(acc["found"]).alias("found"),
        ),
    )
    return walk["found"]


@register("values_at_quantiles")
def values_at_quantiles(qd, qs) -> Column:
    """values_at_quantiles(qdigest, array) — QuantileDigestFunctions.java:65."""
    return F.array(*[value_at_quantile(qd, q) for q in qs])


