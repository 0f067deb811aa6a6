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

The quantile digest is represented as the 101-point percentile grid
(array<double> of p0, p1 … p100) computed by Spark's exact ``percentile`` —
a strict-accuracy superset of the reference's qdigest estimate (same
precedent as approx_percentile_weighted in agg_fns.py).  ``value_at_quantile``
indexes the grid; accuracy is ±0.5 percentile rank, far inside the
reference's default qdigest error bound.
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
# Quantile digest

QDIGEST_GRID = [i / 100.0 for i in range(101)]


@register("qdigest_agg")
def qdigest_agg(c) -> Column:
    """qdigest(x) aggregate — QuantileDigestAggregationFunction.java:58.

    101-point exact percentile grid (deterministic superset of the
    reference's ~1%-error qdigest)."""
    return F.percentile(_c(c), F.lit(QDIGEST_GRID))


@register("value_at_quantile")
def value_at_quantile(qd, q: float) -> Column:
    """value_at_quantile(qdigest, q) — QuantileDigestFunctions.java:41."""
    return F.element_at(_c(qd), int(round(q * 100)) + 1)


@register("values_at_quantiles")
def values_at_quantiles(qd, qs) -> Column:
    """values_at_quantiles(qdigest, array) — QuantileDigestFunctions.java:65."""
    return F.array(*[value_at_quantile(qd, q) for q in qs])


# merge(qdigest) is intentionally NOT provided: percentile grids are not
# losslessly mergeable (unlike the reference's qdigest tree).  Re-aggregate
# from source values instead — Spark's partial/final split already gives the
# distributed merge the reference's merge() exists for.
