"""Array + higher-order function library.

Reference: presto-main/.../operator/scalar/Array*.java (43 files, ~2500 LoC;
registered FunctionRegistry.java:560-607) and the lambda functions
(ArrayTransformFunction.java, ArrayFilterFunction.java,
ArrayReduceFunction.java, ZipWithFunction.java; registered :644-645).
Spark 2.4+/3.x built-ins match almost 1:1 (SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


register("cardinality")(lambda a: F.cardinality(_c(a)).cast("bigint"))
register("contains")(lambda a, v: F.array_contains(_c(a), v))
register("element_at")(
    # works for arrays (1-based index) and maps (key) — reference semantics:
    # out-of-range/missing-key → NULL, which is exactly try_element_at.
    lambda a, i: F.try_element_at(_c(a), F.lit(i) if isinstance(i, (int, str)) else _c(i))
)
register("array_distinct")(lambda a: F.array_distinct(_c(a)))
# the reference iterates the LONGER array in its order
# (ArrayIntersectFunction.java:46-75); Spark keeps the first argument's
def _array_intersect(a, b):
    ca, cb = _c(a), _c(b)
    return F.when(F.size(ca) < F.size(cb),
                  F.array_intersect(cb, ca)) \
        .otherwise(F.array_intersect(ca, cb))


register("array_intersect")(_array_intersect)
register("array_union")(lambda a, b: F.array_union(_c(a), _c(b)))
register("array_except")(lambda a, b: F.array_except(_c(a), _c(b)))
register("array_join")(lambda a, sep, null_repl=None: F.array_join(_c(a), sep, null_repl))
# array_min/array_max: a NULL ELEMENT nulls the result
# (ArrayMinMaxUtils.java:41 returns null on the first null position);
# Spark's built-ins skip null elements instead
def _arr_minmax(fn):
    def rule(a):
        c = _c(a)
        return F.when(~F.exists(c, lambda e: e.isNull()), fn(c))
    return rule


register("array_max")(_arr_minmax(F.array_max))
register("array_min")(_arr_minmax(F.array_min))
register("array_position")(lambda a, v: F.array_position(_c(a), v).cast("bigint"))
register("array_remove")(lambda a, v: F.array_remove(_c(a), v))
register("array_sort")(
    lambda a, comparator=None: F.array_sort(_c(a)) if comparator is None else F.array_sort(_c(a), comparator)
)
register("arrays_overlap")(lambda a, b: F.arrays_overlap(_c(a), _c(b)))
# flatten skips NULL sub-arrays (TestArrayOperators.java:779-783);
# Spark's flatten nulls the whole result instead
register("flatten")(lambda a: F.flatten(
    F.filter(_c(a), lambda e: e.isNotNull())))
register("repeat")(lambda v, n: F.array_repeat(v if isinstance(v, Column) else F.lit(v), n))
register("sequence")(
    lambda start, stop, step=None: F.sequence(_lit(start), _lit(stop), _lit(step) if step is not None else None)
    if step is not None
    else F.sequence(_lit(start), _lit(stop))
)
register("shuffle")(lambda a: F.shuffle(_c(a)))
register("slice")(lambda a, start, length: F.slice(_c(a), start, length))
register("zip")(lambda *arrays: F.arrays_zip(*[_c(a) for a in arrays]))
register("array_sum")(
    lambda a: F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double"))
)
register("array_average")(
    lambda a: F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    / F.size(F.filter(_c(a), lambda v: v.isNotNull()))
)


def _lit(x):
    return F.lit(x) if isinstance(x, (int, float, str)) else _c(x)


# ngrams(array, n) (ArrayNgramsFunction.java) — composed from sequence +
# transform + slice; the same construction pipeline/dedup.py uses for
# shingles.
@register("ngrams")
def ngrams(a, n: int) -> Column:
    a = _c(a)
    count = F.size(a) - (n - 1)
    seq = F.transform(
        F.sequence(F.lit(1), F.greatest(count, F.lit(0))),
        lambda i: F.slice(a, i, n),
    )
    return F.when(F.size(a) >= n, seq).otherwise(F.array(a))


# --- higher-order functions (identical names in Spark) ---------------------
register("transform")(lambda a, fn: F.transform(_c(a), fn))
register("filter")(lambda a, fn: F.filter(_c(a), fn))
register("reduce")(
    # reference: reduce(array, initial, (state,x)->..., state->output)
    lambda a, initial, merge, finish=None: F.aggregate(
        _c(a), _lit(initial), merge, finish if finish is not None else (lambda s: s)
    )
)
register("zip_with")(lambda a, b, fn: F.zip_with(_c(a), _c(b), fn))
register("any_match")(lambda a, fn: F.exists(_c(a), fn))
register("all_match")(lambda a, fn: F.forall(_c(a), fn))
register("none_match")(lambda a, fn: ~F.exists(_c(a), fn))
