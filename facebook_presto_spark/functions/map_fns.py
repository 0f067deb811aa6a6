"""Map function library.

Reference: presto-main/.../operator/scalar/Map*.java (~1500 LoC, registered
FunctionRegistry.java:600-612) + MapFilterFunction / MapTransformKey/Value
lambdas.  1:1 Spark built-ins (SURVEY §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


register("map")(
    lambda keys=None, values=None: F.map_from_arrays(_c(keys), _c(values))
    if keys is not None
    else F.create_map()
)
register("map_from_entries")(lambda e: F.map_from_entries(_c(e)))
register("map_entries")(lambda m: F.map_entries(_c(m)))
# map_concat: the value from the LAST map containing a key wins
# (MapConcatFunction.java:123-170 walks back-to-front keeping
# first-seen); Spark's map_concat raises DUPLICATED_MAP_KEY instead
def _map_concat_last_wins(*ms):
    cols = [_c(m) for m in ms]
    if len(cols) == 1:
        return cols[0]
    entries = F.reverse(F.concat(*[F.map_entries(m) for m in cols]))
    keys = F.array_distinct(F.transform(entries, lambda e: e.getField("key")))
    vals = F.transform(
        keys,
        lambda k: F.element_at(
            F.filter(entries, lambda e: e.getField("key") == k), 1
        ).getField("value"),
    )
    return F.map_from_arrays(keys, vals)


register("map_concat")(_map_concat_last_wins)
register("map_keys")(lambda m: F.map_keys(_c(m)))
register("map_values")(lambda m: F.map_values(_c(m)))
register("map_filter")(lambda m, fn: F.map_filter(_c(m), fn))
register("transform_keys")(lambda m, fn: F.transform_keys(_c(m), fn))
register("transform_values")(lambda m, fn: F.transform_values(_c(m), fn))
register("map_zip_with")(lambda a, b, fn: F.map_zip_with(_c(a), _c(b), fn))


# multimap_from_entries (MultimapFromEntriesFunction.java):
# array<struct<k,v>> → map<k, array<v>>; composed from HOFs.
@register("multimap_from_entries")
def multimap_from_entries(entries) -> Column:
    e = _c(entries)
    keys = F.array_distinct(F.transform(e, lambda s: s.getField("key")))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(
                F.filter(e, lambda s: s.getField("key") == k),
                lambda s: s.getField("value"),
            ),
        ),
    )
