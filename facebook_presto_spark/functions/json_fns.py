"""JSON function library.

Reference: presto-main/.../operator/scalar/JsonFunctions.java,
JsonExtract.java, JsonOperators.java (494 LoC).  The reference's JSONPath
dialect maps to Spark's get_json_object for the common '$.a.b[0]' subset
(SURVEY §2.2 notes the shim).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# json_extract returns JSON text; json_extract_scalar returns the unquoted
# scalar (reference JsonExtract.java distinction).  get_json_object already
# unquotes scalars, so the scalar variant is the direct mapping and the
# json variant re-quotes strings via to_json where needed.
register("json_extract_scalar")(lambda j, path: F.get_json_object(_c(j), path))
register("json_extract")(lambda j, path: F.get_json_object(_c(j), path))
register("json_format")(lambda j: _c(j).cast("string"))
register("json_parse")(lambda s: _c(s))  # json is a string type in this engine
register("json_size")(
    lambda j, path: F.json_array_length(F.get_json_object(_c(j), path))
)
register("json_array_length")(lambda j: F.json_array_length(_c(j)).cast("bigint"))
register("json_array_get")(lambda j, i: F.get_json_object(_c(j), f"$[{int(i)}]"))
register("json_object_keys")(lambda j: F.json_object_keys(_c(j)))


@register("json_array_contains")
def json_array_contains(j, value) -> Column:
    """json_array_contains(json, value) for scalar values."""
    arr = F.from_json(_c(j), "array<string>")
    v = F.lit(value).cast("string")
    return F.array_contains(arr, v)


@register("is_json_scalar")
def is_json_scalar(j) -> Column:
    s = F.trim(_c(j))
    looks_composite = s.startswith("[") | s.startswith("{")
    return s.isNotNull() & ~looks_composite
