"""The reference's function library re-expressed as Spark Column builders.

Importing this package populates the registry (like the reference's
FunctionRegistry constructor, metadata/FunctionRegistry.java:418 — one
registration block per function family).  Use:

    from facebook_presto_spark import functions as pf
    df.select(pf.call("split_part", "text", " ", 2))

``registry.SLOW_PATH`` lists the names that fall back to Arrow-vectorized
pandas UDFs — everything else is whole-stage-codegen JVM expressions.
"""

from facebook_presto_spark.functions import (  # noqa: F401  (registration side effects)
    agg_fns,
    array_fns,
    binary_fns,
    datetime_fns,
    geo_fns,
    json_fns,
    map_fns,
    math_fns,
    ml_fns,
    sketch_fns,
    string_fns,
    teradata_fns,
    window_fns,
)
from facebook_presto_spark.functions.registry import REGISTRY, SLOW_PATH, call, names

__all__ = ["REGISTRY", "SLOW_PATH", "call", "names"]
