"""Window-function registry entries (operator/window/, registered at
metadata/FunctionRegistry.java:419-429).

These are thin names-to-builtins bindings so the registry's name surface is
complete; frames/partitioning are supplied by the caller's WindowSpec via
``.over(w)`` exactly as the reference's WindowOperator consumes FrameInfo.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


register("row_number")(lambda: F.row_number())
register("rank")(lambda: F.rank())
register("dense_rank")(lambda: F.dense_rank())
register("percent_rank")(lambda: F.percent_rank())
register("cume_dist")(lambda: F.cume_dist())
register("ntile")(lambda n: F.ntile(n))
register("first_value")(lambda c: F.first_value(_c(c)))
register("last_value")(lambda c: F.last_value(_c(c)))
register("nth_value")(lambda c, n: F.nth_value(_c(c), n))
register("lag")(lambda c, off=1, default=None: F.lag(_c(c), off, default))
register("lead")(lambda c, off=1, default=None: F.lead(_c(c), off, default))
