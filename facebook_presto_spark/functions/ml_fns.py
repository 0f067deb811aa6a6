"""ML scalar functions (presto-ml plugin).

Reference: presto-ml/.../MLFeaturesFunctions.java — ``features(x0, x1, …)``
builds the map<bigint,double> feature vector consumed by learn_*/classify/
regress.  The model-producing aggregations live in
facebook_presto_spark.pipeline.ml (they are relational operators, not
scalars).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


@register("features")
def features(*cols) -> Column:
    keys = F.array(*[F.lit(i).cast("bigint") for i in range(len(cols))])
    vals = F.array(*[_c(c).cast("double") for c in cols])
    return F.map_from_arrays(keys, vals)
