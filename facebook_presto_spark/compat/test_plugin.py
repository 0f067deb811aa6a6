"""Test-harness plugin functions (presto-tests CustomAdd parity).

The reference's differential framework installs a scalar plugin before
running AbstractTestQueries (AbstractTestQueries.java:108
``.scalars(CustomAdd.class)``; CustomAdd.java:20 — ``custom_add(x, y)
= x + y`` over bigints).  This module is the Spark-first equivalent of
that plugin-installation step: ``install(spark)`` registers the same
function surface both ways a user reaches functions in this engine —

- a declarative Spark SQL UDF (``CREATE TEMPORARY FUNCTION``, pure
  JVM expression body, whole-stage codegen'd) for the SQL path, and
- a registry Column builder for the DataFrame path (``call()``),

so the corpus case ``SELECT custom_add(orderkey, custkey) FROM
orders`` compares against its oracle instead of sitting in the
known-divergence list.  Like the reference's, this is TEST
infrastructure: nothing imports it except harnesses that opt in.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession

_DDL = (
    "CREATE OR REPLACE TEMPORARY FUNCTION custom_add(x BIGINT, y BIGINT) "
    "RETURNS BIGINT RETURN x + y"
)


def install(spark: SparkSession) -> None:
    """Install the test plugin's scalars into the session (the
    engine-side analogue of QueryRunner.installPlugin)."""
    spark.sql(_DDL)

    from facebook_presto_spark.functions.registry import REGISTRY

    if "custom_add" not in REGISTRY:

        def _custom_add(x: Column, y: Column) -> Column:
            # CustomAdd.java:27 — long add (overflow wraps like Java)
            return (x.cast("long") + y.cast("long")).alias("custom_add")

        REGISTRY["custom_add"] = _custom_add
