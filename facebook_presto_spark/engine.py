"""PrestoSparkEngine — the user-facing entry point.

The reference's query lifecycle (SURVEY.md §3.1) is:

    POST /v1/statement → parse (SqlParser.java:45) → analyze
    (StatementAnalyzer.java:216) → plan (LogicalPlanner.java:150) →
    optimize → fragment → schedule → execute.

On Spark all stages after parsing belong to Catalyst/AQE.  The engine
therefore does exactly two things:

1. registers the catalog (parquet tables as views — catalog.py), and
2. translates Presto-dialect SQL to Spark SQL (sqlfront/) and hands it to
   ``spark.sql``.

Usage::

    from facebook_presto_spark.engine import PrestoSparkEngine
    eng = PrestoSparkEngine.for_dir("/root/testdata/sf0.01")
    df = eng.sql("SELECT strpos(name, 'a') FROM nation WHERE n_nationkey < 5")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from facebook_presto_spark.catalog import DEFAULT_SF_DIR, register_views
from facebook_presto_spark.session import get_spark
from facebook_presto_spark.sqlfront import translate


class PrestoSparkEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def for_dir(cls, sf_dir: str = DEFAULT_SF_DIR, spark: SparkSession | None = None) -> "PrestoSparkEngine":
        """Engine with the star-schema tables under ``sf_dir`` registered."""
        spark = spark or get_spark()
        register_views(spark, sf_dir)
        return cls(spark)

    def translate(self, presto_sql: str) -> str:
        """Presto-dialect SQL → the Spark SQL string that will run."""
        return translate(presto_sql)

    def sql(self, presto_sql: str) -> DataFrame:
        """Run Presto-dialect SQL; returns a lazy DataFrame.

        ``SET SESSION <prop> = <value>`` statements apply the reference's
        session-property surface (SystemSessionProperties.java) to the
        Spark conf and return an empty OK relation, like the reference's
        coordinator does.  Everything else is translated and planned by
        Catalyst — which performs the reference's whole optimizer sequence
        (PlanOptimizers.java:221-502): pushdown, pruning, join selection —
        lazily, until an action runs.
        """
        from facebook_presto_spark.properties import (
            parse_set_session,
            set_session_property,
        )

        set_stmt = parse_set_session(presto_sql)
        if set_stmt is not None:
            set_session_property(self.spark, *set_stmt)
            return self.spark.sql("SELECT true AS ok WHERE false")
        return self.spark.sql(translate(presto_sql))

    def explain(self, presto_sql: str) -> str:
        """Formatted physical plan for a Presto-dialect query."""
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.sql(presto_sql).explain("formatted")
        return buf.getvalue()
