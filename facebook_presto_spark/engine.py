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

        Catalyst performs everything the reference's optimizer sequence
        (PlanOptimizers.java:221-502) does — pushdown, pruning, join
        selection — on the translated text; nothing is executed until an
        action is called.
        """
        return self.spark.sql(translate(presto_sql))

    def explain(self, presto_sql: str) -> str:
        """Formatted physical plan for a Presto-dialect query."""
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.sql(presto_sql).explain("formatted")
        return buf.getvalue()
