"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H q01 pricing summary) at sf0.001.
``queries()`` — every implemented query/operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from facebook_presto_spark.plans import tpch

    return tpch.q01(spark, "/root/testdata/sf0.001")


def _modules():
    from facebook_presto_spark.plans import (
        aggregates,
        functions_showcase,
        geospatial,
        presto_sql,
        relational,
        skew,
        tpcds,
        tpch,
    )
    from facebook_presto_spark import connectors, ddl, hive_catalog, sources
    from facebook_presto_spark.pipeline import (
        curation,
        dedup,
        ml,
        multimodal,
        similarity,
        text,
    )
    from facebook_presto_spark.streaming import windows as stream_windows

    return (
        tpch, presto_sql, relational, aggregates, functions_showcase, ddl,
        sources, connectors, hive_catalog, dedup, similarity, text,
        curation, multimodal, stream_windows, geospatial, ml, skew, tpcds,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
    return out
