"""facebook_presto_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference engine (dain/facebook-presto).

This is NOT a port of the reference's Java executor.  Spark already provides
the distributed execution engine (shuffle, codegen, spill, scheduling) that
the reference implements by hand in ``presto-main`` (see SURVEY.md §4.3); what
this package provides is the *semantic layer*:

- ``session``   — a tuned SparkSession factory (AQE, Arrow, partition sizing).
- ``catalog``   — schema-on-read registration of parquet tables as views
                  (the reference's Catalog→Schema→Table model,
                  presto-spi ConnectorMetadata.java:56).
- ``functions`` — the reference's ~400-function library (FunctionRegistry.java:418-665)
                  re-expressed as Spark Column builders: built-ins first,
                  composed expressions second, Arrow-vectorized pandas UDFs last.
- ``engine``    — ``PrestoSparkEngine.sql()``: Presto-dialect SQL in,
                  DataFrame out (the reference's statement lifecycle).
- ``sqlfront``  — the dialect translator behind it.
- ``ddl``       — CTAS / INSERT / DELETE / SHOW / DESCRIBE / EXPLAIN ANALYZE.
- ``sources``   — ORC/JSON/CSV source-sink round-trips (connector surface).
- ``properties``— SET SESSION property surface → Spark conf.
- ``plans``     — full queries (TPC-H adapted to the driver's star schema,
                  plus the same 22 as raw Presto-dialect SQL text, operator
                  coverage, and the aggregate long-tail).
- ``pipeline``  — large-scale training-data ops: dedup (exact / minhash-LSH /
                  simhash / n-gram jaccard / embedding cosine), similarity
                  search, text analysis, multimodal column plumbing.
- ``streaming`` — Structured Streaming mirror of the batch operators
                  (the reference is batch-only, SURVEY.md §2.5 — this is the
                  north-star extension).

Scale design: every operator is declarative DataFrame/SQL so Catalyst handles
predicate pushdown, column pruning, partial aggregation, and AQE handles
shuffle sizing / skew / broadcast decisions at 100 TB.  Python row loops and
driver-side collects are forbidden in the data path.
"""

from facebook_presto_spark.session import get_spark, stop_spark
from facebook_presto_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "stop_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
