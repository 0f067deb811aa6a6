"""Source/sink formats: the reference's connector surface on Spark readers.

The reference ships per-format connectors (presto-hive with ORC/parquet/
RCFile/text via HiveStorageFormat, presto-kafka for JSON/CSV-encoded
topics, presto-cassandra, …).  Spark's DataSource V2 is the uniform
equivalent: every format below gives split generation, schema inference
or enforcement, predicate pushdown (columnar formats), and the two-phase
commit on write.

Demonstrated formats: parquet (primary, everywhere), ORC, JSON lines,
CSV.  Each round-trip query writes a slice out in the target format,
reads it back, and aggregates — the oracle checks the result against the
original parquet, proving no data loss through the format.

Scale notes: ORC/parquet carry pushdown + pruning; JSON/CSV scans are
schema-on-read full scans (same as the reference's text-format Hive
tables) — at 100 TB you land raw JSON/CSV once, convert to columnar, and
point the engine at that (exactly what `ddl.create_table_as` does).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCRATCH = "/root/repo/.scratch"


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    path = os.path.join(_SCRATCH, name)
    if os.path.exists(path):
        shutil.rmtree(path)
    return path


def write_read(df: DataFrame, fmt: str, path: str, **options: str) -> DataFrame:
    """Write ``df`` in ``fmt`` and read it back with an explicit schema
    (schema-on-read: formats that don't embed types get the source's)."""
    df.write.format(fmt).options(**options).save(path)
    reader = df.sparkSession.read.format(fmt).options(**options)
    if fmt in ("json", "csv"):
        reader = reader.schema(df.schema)
    return reader.load(path)


_AGG_SQL = """
SELECT n_regionkey, count(*) AS n,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
       min(n_name) AS first_name
FROM nation
GROUP BY n_regionkey ORDER BY n_regionkey
"""


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


def _roundtrip(fmt: str, **options: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        back = write_read(nation, fmt, _scratch(f"src_{fmt}"), **options)
        return _agg(back)

    return run


QUERIES = {
    "source_orc_roundtrip": _roundtrip("orc"),
    "source_json_roundtrip": _roundtrip("json"),
    "source_csv_roundtrip": _roundtrip("csv", header="true"),
}

ORACLE = {
    "source_orc_roundtrip": _AGG_SQL,
    "source_json_roundtrip": _AGG_SQL,
    "source_csv_roundtrip": _AGG_SQL,
}
