"""Source/sink formats: the reference's connector surface on Spark readers.

The reference ships per-format connectors (presto-hive with ORC/parquet/
RCFile/text via HiveStorageFormat, presto-kafka for JSON/CSV-encoded
topics, presto-cassandra, …).  Spark's DataSource V2 is the uniform
equivalent: every format below gives split generation, schema inference
or enforcement, predicate pushdown (columnar formats), and the two-phase
commit on write.

Demonstrated formats: parquet (primary, everywhere), ORC, JSON lines,
CSV, JDBC (real round-trip through embedded Derby — the
presto-base-jdbc surface), and presto-kafka's offset-range split
semantics (real over file-backed segments; the live-broker registration
raises clearly in this connector-less environment).  Each round-trip
query writes a slice out through the target connector, reads it back,
and aggregates — the oracle checks the result against the original
parquet, proving no data loss through the format.

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


def _roundtrip(fmt: str, name: str | None = None, **options: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
        back = write_read(nation, fmt, _scratch(f"src_{name or fmt}"), **options)
        return _agg(back)

    return run


# --------------------------------------------------------------------------
# JDBC connector (presto-base-jdbc/.../BaseJdbcClient.java): registration
# layer over Spark's JDBC source.  Spark supplies what BaseJdbcClient
# hand-rolls — split generation (partitionColumn/numPartitions ↔
# QueryBuilder ranges), predicate pushdown into the remote WHERE clause,
# schema mapping.  Exercised for real against embedded Derby (the one
# JDBC engine shipped with Spark).


def register_jdbc(
    spark: SparkSession, view: str, url: str, table: str, **options: str
) -> DataFrame:
    """Register a remote JDBC table as a queryable view — the analogue of
    a presto-base-jdbc catalog entry.  Extra ``options`` pass through to
    the Spark reader (partitionColumn/lowerBound/upperBound/numPartitions
    for parallel split reads, pushDownPredicate is on by default)."""
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**options)
        .load()
    )
    df.createOrReplaceTempView(view)
    return df


def jdbc_write(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               **options: str) -> None:
    """JDBC sink (BaseJdbcClient.buildInsertSql two-phase equivalent —
    Spark stages inserts per partition and commits per task)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**options)
        .mode(mode)
        .save()
    )


_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def source_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → embedded Derby over real JDBC → registered back as a
    view → aggregate; the oracle checks against the original parquet, so
    a hash-match proves lossless JDBC type round-tripping."""
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    db = _scratch("jdbc_derby")
    url = f"jdbc:derby:{db};create=true"
    jdbc_write(nation, url, "NATION", driver=_DERBY_DRIVER)
    back = register_jdbc(spark, "nation_jdbc", url, "NATION",
                         driver=_DERBY_DRIVER)
    return _agg(back)


def source_jdbc_split_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel JDBC split read — the part of presto-base-jdbc that
    matters at scale (JdbcSplitManager partitions the table into
    per-worker splits; Spark's partitionColumn/lowerBound/upperBound/
    numPartitions generates the same WHERE-range splits).  customer →
    Derby, read back as 4 range splits with a pushed-down predicate,
    aggregate; hash-match against parquet proves the split union is
    lossless and the filter reached the remote side.

    Dialect note: Derby is the only JDBC engine in this environment
    (pyspark jars: derby*.jar; no H2/Postgres/SQLite driver, and DuckDB
    exposes no JDBC endpoint to Python) — the dialect surface is
    exercised on one engine; the register_jdbc plumbing is
    engine-agnostic (COVERAGE.md records the single-dialect limit)."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    db = _scratch("jdbc_derby_splits")
    url = f"jdbc:derby:{db};create=true"
    jdbc_write(cust, url, "CUSTOMER", driver=_DERBY_DRIVER)
    hi = cust.agg(F.max("c_custkey")).first()[0]
    back = register_jdbc(
        spark, "customer_jdbc", url, "CUSTOMER",
        driver=_DERBY_DRIVER,
        partitionColumn="C_CUSTKEY", lowerBound="1", upperBound=str(hi + 1),
        numPartitions="4",
    )
    assert back.rdd.getNumPartitions() == 4, "expected 4 JDBC range splits"
    return (
        back.filter(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("c_nationkey")
    )


_JDBC_SPLIT_SQL = """
SELECT c_nationkey, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum
FROM customer WHERE c_acctbal > 0
GROUP BY c_nationkey ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# Kafka connector (presto-kafka).  Two layers:
#
# - register_kafka: the real `spark.read.format("kafka")` registration
#   with the reference's offset-range split semantics mapped onto
#   startingOffsets/endingOffsets JSON.  The spark-sql-kafka connector
#   jar is NOT in this environment (and there is no broker), so this
#   raises a clear error here — partial by environment, not stubbed
#   silently.
# - kafka_segment_read: the offset-range SEMANTICS (KafkaRecordSet.java:
#   144-160 — split [start, end), message kept iff start ≤ offset < end,
#   exclusive end) exercised for real over file-backed topic segments
#   carrying the connector's internal columns (_partition_id,
#   _partition_offset, _key, _message — KafkaInternalFieldDescription).


def register_kafka(
    spark: SparkSession, view: str, brokers: str, topic: str,
    offset_ranges: dict[int, tuple[int, int]] | None = None,
) -> DataFrame:
    """Register a Kafka topic for batch reads with per-partition offset
    ranges, presto-kafka's split model (KafkaSplit start/end →
    startingOffsets/endingOffsets JSON)."""
    import json

    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
    )
    if offset_ranges:
        starts = {topic: {str(p): s for p, (s, _) in offset_ranges.items()}}
        ends = {topic: {str(p): e for p, (_, e) in offset_ranges.items()}}
        reader = reader.option("startingOffsets", json.dumps(starts)) \
                       .option("endingOffsets", json.dumps(ends))
    try:
        df = reader.load()
    except Exception as e:  # pragma: no cover - depends on environment
        raise RuntimeError(
            "Kafka batch source requires the spark-sql-kafka connector "
            "jar and a reachable broker (neither is present in this "
            "environment). The offset-range split semantics are "
            "exercised by kafka_segment_read instead."
        ) from e
    df.createOrReplaceTempView(view)
    return df


def kafka_segment_read(
    spark: SparkSession, path: str,
    offset_ranges: dict[int, tuple[int, int]],
) -> DataFrame:
    """Batch-read file-backed topic segments applying presto-kafka's
    split semantics: each partition's split is [start, end) over
    ``_partition_offset`` — start inclusive, end exclusive, exactly
    KafkaRecordSet.advanceNextPosition (KafkaRecordSet.java:144-160)."""
    seg = spark.read.parquet(path)
    cond = None
    for p, (start, end) in offset_ranges.items():
        this = (
            (F.col("_partition_id") == p)
            & (F.col("_partition_offset") >= start)
            & (F.col("_partition_offset") < end)
        )
        cond = this if cond is None else (cond | this)
    return seg.filter(cond if cond is not None else F.lit(False))


N_KAFKA_PARTITIONS = 4
KAFKA_RANGES = {0: (10, 200), 1: (0, 150), 2: (25, 175), 3: (50, 10 ** 9)}


def source_kafka_offset_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders rendered as a 4-partition topic (key = orderkey, value =
    JSON message, offset = per-partition arrival order), then read back
    through the offset-range split filter and aggregated per partition.
    The oracle recomputes the same ranges relationally."""
    from pyspark.sql import Window as W

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    part = (F.col("o_orderkey") % N_KAFKA_PARTITIONS).cast("int")
    w = W.partitionBy(part).orderBy("o_orderkey")
    topic = orders.select(
        part.alias("_partition_id"),
        (F.row_number().over(w) - 1).cast("long").alias("_partition_offset"),
        F.col("o_orderkey").cast("string").alias("_key"),
        F.to_json(F.struct("o_orderkey", "o_totalprice", "o_orderstatus")).alias(
            "_message"
        ),
    )
    seg_path = _scratch("kafka_segments")
    topic.write.mode("overwrite").parquet(seg_path)
    got = kafka_segment_read(spark, seg_path, KAFKA_RANGES)
    parsed = got.select(
        "_partition_id",
        "_partition_offset",
        F.get_json_object("_message", "$.o_orderkey").cast("long").alias("k"),
    )
    return (
        parsed.groupBy("_partition_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_partition_offset").alias("first_offset"),
            F.max("_partition_offset").alias("last_offset"),
            F.sum("k").alias("key_sum"),
        )
        .orderBy("_partition_id")
    )


# Second split-semantics fixture (round 5): a partition's offset range
# served by MULTIPLE half-open sub-splits (KafkaSplitManager chunks each
# partition's [low, high] into messagesPerSplit-sized KafkaSplits;
# KafkaRecordSet.java:152-178 then enforces [start, end) per split) over
# segments written INTERLEAVED across partitions and out of offset
# order.  The union of sub-splits must reconstruct each partition's
# range exactly once — no loss at the seams, no double-read — whatever
# the physical file layout.  Includes an empty split ([5, 5)) and a
# seam split of width 1 ([50, 51)).
KAFKA_SUBSPLITS = [
    (0, 0, 100), (0, 100, 213),
    (1, 7, 50), (1, 50, 51), (1, 51, 10 ** 9),
    (2, 5, 5), (2, 5, 150),
]


def source_kafka_interleaved_splits(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders as a 3-partition topic stored as interleaved out-of-order
    segment files; every sub-split is an INDEPENDENT filtered scan (one
    KafkaRecordSet per KafkaSplit), unioned and aggregated per
    partition.  count(*) = count(DISTINCT offset) proves the half-open
    seams neither drop nor duplicate messages."""
    from pyspark.sql import Window as W

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    part = (F.col("o_orderkey") % 3).cast("int")
    w = W.partitionBy(part).orderBy("o_orderkey")
    topic = orders.select(
        part.alias("_partition_id"),
        (F.row_number().over(w) - 1).cast("long").alias("_partition_offset"),
        F.col("o_orderkey").cast("string").alias("_key"),
        F.to_json(F.struct("o_orderkey", "o_totalprice")).alias("_message"),
    )
    # segment files interleave partitions and offset blocks — the
    # on-disk order carries no information the split math could lean on
    seg = topic.withColumn(
        "_segment",
        ((F.col("_partition_offset") / 64).cast("int") * 3
         + F.col("_partition_id")) % 4,
    )
    seg_path = _scratch("kafka_interleaved_segments")
    seg.write.mode("overwrite").partitionBy("_segment").parquet(seg_path)
    reads = [
        kafka_segment_read(spark, seg_path, {p: (s, e)})
        for (p, s, e) in KAFKA_SUBSPLITS
    ]
    got = reads[0]
    for r in reads[1:]:
        got = got.unionByName(r)
    parsed = got.select(
        "_partition_id",
        "_partition_offset",
        F.get_json_object("_message", "$.o_orderkey").cast("long").alias("k"),
    )
    return (
        parsed.groupBy("_partition_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_partition_offset").alias("n_distinct"),
            F.min("_partition_offset").alias("first_offset"),
            F.max("_partition_offset").alias("last_offset"),
            F.sum("k").alias("key_sum"),
        )
        .orderBy("_partition_id")
    )


_KAFKA_SUBSPLIT_SQL = """
WITH topic AS (
  SELECT CAST(o_orderkey % 3 AS INT) AS p,
         CAST(row_number() OVER (
             PARTITION BY o_orderkey % 3
             ORDER BY o_orderkey) - 1 AS BIGINT) AS off,
         o_orderkey AS k
  FROM orders
), splits(p, s, e) AS (
  VALUES (0, 0, 100), (0, 100, 213),
         (1, 7, 50), (1, 50, 51), (1, 51, 1000000000),
         (2, 5, 5), (2, 5, 150)
)
SELECT t.p AS _partition_id, count(*) AS n,
       count(DISTINCT t.off) AS n_distinct,
       min(t.off) AS first_offset, max(t.off) AS last_offset,
       CAST(sum(t.k) AS BIGINT) AS key_sum
FROM topic t JOIN splits r ON t.p = r.p AND t.off >= r.s AND t.off < r.e
GROUP BY t.p ORDER BY t.p
"""


_KAFKA_RANGE_SQL = f"""
WITH topic AS (
  SELECT CAST(o_orderkey % {N_KAFKA_PARTITIONS} AS INT) AS p,
         CAST(row_number() OVER (
             PARTITION BY o_orderkey % {N_KAFKA_PARTITIONS}
             ORDER BY o_orderkey) - 1 AS BIGINT) AS off,
         o_orderkey AS k
  FROM orders
), ranges(p, s, e) AS (
  VALUES (0, 10, 200), (1, 0, 150), (2, 25, 175), (3, 50, 1000000000)
)
SELECT p AS _partition_id, count(*) AS n,
       min(off) AS first_offset, max(off) AS last_offset,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM topic JOIN ranges USING (p)
WHERE off >= s AND off < e
GROUP BY p ORDER BY p
"""


QUERIES = {
    "source_orc_roundtrip": _roundtrip("orc"),
    "source_json_roundtrip": _roundtrip("json"),
    "source_csv_roundtrip": _roundtrip("csv", header="true"),
    # Hive TEXTFILE (HiveStorageFormat.TEXTFILE — LazySimpleSerDe's ^A
    # default field delimiter), the reference's text-table format
    "source_textfile_roundtrip": _roundtrip("csv", name="textfile", sep="\x01"),
    "source_jdbc_roundtrip": source_jdbc_roundtrip,
    "source_jdbc_split_read": source_jdbc_split_read,
    "source_kafka_offset_range": source_kafka_offset_range,
    "source_kafka_interleaved_splits": source_kafka_interleaved_splits,
}

ORACLE = {
    "source_orc_roundtrip": _AGG_SQL,
    "source_json_roundtrip": _AGG_SQL,
    "source_csv_roundtrip": _AGG_SQL,
    "source_textfile_roundtrip": _AGG_SQL,
    "source_jdbc_roundtrip": _AGG_SQL,
    "source_jdbc_split_read": _JDBC_SPLIT_SQL,
    "source_kafka_offset_range": _KAFKA_RANGE_SQL,
    "source_kafka_interleaved_splits": _KAFKA_SUBSPLIT_SQL,
}
