"""Hive partitioned-table catalog (facebook_presto_spark/hive_catalog.py).

Mirrors presto-hive behaviors: HiveTableProperties names, the
partition-ordering rule (HiveMetadata.java:1868), the "t$partitions"
system table (HiveMetadata.java:299-360), partition keys as
"partition key" extra info (HiveUtil.java:867), and — the scale point —
static partition elimination plus dynamic partition pruning in the
physical plan (HivePartitionManager.java:98 parity; DPP is the Spark
advantage SURVEY §4.2 records).
"""

import contextlib
import io

import pytest

from facebook_presto_spark import hive_catalog
from facebook_presto_spark.engine import PrestoSparkEngine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    cat = hive_catalog.get_catalog(spark)
    for schema in cat.list_schemas():
        for table in cat.list_tables(schema):
            cat.drop(schema, table, if_exists=True)
        if schema != "default":
            cat.drop_schema(schema, if_exists=True)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_ctas_partitioned_layout_and_readback(eng, spark, tmp_path):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.orders_p
        WITH (partitioned_by = ARRAY['o_orderpriority'])
        AS SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    """)
    # real key=value directories under the warehouse
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    dirs = os.listdir(f"{warehouse}/hive_web.db/orders_p")
    assert any(d.startswith("o_orderpriority=") for d in dirs)
    n = eng.sql("SELECT count(*) AS n FROM hive.web.orders_p").collect()
    assert n[0]["n"] == eng.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]


def test_partition_keys_must_be_last(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    with pytest.raises(ValueError, match="Partition keys must be the last"):
        eng.sql("""
            CREATE TABLE hive.web.bad
            WITH (partitioned_by = ARRAY['o_orderpriority'])
            AS SELECT o_orderpriority, o_orderkey FROM orders
        """)


def test_schema_and_table_error_surface(eng):
    with pytest.raises(ValueError, match="not found"):
        eng.sql("CREATE TABLE hive.nope.t AS SELECT * FROM region")
    eng.sql("CREATE SCHEMA hive.errs")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE SCHEMA hive.errs")
    eng.sql("CREATE TABLE hive.errs.t AS SELECT * FROM region")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE TABLE hive.errs.t AS SELECT * FROM region")
    eng.sql("CREATE TABLE IF NOT EXISTS hive.errs.t AS SELECT * FROM region")
    with pytest.raises(ValueError, match="Schema not empty"):
        eng.sql("DROP SCHEMA hive.errs")
    eng.sql("DROP TABLE hive.errs.t")
    eng.sql("DROP SCHEMA hive.errs")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("SELECT * FROM hive.errs.gone")


def test_partitions_system_table_typed(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.cust_p
        WITH (partitioned_by = ARRAY['c_nationkey'])
        AS SELECT c_custkey, c_acctbal, c_nationkey FROM customer
    """)
    rows = eng.sql(
        'SELECT * FROM hive.web."cust_p$partitions" ORDER BY c_nationkey'
    ).collect()
    assert [r["c_nationkey"] for r in rows] == sorted(
        r["c_nationkey"]
        for r in eng.sql(
            "SELECT DISTINCT c_nationkey FROM customer"
        ).collect()
    )
    # typed as the table column, not varchar
    assert rows[0].asDict()["c_nationkey"] is not None
    schema = eng.sql(
        'SELECT * FROM hive.web."cust_p$partitions"'
    ).schema
    table_type = dict(eng.sql("SELECT * FROM hive.web.cust_p").dtypes)
    assert schema["c_nationkey"].dataType.simpleString() == (
        table_type["c_nationkey"]
    )
    assert schema["c_nationkey"].dataType.simpleString() != "string"
    with pytest.raises(ValueError, match="does not have partition columns"):
        eng.sql("CREATE TABLE hive.web.flat AS SELECT * FROM region")
        eng.sql('SELECT * FROM hive.web."flat$partitions"').collect()


def test_insert_appends_partitions(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.ins_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region WHERE r_regionkey < 2
    """)
    eng.sql("""
        INSERT INTO hive.web.ins_p
        SELECT r_name, r_regionkey FROM region WHERE r_regionkey >= 2
    """)
    assert eng.sql("SELECT count(*) AS n FROM hive.web.ins_p").collect()[0]["n"] == 5
    parts = eng.sql('SELECT * FROM hive.web."ins_p$partitions"').collect()
    assert len(parts) == 5


def test_static_partition_elimination_in_plan(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.prune_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    plan = _plan(eng.sql(
        "SELECT r_name FROM hive.web.prune_p WHERE r_regionkey = 2"
    ))
    assert "PartitionFilters: [" in plan
    # the file index lists ONLY the matching directory
    assert "r_regionkey=2" in plan
    assert "r_regionkey=3" not in plan


def test_dynamic_partition_pruning_in_plan(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("DROP TABLE IF EXISTS hive.web.fact_p")
    eng.sql("DROP TABLE IF EXISTS hive.web.dim_t")
    eng.sql("""
        CREATE TABLE hive.web.fact_p
        WITH (partitioned_by = ARRAY['c_nationkey'])
        AS SELECT c_custkey, c_acctbal, c_nationkey FROM customer
    """)
    eng.sql("""
        CREATE TABLE hive.web.dim_t AS
        SELECT n_nationkey, n_name FROM nation
    """)
    plan = _plan(eng.sql("""
        SELECT count(*) AS n FROM hive.web.fact_p f
        JOIN hive.web.dim_t d ON f.c_nationkey = d.n_nationkey
        WHERE d.n_name = 'FRANCE'
    """))
    assert "dynamicpruning" in plan


def test_describe_and_infoschema_partition_key(eng, spark):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.meta_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    # hive tables present under their Presto names: catalog 'hive',
    # schema without the implementation prefix
    rows = eng.sql(
        "SELECT column_name, extra_info FROM information_schema.columns "
        "WHERE table_catalog = 'hive' AND table_schema = 'web' "
        "AND table_name = 'meta_p'"
    ).collect()
    info = {r["column_name"]: r["extra_info"] for r in rows}
    assert info["r_regionkey"] == "partition key"
    assert info["r_name"] is None


def test_show_create_table_renders_properties(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.sct_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    text = eng.sql("SHOW CREATE TABLE hive.web.sct_p").collect()[0][0]
    assert "partitioned_by = ARRAY['r_regionkey']" in text


def test_show_schemas_tables_catalogs(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.listme")
    eng.sql("CREATE TABLE hive.listme.t1 AS SELECT * FROM region")
    assert "listme" in [
        r["Schema"] for r in eng.sql("SHOW SCHEMAS FROM hive").collect()
    ]
    assert [r["Table"] for r in
            eng.sql("SHOW TABLES FROM hive.listme").collect()] == ["t1"]
    assert "hive" in [
        r["Catalog"] for r in eng.sql("SHOW CATALOGS").collect()
    ]


def test_rename_same_schema_and_cross_schema_raise(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.other")
    eng.sql("CREATE TABLE hive.web.rn1 AS SELECT * FROM region")
    eng.sql("ALTER TABLE hive.web.rn1 RENAME TO hive.web.rn2")
    assert eng.sql("SELECT count(*) AS n FROM hive.web.rn2").collect()[0]["n"] == 5
    with pytest.raises(Exception, match="does not exist"):
        eng.sql("SELECT * FROM hive.web.rn1").collect()
    with pytest.raises(ValueError, match="across schemas"):
        eng.sql("ALTER TABLE hive.web.rn2 RENAME TO hive.other.rn2")
    # partitioned table rename keeps every row readable (round 6: the
    # moved directory requires partition rediscovery)
    eng.sql("""
        CREATE TABLE hive.web.rnp1
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    eng.sql("ALTER TABLE hive.web.rnp1 RENAME TO hive.web.rnp2")
    assert eng.sql(
        "SELECT count(*) AS n FROM hive.web.rnp2"
    ).collect()[0]["n"] == 5


def test_external_location_partitioned(eng, spark, tmp_path):
    # write key=value directories outside the warehouse, register as an
    # external table, recover partitions (the Presto external-table flow)
    path = str(tmp_path / "ext_orders")
    orders = spark.table("orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    orders.write.partitionBy("o_orderpriority").parquet(path)
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.ext")
    eng.sql(f"""
        CREATE TABLE hive.ext.orders_ext (
            o_orderkey bigint, o_totalprice double, o_orderpriority varchar
        ) WITH (external_location = '{path}',
                partitioned_by = ARRAY['o_orderpriority'])
    """)
    n = eng.sql("SELECT count(*) AS n FROM hive.ext.orders_ext").collect()
    assert n[0]["n"] == orders.count()


def test_insert_column_list_null_fills(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql(
        "CREATE TABLE hive.web.cl (a bigint, b varchar, c double)"
    )
    eng.sql(
        "INSERT INTO hive.web.cl (b, a) "
        "SELECT r_name, r_regionkey FROM region"
    )
    rows = eng.sql("SELECT * FROM hive.web.cl ORDER BY a").collect()
    assert rows[0]["b"] == "AFRICA" and rows[0]["a"] == 0
    assert all(r["c"] is None for r in rows)


def test_unsupported_property_and_format_raise(eng):
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    with pytest.raises(ValueError, match="unsupported hive table"):
        eng.sql("""
            CREATE TABLE hive.web.badprop WITH (zorder = 'x')
            AS SELECT * FROM region
        """)
    with pytest.raises(ValueError, match="not supported"):
        eng.sql("""
            CREATE TABLE hive.web.badfmt WITH (format = 'RCBINARY')
            AS SELECT * FROM region
        """)


def test_partition_delete_metadata_only(eng):
    """DELETE on partition keys drops whole directories
    (MetadataDeleteOperator parity); row-level predicates raise the
    reference's NOT_SUPPORTED message (HiveMetadata.java:1417)."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.del_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    n = eng.sql(
        "DELETE FROM hive.web.del_p WHERE r_regionkey IN (1, 3)"
    ).collect()[0]["rows"]
    assert n == 2
    left = eng.sql(
        "SELECT r_regionkey FROM hive.web.del_p ORDER BY r_regionkey"
    ).collect()
    assert [r["r_regionkey"] for r in left] == [0, 2, 4]
    parts = eng.sql('SELECT * FROM hive.web."del_p$partitions"').collect()
    assert len(parts) == 3
    # no matching partition: 0 rows, no error
    assert eng.sql(
        "DELETE FROM hive.web.del_p WHERE r_regionkey = 99"
    ).collect()[0]["rows"] == 0
    # non-partition predicate → the reference's NOT_SUPPORTED surface
    with pytest.raises(ValueError, match="partitions are deleted entirely"):
        eng.sql("DELETE FROM hive.web.del_p WHERE r_name = 'ASIA'")
    # unpartitioned table: any WHERE raises; bare DELETE truncates
    eng.sql("CREATE TABLE hive.web.del_flat AS SELECT * FROM region")
    with pytest.raises(ValueError, match="partitions are deleted entirely"):
        eng.sql("DELETE FROM hive.web.del_flat WHERE r_regionkey = 1")
    assert eng.sql("DELETE FROM hive.web.del_flat").collect()[0]["rows"] == 5
    assert eng.sql(
        "SELECT count(*) AS n FROM hive.web.del_flat"
    ).collect()[0]["n"] == 0


def test_ctas_and_insert_execute_source_once(eng, spark):
    """The returned row count is an observed metric on the write pass —
    the CTAS/INSERT source must execute exactly once (round-5 verdict
    item #2: df.count()-then-write doubled the most expensive write-path
    operation).  A per-row accumulator UDF in the source counts actual
    executions: double execution would read 2n."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    cat = hive_catalog.get_catalog(spark)

    acc = spark.sparkContext.accumulator(0)

    @F.udf(T.LongType())
    def tick(x):
        acc.add(1)
        return x

    src = spark.range(100).select(tick(F.col("id")).alias("id"))
    n = cat.create_as("web", "once_t", src, {}, if_not_exists=False)
    assert n == 100
    assert acc.value == 100, "CTAS source executed more than once"

    acc2 = spark.sparkContext.accumulator(0)

    @F.udf(T.LongType())
    def tick2(x):
        acc2.add(1)
        return x

    src2 = spark.range(40).select(tick2(F.col("id")).alias("id"))
    n = cat.insert("web", "once_t", src2)
    assert n == 40
    assert acc2.value == 40, "INSERT source executed more than once"
    total = eng.sql("SELECT count(*) AS n FROM hive.web.once_t").collect()
    assert total[0]["n"] == 140


def test_partition_delete_quoted_value(eng, spark):
    """A partition value containing a single quote must round-trip
    through DROP PARTITION (ADVICE r5: raw interpolation produced an
    injection-shaped broken statement)."""
    from pyspark.sql import Row

    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    cat = hive_catalog.get_catalog(spark)
    df = spark.createDataFrame(
        [Row(v=1, name="O'Brien"), Row(v=2, name="plain")]
    )
    cat.create_as(
        "web", "quoted_p", df,
        {"partitioned_by": ["name"]}, if_not_exists=False,
    )
    n = cat.delete("web", "quoted_p", "name = 'O''Brien'")
    assert n == 1
    left = eng.sql("SELECT name FROM hive.web.quoted_p").collect()
    assert [r["name"] for r in left] == ["plain"]


def test_bucketed_tables_colocated_join(eng):
    """bucketed_by/bucket_count through the hive SQL path: two tables
    bucketed on the join key with equal counts sort-merge-join with no
    Exchange on either side — the reference's grouped/bucketed
    execution (SURVEY §4.3), now via catalog.schema.table DDL."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.buck")
    eng.sql("""
        CREATE TABLE hive.buck.cust_b
        WITH (bucketed_by = ARRAY['c_custkey'], bucket_count = 4)
        AS SELECT c_custkey, c_acctbal FROM customer
    """)
    eng.sql("""
        CREATE TABLE hive.buck.ord_b
        WITH (bucketed_by = ARRAY['o_custkey'], bucket_count = 4,
              sorted_by = ARRAY['o_custkey'])
        AS SELECT o_custkey, o_totalprice FROM orders
    """)
    # force the sort-merge path: a broadcast join would skip the
    # exchange trivially and prove nothing about bucket co-location
    eng.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = eng.sql("""
            SELECT count(*) AS n
            FROM hive.buck.cust_b c JOIN hive.buck.ord_b o
              ON c.c_custkey = o.o_custkey
        """)
        plan = _plan(df)
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[0]
        assert "Exchange hashpartitioning" not in join_part, plan
        assert df.collect()[0]["n"] > 0
    finally:
        eng.spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # bucket metadata round-trips through SHOW CREATE TABLE
    text = eng.sql("SHOW CREATE TABLE hive.buck.cust_b").collect()[0][0]
    assert "bucketed_by = ARRAY['c_custkey']" in text
    assert "bucket_count = 4" in text


def test_show_stats_for_hive_table(eng):
    """Round 6: SHOW STATS FOR a hive table is METADATA-ONLY
    (HiveMetadata.getTableStatistics parity) — row_count from parquet
    footers, partition-column stats from the key=value directory names,
    data columns NULL like a metastore without ANALYZE."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.stats_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    rows = {r[0]: r for r in eng.sql("SHOW STATS FOR hive.web.stats_p").collect()}
    assert set(rows) == {"r_name", "r_regionkey", None}
    # summary row count — from footers, no scan
    assert rows[None]["row_count"] == 5.0
    # partition column stats — from the directory names
    pk = rows["r_regionkey"]
    assert pk["distinct_values_count"] == 5.0
    assert pk["nulls_fraction"] == 0.0
    assert (pk["low_value"], pk["high_value"]) == ("0", "4")
    # data columns: NULL stats (no ANALYZE), like the reference
    assert rows["r_name"]["distinct_values_count"] is None
    # SHOW STATS FOR (query) stays the live computed path
    live = {
        r[0]: r for r in eng.sql(
            "SHOW STATS FOR (SELECT r_name FROM hive.web.stats_p)"
        ).collect()
    }
    assert live["r_name"]["distinct_values_count"] == 5.0


def test_hive_column_ddl_roundtrip(eng, spark):
    """ALTER TABLE hive.s.t ADD/RENAME/DROP COLUMN
    (HiveMetadata.java:845-871): ADD is metadata-only; RENAME/DROP
    rebuild through the stored layout (partitioning preserved); the
    reference's error texts for partition columns and duplicates."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("DROP TABLE IF EXISTS hive.web.cols_p")
    eng.sql("""
        CREATE TABLE hive.web.cols_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, upper(r_name) AS r_tag, r_regionkey FROM region
    """)
    # ADD COLUMN: metadata-only, lands BEFORE the partition key
    eng.sql("ALTER TABLE hive.web.cols_p ADD COLUMN score DOUBLE")
    cols = eng.sql("SELECT * FROM hive.web.cols_p").columns
    assert cols == ["r_name", "r_tag", "score", "r_regionkey"]
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TABLE hive.web.cols_p ADD COLUMN score DOUBLE")
    # RENAME COLUMN: data survives, partitioning survives
    eng.sql("ALTER TABLE hive.web.cols_p RENAME COLUMN r_name TO region_name")
    got = eng.sql(
        "SELECT region_name FROM hive.web.cols_p "
        "WHERE r_regionkey = 2"
    ).collect()
    assert [r["region_name"] for r in got] == ["ASIA"]
    parts = eng.sql('SELECT * FROM hive.web."cols_p$partitions"').collect()
    assert len(parts) == 5
    with pytest.raises(ValueError, match="Renaming partition columns"):
        eng.sql("ALTER TABLE hive.web.cols_p RENAME COLUMN r_regionkey TO k")
    with pytest.raises(ValueError, match="Column already exists"):
        eng.sql("ALTER TABLE hive.web.cols_p RENAME COLUMN r_tag TO score")
    # DROP COLUMN + the reference's partition/last-column guards
    eng.sql("ALTER TABLE hive.web.cols_p DROP COLUMN score")
    assert "score" not in eng.sql("SELECT * FROM hive.web.cols_p").columns
    with pytest.raises(ValueError, match="Cannot drop partition columns"):
        eng.sql("ALTER TABLE hive.web.cols_p DROP COLUMN r_regionkey")
    eng.sql("ALTER TABLE hive.web.cols_p DROP COLUMN r_tag")
    with pytest.raises(ValueError, match="only non-partition column"):
        eng.sql("ALTER TABLE hive.web.cols_p DROP COLUMN region_name")


def test_show_create_table_reexecutes(eng):
    """SHOW CREATE TABLE for a hive table renders the Presto name,
    format, and layout properties — and the output re-executes
    verbatim, producing the same layout (round-6 verdict item)."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("DROP TABLE IF EXISTS hive.web.sct_p")
    eng.sql("""
        CREATE TABLE hive.web.sct_p
        WITH (partitioned_by = ARRAY['r_regionkey'])
        AS SELECT r_name, r_regionkey FROM region
    """)
    text = eng.sql("SHOW CREATE TABLE hive.web.sct_p").collect()[0][0]
    assert "CREATE TABLE hive.web.sct_p" in text
    assert "format = 'PARQUET'" in text
    assert "partitioned_by = ARRAY['r_regionkey']" in text
    # re-execute under a new name: same columns, same partition layout
    eng.sql("DROP TABLE IF EXISTS hive.web.sct_q")
    eng.sql(text.replace("hive.web.sct_p", "hive.web.sct_q"))
    cols = eng.sql("SELECT * FROM hive.web.sct_q").columns
    assert cols == ["r_name", "r_regionkey"]
    eng.sql("INSERT INTO hive.web.sct_q SELECT r_name, r_regionkey FROM region")
    parts = eng.sql('SELECT * FROM hive.web."sct_q$partitions"').collect()
    assert len(parts) == 5


def test_date_partitioned_table_prunes_on_date_literal(eng, spark):
    """The production pattern: a date-partitioned fact.  Partition
    values round-trip through the key=value directory names as typed
    DATEs, and a date-literal filter statically eliminates
    directories."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.orders_by_day
        WITH (partitioned_by = ARRAY['ds'])
        AS SELECT o_orderkey, o_totalprice,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS ds
        FROM orders
    """)
    parts = eng.sql(
        'SELECT * FROM hive.web."orders_by_day$partitions" ORDER BY ds'
    ).collect()
    assert len(parts) > 3
    import datetime

    assert isinstance(parts[0]["ds"], datetime.date)
    one_day = parts[1]["ds"].isoformat()
    plan = _plan(eng.sql(
        f"SELECT count(*) AS n FROM hive.web.orders_by_day "
        f"WHERE ds = DATE '{one_day}'"
    ))
    assert "PartitionFilters: [" in plan
    assert f"ds={one_day}" in plan
    assert f"ds={parts[2]['ds'].isoformat()}" not in plan
    n = eng.sql(
        f"SELECT count(*) AS n FROM hive.web.orders_by_day "
        f"WHERE ds = DATE '{one_day}'"
    ).collect()[0]["n"]
    assert n > 0


def test_call_create_empty_partition_roundtrip(eng):
    """CALL hive.system.create_empty_partition (procedures.py, round 8 —
    CreateEmptyPartitionProcedure.java): creates the key=value
    directory, registers it in SHOW PARTITIONS / "t$partitions", counts
    zero rows; reference error texts for mismatched columns, existing
    partitions, and unregistered procedures."""
    eng.sql("CREATE SCHEMA IF NOT EXISTS hive.web")
    eng.sql("""
        CREATE TABLE hive.web.orders_ep
        WITH (partitioned_by = ARRAY['o_orderpriority'])
        AS SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """)
    before = {
        r["o_orderpriority"]
        for r in eng.sql(
            'SELECT * FROM hive.web."orders_ep$partitions"'
        ).collect()
    }
    assert "9-EMPTY" not in before
    eng.sql("""
        CALL hive.system.create_empty_partition(
            'web', 'orders_ep', ARRAY['o_orderpriority'], ARRAY['9-EMPTY'])
    """)
    after = {
        r["o_orderpriority"]
        for r in eng.sql(
            'SELECT * FROM hive.web."orders_ep$partitions"'
        ).collect()
    }
    assert "9-EMPTY" in after
    n = eng.sql(
        "SELECT count(*) AS n FROM hive.web.orders_ep "
        "WHERE o_orderpriority = '9-EMPTY'"
    ).collect()[0]["n"]
    assert n == 0
    # named-argument form (CallTask binds by name)
    eng.sql("""
        CALL hive.system.create_empty_partition(
            schema_name => 'web', table_name => 'orders_ep',
            partition_columns => ARRAY['o_orderpriority'],
            partition_values => ARRAY['8-NAMED'])
    """)
    # reference error texts
    with pytest.raises(ValueError, match="Partition already exists"):
        eng.sql("""
            CALL hive.system.create_empty_partition(
                'web', 'orders_ep', ARRAY['o_orderpriority'],
                ARRAY['9-EMPTY'])
        """)
    with pytest.raises(
        ValueError,
        match="doesn't match actual partition column names",
    ):
        eng.sql("""
            CALL hive.system.create_empty_partition(
                'web', 'orders_ep', ARRAY['wrong_col'], ARRAY['x'])
        """)
    with pytest.raises(ValueError, match="Too few arguments"):
        eng.sql(
            "CALL hive.system.create_empty_partition('web', 'orders_ep')"
        )
    with pytest.raises(ValueError, match="cannot be mixed"):
        eng.sql("""
            CALL hive.system.create_empty_partition(
                'web', table_name => 'orders_ep')
        """)
    # non-partitioned table → same INVALID_PROCEDURE_ARGUMENT text
    eng.sql("""
        CREATE TABLE hive.web.flat_ep AS
        SELECT o_orderkey FROM orders LIMIT 5
    """)
    with pytest.raises(
        ValueError,
        match="doesn't match actual partition column names",
    ):
        eng.sql("""
            CALL hive.system.create_empty_partition(
                'web', 'flat_ep', ARRAY['o_orderpriority'], ARRAY['x'])
        """)
    # no CALL inside an explicit transaction (CallTask.java:73)
    eng.sql("START TRANSACTION")
    try:
        with pytest.raises(ValueError, match="autocommit"):
            eng.sql("""
                CALL hive.system.create_empty_partition(
                    'web', 'orders_ep', ARRAY['o_orderpriority'],
                    ARRAY['7-TXN'])
            """)
    finally:
        eng.sql("ROLLBACK")
