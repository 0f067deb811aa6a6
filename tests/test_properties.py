"""Session-property surface: SET SESSION → Spark conf mapping."""

from __future__ import annotations

import pytest

from facebook_presto_spark.engine import PrestoSparkEngine
from facebook_presto_spark.properties import parse_set_session, set_session_property


def test_parse_set_session():
    assert parse_set_session("SET SESSION hash_partition_count = 64") == (
        "hash_partition_count", "64")
    assert parse_set_session(
        "set session join_distribution_type = 'PARTITIONED';") == (
        "join_distribution_type", "'PARTITIONED'")
    assert parse_set_session("SELECT 1") is None


def test_set_session_through_engine(spark):
    eng = PrestoSparkEngine(spark)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        out = eng.sql("SET SESSION hash_partition_count = 7")
        assert out.count() == 0  # OK relation, no rows
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"

        eng.sql("SET SESSION join_distribution_type = 'PARTITIONED'")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        eng.sql("SET SESSION join_distribution_type = 'AUTOMATIC'")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_noop_properties_accepted(spark):
    # reference workloads SET these freely; they must not error
    for prop, val in [
        ("spill_enabled", "true"),
        ("query_max_memory", "'1GB'"),
        ("optimize_hash_generation", "true"),
    ]:
        set_session_property(spark, prop, val)


def test_unknown_property_rejected(spark):
    with pytest.raises(ValueError, match="unknown session property"):
        set_session_property(spark, "no_such_property", "1")


def test_partitioned_join_still_correct(spark, sf_dir):
    """Forcing PARTITIONED (no broadcast) must not change results —
    the reference sweeps this flag in its benchmark harness."""
    from facebook_presto_spark.plans import tpch

    eng = PrestoSparkEngine(spark)
    try:
        eng.sql("SET SESSION join_distribution_type = 'PARTITIONED'")
        rows_part = tpch.q05(spark, sf_dir).collect()
    finally:
        eng.sql("SET SESSION join_distribution_type = 'AUTOMATIC'")
    rows_auto = tpch.q05(spark, sf_dir).collect()
    assert sorted(map(tuple, rows_part)) == sorted(map(tuple, rows_auto))


def test_full_reference_property_surface(spark):
    """Every name in SystemSessionProperties.java is accepted (mapped or
    subsumed no-op); mapped ones move the Spark conf and RESET restores."""
    import re

    from facebook_presto_spark.properties import (
        PROPERTIES,
        reset_session_property,
        set_session_property,
    )

    src = open(
        "/root/reference/presto-main/src/main/java/com/facebook/presto/"
        "SystemSessionProperties.java"
    ).read()
    names = re.findall(r'public static final String [A-Z_]+ = "([a-z_]+)"', src)
    assert names and all(n in PROPERTIES for n in names)

    set_session_property(spark, "join_max_broadcast_table_size", "'48MB'")
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "48MB"
    reset_session_property(spark, "join_max_broadcast_table_size")

    set_session_property(spark, "optimize_top_n_row_number", "false")
    assert spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold") == "-1"
    reset_session_property(spark, "optimize_top_n_row_number")
