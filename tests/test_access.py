"""GRANT / REVOKE / SHOW GRANTS surface (access.py) — GrantTask.java /
RevokeTask.java validation, ShowQueriesRewrite.visitShowGrants shape,
information_schema.table_privileges feed."""

import pytest


@pytest.fixture()
def engine(spark):
    from facebook_presto_spark.engine import PrestoSparkEngine

    return PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=spark)


def test_grant_show_revoke_roundtrip(engine):
    engine.sql("GRANT SELECT, INSERT ON nation TO alice").collect()
    engine.sql("GRANT ALL PRIVILEGES ON region TO bob WITH GRANT OPTION").collect()
    rows = engine.sql("SHOW GRANTS ON nation").collect()
    # ShowQueriesRewrite aliased shape: Grantee/Catalog/Schema/Table/
    # Privilege/Grantable
    assert rows[0].__fields__ == [
        "Grantee", "Catalog", "Schema", "Table", "Privilege", "Grantable"
    ]
    assert {(r["Grantee"], r["Privilege"]) for r in rows} == {
        ("alice", "SELECT"), ("alice", "INSERT")
    }
    assert all(r["Grantable"] is False for r in rows)
    rows = engine.sql("SHOW GRANTS ON region").collect()
    assert {r["Privilege"] for r in rows} == {
        "SELECT", "INSERT", "DELETE", "UPDATE"
    }
    assert all(r["Grantable"] is True for r in rows)
    # SHOW GRANTS without ON lists everything
    assert len(engine.sql("SHOW GRANTS").collect()) == 6
    # revoke one privilege; GRANT OPTION FOR keeps the privilege
    engine.sql("REVOKE INSERT ON nation FROM alice").collect()
    engine.sql("REVOKE GRANT OPTION FOR SELECT ON region FROM bob").collect()
    rows = {(r["Grantee"], r["Table"], r["Privilege"], r["Grantable"])
            for r in engine.sql("SHOW GRANTS").collect()}
    assert ("alice", "nation", "INSERT", False) not in {
        (g, t, p, o) for g, t, p, o in rows
    }
    assert ("bob", "region", "SELECT", False) in rows


def test_grants_feed_information_schema(engine):
    engine.sql("GRANT DELETE ON supplier TO carol").collect()
    rows = engine.sql(
        "SELECT grantee, table_name, privilege_type, is_grantable "
        "FROM information_schema.table_privileges WHERE grantee = 'carol'"
    ).collect()
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        ("carol", "supplier", "DELETE", False)
    ]


def test_grant_validation_errors(engine):
    with pytest.raises(ValueError, match="Unknown privilege"):
        engine.sql("GRANT FLY ON nation TO alice")
    with pytest.raises(ValueError, match="does not exist"):
        engine.sql("GRANT SELECT ON no_such_table TO alice")


def test_transactions_and_call_fail_loudly(engine):
    for q in ("START TRANSACTION", "COMMIT", "ROLLBACK"):
        with pytest.raises(NotImplementedError, match="transactions"):
            engine.sql(q)
    # CALL system.runtime.kill_query is now a real procedure
    # (systemtables.py, round 4): unknown ids get the reference's
    # NOT_FOUND error; other connector procedures still raise loudly
    with pytest.raises(ValueError, match="Target query not found"):
        engine.sql("CALL system.runtime.kill_query('x')")
    with pytest.raises(NotImplementedError, match="CALL"):
        engine.sql("CALL hive.system.sync_partition_metadata('a', 'b', 'c')")
