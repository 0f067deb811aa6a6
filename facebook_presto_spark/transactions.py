"""Session transaction context — START TRANSACTION / COMMIT / ROLLBACK.

Reference surface:

- ``presto-parser/.../SqlBase.g4:90-92`` — the three statement
  alternatives and the transaction modes (``ISOLATION LEVEL`` ×4,
  ``READ ONLY`` / ``READ WRITE``).
- ``StartTransactionTask.java`` — nested transactions rejected
  ("Nested transactions not supported"), duplicate modes rejected
  ("Multiple transaction isolation levels specified" / "Multiple
  transaction read modes specified").
- ``CommitTask.java`` / ``RollbackTask.java`` — "No transaction in
  progress" outside a transaction.
- ``InMemoryTransactionManager.java:456`` — READ_ONLY_VIOLATION:
  "Cannot execute write in a read-only transaction";
  ``TransactionManager.java:30-31`` — defaults READ UNCOMMITTED /
  read-write; ``TransactionId.create`` — a random UUID.
- ``TransactionsSystemTable.java:61-68`` — the
  ``system.runtime.transactions`` row shape.
- ``PrestoHeaders.java:35-37`` — the protocol headers the JDBC/CLI
  clients drive this with: ``X-Presto-Transaction-Id`` (request),
  ``X-Presto-Started-Transaction-Id`` / ``X-Presto-Clear-Transaction-Id``
  (response) — wired in server.py.

Spark-first semantics: Spark commits every write per statement (one
two-phase-commit job each), so a transaction here is a session-scoped
CONTEXT — it carries the isolation level and access mode, REJECTS
writes in READ ONLY transactions with the reference's message, lists
live transactions in ``system.runtime.transactions``, and round-trips
the protocol headers.  Since round 8, hive/memory CTAS/INSERT/DELETE
inside an explicit transaction register compensating actions in an
undo log (``stage_write`` below), so ROLLBACK restores the
pre-transaction table state — the file-retention analogue of the
reference's SemiTransactionalHiveMetastore staging.  Writes stay
visible between statements (READ UNCOMMITTED is the engine default,
like the reference's TransactionManager.java:30) and within the
transaction (read-your-writes).  Since round 9 metadata statements
stage too (``stage_ddl``: ALTER TABLE RENAME TO / ADD COLUMN / RENAME
COLUMN / DROP COLUMN, DROP TABLE, CREATE/DROP VIEW — the same set
SemiTransactionalHiveMetastore queues).  The remaining
single-statement residual is session/authorization state (GRANT/
REVOKE, SET SESSION, schema CREATE/DROP) — documented in COVERAGE.md.
"""

from __future__ import annotations

import datetime as dt
import re
import threading
import uuid

ISOLATION_LEVELS = (
    "READ UNCOMMITTED", "READ COMMITTED", "REPEATABLE READ", "SERIALIZABLE"
)
DEFAULT_ISOLATION = "READ UNCOMMITTED"  # TransactionManager.java:30


class TransactionInfo:
    __slots__ = ("tid", "isolation", "read_only", "auto_commit",
                 "create_time", "last_active", "written_catalog", "catalogs",
                 "undo", "backup_dirs", "rolling_back")

    def __init__(self, tid: str, isolation: str, read_only: bool,
                 auto_commit: bool = False):
        self.tid = tid
        self.isolation = isolation
        self.read_only = read_only
        self.auto_commit = auto_commit
        self.create_time = dt.datetime.now()
        self.last_active = self.create_time
        self.written_catalog: str | None = None
        self.catalogs: list[str] = []
        # round 8: compensating actions for hive/memory writes staged
        # inside this transaction (stage_write), run in reverse on
        # ROLLBACK; backup_dirs holds the .txn_undo file retention
        self.undo: list = []
        self.backup_dirs: list[str] = []
        # set while ROLLBACK replays the undo log, so compensating
        # statements executed through engine.sql don't re-stage
        self.rolling_back = False


class TransactionManager:
    """In-memory registry of live transactions
    (InMemoryTransactionManager parity, minus the per-connector
    metadata handles Spark doesn't need)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._txns: dict[str, TransactionInfo] = {}

    def begin(self, isolation: str, read_only: bool) -> str:
        tid = str(uuid.uuid4())  # TransactionId.create
        with self._lock:
            self._txns[tid] = TransactionInfo(tid, isolation, read_only)
        return tid

    def get(self, tid: str) -> TransactionInfo:
        with self._lock:
            info = self._txns.get(tid)
        if info is None:
            # InMemoryTransactionManager.getTransactionInfo →
            # NotInTransactionException text
            raise ValueError(f"Unknown transaction ID: {tid}")
        return info

    def touch(self, tid: str, catalog: str | None = None,
              wrote: bool = False) -> None:
        info = self.get(tid)
        info.last_active = dt.datetime.now()
        if catalog and catalog not in info.catalogs:
            info.catalogs.append(catalog)
        if wrote and catalog:
            info.written_catalog = catalog

    def end(self, tid: str) -> None:
        with self._lock:
            self._txns.pop(tid, None)

    def rows(self) -> list[tuple]:
        """system.runtime.transactions rows
        (TransactionsSystemTable.java:61-68 column order)."""
        now = dt.datetime.now()
        with self._lock:
            infos = list(self._txns.values())
        return [
            (
                t.tid, t.isolation, t.read_only, t.auto_commit,
                t.create_time,
                int((now - t.last_active).total_seconds()),
                t.written_catalog, list(t.catalogs),
            )
            for t in infos
        ]


# ---------------------------------------------------------------------------
# statement dispatch
# ---------------------------------------------------------------------------

_START_RE = re.compile(
    r"\s*START\s+TRANSACTION\b(?P<modes>[^;]*);?\s*$", re.I | re.S
)
_COMMIT_RE = re.compile(r"\s*COMMIT(\s+WORK)?\s*;?\s*$", re.I)
_ROLLBACK_RE = re.compile(r"\s*ROLLBACK(\s+WORK)?\s*;?\s*$", re.I)
_MODE_RE = re.compile(
    r"ISOLATION\s+LEVEL\s+(READ\s+UNCOMMITTED|READ\s+COMMITTED|"
    r"REPEATABLE\s+READ|SERIALIZABLE)|READ\s+(ONLY|WRITE)",
    re.I,
)

# statements that write through a connector or the catalog — the set the
# READ ONLY check guards (InMemoryTransactionManager.checkConnectorWrite
# fires for any metadata/data mutation)
_WRITE_RE = re.compile(
    r"\s*(INSERT|DELETE|UPDATE|CREATE|DROP|ALTER|TRUNCATE|GRANT|REVOKE|"
    r"ANALYZE|REFRESH)\b",
    re.I,
)


def _parse_modes(text: str) -> tuple[str, bool]:
    """(isolation, read_only) from the START TRANSACTION mode list;
    duplicate-kind modes raise the reference's texts
    (StartTransactionTask.extractIsolationLevel/extractReadOnly)."""
    isolations: list[str] = []
    access: list[bool] = []
    rest = text
    for m in _MODE_RE.finditer(text):
        if m.group(1):
            isolations.append(re.sub(r"\s+", " ", m.group(1).upper()))
        else:
            access.append(m.group(2).upper() == "ONLY")
    rest = _MODE_RE.sub("", text).replace(",", "").strip()
    if rest:
        raise ValueError(f"Invalid transaction mode: {rest}")
    if len(isolations) > 1:
        raise ValueError("Multiple transaction isolation levels specified")
    if len(access) > 1:
        raise ValueError("Multiple transaction read modes specified")
    return (
        isolations[0] if isolations else DEFAULT_ISOLATION,
        access[0] if access else False,
    )


def dispatch(engine, sql: str):
    """Handle the three transaction-control statements; None = not ours.

    The current transaction id is engine-session state but thread-local
    (one protocol request = one thread = one session snapshot, like the
    reference's header-rebuilt Session)."""
    m = _START_RE.match(sql)
    if m:
        if engine.current_transaction() is not None:
            raise ValueError("Nested transactions not supported")
        isolation, read_only = _parse_modes(m.group("modes") or "")
        tid = engine.transactions.begin(isolation, read_only)
        engine.set_current_transaction(tid)
        engine.txn_event = ("started", tid)
        return engine.spark.sql("SELECT true AS ok WHERE false")
    is_commit = bool(_COMMIT_RE.match(sql))
    if is_commit or _ROLLBACK_RE.match(sql):
        tid = engine.current_transaction()
        if tid is None:
            # CommitTask.java / RollbackTask.java — NOT_IN_TRANSACTION
            raise ValueError("No transaction in progress")
        info = engine.transactions.get(tid)
        failures: list[Exception] = []
        retained: list[str] = []
        try:
            if not is_commit:
                # run the compensating actions in reverse statement
                # order (stage_write/stage_ddl) — the rollback path of
                # the reference's SemiTransactionalHiveMetastore.  One
                # failing undo must NOT abort the rest: every remaining
                # compensation is still attempted, and the failures are
                # aggregated into the raised error.
                info.rolling_back = True
                try:
                    for undo in reversed(list(info.undo)):
                        try:
                            undo()
                        except Exception as exc:
                            failures.append(exc)
                finally:
                    info.rolling_back = False
        finally:
            # a failing compensation must still TERMINATE the
            # transaction (the reference's rollback is terminal too) —
            # otherwise the session is stuck inside a stale transaction.
            # But when any undo failed, KEEP the .txn_undo retention:
            # it is the only material for repairing the part-rolled-back
            # table state, and discarding it would destroy the evidence.
            if failures:
                retained = list(info.backup_dirs)
                info.undo.clear()
                info.backup_dirs.clear()
            else:
                _discard_staging(info)
            engine.transactions.end(tid)
            engine.set_current_transaction(None)
            engine.txn_event = ("cleared", tid)
        if failures:
            msgs = "; ".join(f"{type(e).__name__}: {e}" for e in failures)
            raise RuntimeError(
                f"rollback: {len(failures)} compensating action(s) failed "
                f"({msgs}); transaction terminated, file retention kept at "
                f"{retained}") from failures[0]
        return engine.spark.sql("SELECT true AS ok WHERE false")
    return None


def check_write(engine, sql: str) -> None:
    """READ_ONLY_VIOLATION (InMemoryTransactionManager.java:456) for any
    write statement inside an explicit READ ONLY transaction; also
    stamps activity/written-catalog on the live transaction."""
    tid = engine.current_transaction()
    if tid is None:
        return
    info = engine.transactions.get(tid)
    is_write = bool(_WRITE_RE.match(sql))
    if is_write and info.read_only:
        raise ValueError("Cannot execute write in a read-only transaction")
    catalog = "spark"
    m = re.match(
        r"\s*(?:INSERT\s+INTO|DELETE\s+FROM|CREATE\s+TABLE(?:\s+IF\s+NOT"
        r"\s+EXISTS)?|DROP\s+TABLE(?:\s+IF\s+EXISTS)?|ALTER\s+TABLE)\s+"
        r"([A-Za-z_]\w*)\s*\.",
        sql, re.I,
    )
    if m and m.group(1).lower() in ("hive", "memory", "blackhole", "tpch"):
        catalog = m.group(1).lower()
    engine.transactions.touch(tid, catalog=catalog, wrote=is_write)


# ---------------------------------------------------------------------------
# write staging (round 8) — undo log per transaction
#
# Reference: the hive connector stages writes in
# SemiTransactionalHiveMetastore (presto-hive/.../metastore/
# SemiTransactionalHiveMetastore.java) — data lands immediately, the
# metastore mutations queue until commit, and rollback discards them
# with the written files.  The Spark-first equivalent is an UNDO LOG:
# each CTAS/INSERT/DELETE against hive.* or memory.* inside an explicit
# transaction registers a compensating action, executed in reverse on
# ROLLBACK.  Writes stay immediately visible (READ UNCOMMITTED — the
# engine's default isolation, TransactionManager.java:30 — and
# read-your-writes inside the transaction), and the compensation is
# metadata-proportional, never data-proportional:
#
# - CTAS/CREATE → drop the created table;
# - hive INSERT → delete the files the insert added (parquet part
#   files are append-only and uniquely named) and drop any partitions
#   it created — an O(new files) directory operation;
# - hive DELETE → hard-link every live data file into a warehouse-side
#   .txn_undo staging dir first (zero-copy on the same filesystem, the
#   same retention cost class as the reference keeping replaced files
#   until commit), then restore links + re-register partitions on
#   rollback;
# - memory INSERT → re-pin the pre-insert cached DataFrame
#   (localCheckpoint keeps it materialized after the view re-pins).
# ---------------------------------------------------------------------------

_STAGE_NAME = r'(?:"[^"]+"|[A-Za-z_]\w*)'
_STAGE_RE = re.compile(
    rf"\s*(?P<op>CREATE\s+TABLE(?:\s+IF\s+NOT\s+EXISTS)?|INSERT\s+INTO|"
    rf"DELETE\s+FROM)\s+(?P<cat>hive|memory)\s*\.\s*"
    rf"(?P<schema>{_STAGE_NAME})\s*\.\s*(?P<table>{_STAGE_NAME})",
    re.I,
)


def _local_path(uri: str):
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    if p.scheme not in ("", "file"):
        return None
    return unquote(p.path)


def _partition_specs(spark, qualified: str):
    """Raw SHOW PARTITIONS strings, or None for unpartitioned tables."""
    try:
        return [r["partition"]
                for r in spark.sql(f"SHOW PARTITIONS {qualified}").collect()]
    except Exception:
        return None


def _spec_sql(spec: str) -> str:
    """'k=v/k2=v2' (Hive directory escaping) → backtick-quoted partition
    spec literal for ALTER TABLE ADD/DROP PARTITION."""
    from urllib.parse import unquote

    parts = []
    for piece in spec.split("/"):
        k, _eq, v = piece.partition("=")
        val = unquote(v).replace("\\", "\\\\").replace('"', '\\"')
        parts.append(f'`{k}` = "{val}"')
    return ", ".join(parts)


def _backup_files(spark, qualified: str) -> tuple:
    """Hard-link every current data file into a .txn_undo staging dir;
    returns (staging_root, {original_path: backup_path}).  Same-
    filesystem links are O(1) per file; cross-device (external
    locations) falls back to a copy."""
    import os
    import shutil
    import uuid as _uuid

    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    wh = _local_path(warehouse) or warehouse
    bdir = os.path.join(wh, ".txn_undo", _uuid.uuid4().hex)
    backup = {}
    for uri in spark.table(qualified).inputFiles():
        path = _local_path(uri)
        if path is None or not os.path.exists(path):
            continue
        dst = os.path.join(bdir, path.lstrip("/"))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(path, dst)
        except OSError:
            shutil.copy2(path, dst)
        backup[path] = dst
    return bdir, backup


def stage_write(engine, sql: str) -> None:
    """Register a compensating action on the current transaction for a
    hive.*/memory.* CTAS/INSERT/DELETE; no-op outside a transaction or
    for other statements (they keep single-statement semantics)."""
    tid = engine.current_transaction()
    if tid is None:
        return
    m = _STAGE_RE.match(sql)
    if m is None:
        return
    info = engine.transactions.get(tid)
    if info.rolling_back:
        return
    op = re.sub(r"\s+", " ", m.group("op").upper())
    schema = m.group("schema").strip('"')
    table = m.group("table").strip('"')
    spark = engine.spark

    if m.group("cat").lower() == "memory":
        from facebook_presto_spark.connectors import get_catalogs

        mem = get_catalogs(spark).memory
        if op.startswith("CREATE TABLE"):
            if (schema, table) not in mem.tables:
                info.undo.append(
                    lambda: mem.drop(schema, table, if_exists=True)
                )
        elif op == "INSERT INTO" and (schema, table) in mem.tables:
            view = mem.tables[(schema, table)]
            prev = spark.table(view).localCheckpoint(eager=True)

            def undo_mem_insert():
                if mem.tables.get((schema, table)) != view:
                    return
                spark.catalog.uncacheTable(view)
                mem._pin(view, prev)

            info.undo.append(undo_mem_insert)
        return

    from facebook_presto_spark.hive_catalog import get_catalog

    cat = get_catalog(spark)
    if op.startswith("CREATE TABLE"):
        if not cat._exists(schema, table):
            info.undo.append(lambda: cat.drop(schema, table, if_exists=True))
        return
    if not cat._exists(schema, table):
        return  # the statement itself will fail; nothing to compensate
    qualified = cat.qualified(schema, table)
    parts_before = _partition_specs(spark, qualified)

    if op == "INSERT INTO":
        files_before = set(spark.table(qualified).inputFiles())

        def undo_insert():
            import os

            spark.catalog.refreshTable(qualified)
            for uri in set(spark.table(qualified).inputFiles()) - files_before:
                path = _local_path(uri)
                if path and os.path.exists(path):
                    os.remove(path)
            if parts_before is not None:
                added = set(_partition_specs(spark, qualified) or []) - set(
                    parts_before
                )
                for spec in added:
                    spark.sql(
                        f"ALTER TABLE {qualified} "
                        f"DROP PARTITION ({_spec_sql(spec)})"
                    )
            spark.catalog.refreshTable(qualified)

        info.undo.append(undo_insert)
        return

    # DELETE FROM — retain the current files via hard links
    bdir, backup = _backup_files(spark, qualified)
    if backup:
        info.backup_dirs.append(bdir)

    def undo_delete():
        import os
        import shutil

        for orig, bk in backup.items():
            if not os.path.exists(orig):
                os.makedirs(os.path.dirname(orig), exist_ok=True)
                try:
                    os.link(bk, orig)
                except OSError:
                    shutil.copy2(bk, orig)
        if parts_before is not None:
            now = set(_partition_specs(spark, qualified) or [])
            for spec in parts_before:
                if spec not in now:
                    spark.sql(
                        f"ALTER TABLE {qualified} "
                        f"ADD PARTITION ({_spec_sql(spec)})"
                    )
        spark.catalog.refreshTable(qualified)

    info.undo.append(undo_delete)


# ---------------------------------------------------------------------------
# metadata-statement staging (round 9) — DDL joins the undo log
#
# The reference's SemiTransactionalHiveMetastore stages renames and
# drops too (setTableStatistics/renameTable/dropTable queue until
# commit).  Compensations stay metadata- or O(files)-proportional:
#
# - ALTER TABLE … RENAME TO         → rename back (pure metadata);
# - ALTER TABLE … ADD COLUMN        → restore the pre-ALTER dataSchema
#   through ExternalCatalog.alterTableDataSchema (pure metadata — the
#   exact inverse of Spark's metadata-only ADD COLUMNS);
# - ALTER … RENAME/DROP COLUMN, DROP TABLE hive.* → table snapshot:
#   capture the re-executable SHOW CREATE text + partition specs and
#   hard-link the live files into .txn_undo (zero-copy); rollback drops
#   whatever exists, re-runs the CREATE, restores links, re-registers
#   partitions;
# - DROP TABLE memory.*             → re-pin the checkpointed DataFrame;
# - CREATE [OR REPLACE] VIEW / DROP VIEW → drop the created view, or
#   re-run the recorded Presto-dialect definition.
# ---------------------------------------------------------------------------

_DDL_T3 = rf"(?P<cat>hive|memory)\s*\.\s*(?P<schema>{_STAGE_NAME})\s*\.\s*" \
          rf"(?P<table>{_STAGE_NAME})"
_DDL_RENAME_RE = re.compile(
    rf"\s*ALTER\s+TABLE\s+{_DDL_T3}\s+RENAME\s+TO\s+"
    rf"(?:(?:hive|memory)\s*\.\s*)?(?:(?P<nschema>{_STAGE_NAME})\s*\.\s*)?"
    rf"(?P<ntable>{_STAGE_NAME})\s*;?\s*$",
    re.I,
)
_DDL_ADDCOL_RE = re.compile(
    rf"\s*ALTER\s+TABLE\s+{_DDL_T3}\s+ADD\s+COLUMN\s+", re.I)
_DDL_DESTRUCTIVE_RE = re.compile(
    rf"\s*ALTER\s+TABLE\s+{_DDL_T3}\s+(?:RENAME|DROP)\s+COLUMN\s+", re.I)
_DDL_DROP_RE = re.compile(
    rf"\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_DDL_T3}\s*;?\s*$", re.I)
_DDL_CREATE_SCHEMA_RE = re.compile(
    rf"\s*CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<cat>hive|memory)\s*\.\s*(?P<schema>{_STAGE_NAME})\s*;?\s*$", re.I)
_DDL_DROP_SCHEMA_RE = re.compile(
    rf"\s*DROP\s+SCHEMA\s+(?:IF\s+EXISTS\s+)?"
    rf"(?P<cat>hive|memory)\s*\.\s*(?P<schema>{_STAGE_NAME})\s*;?\s*$", re.I)
_DDL_CREATE_VIEW_RE = re.compile(
    r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([\w.\"]+)\s+AS\s+", re.I)
_DDL_DROP_VIEW_RE = re.compile(
    r"\s*DROP\s+VIEW\s+(?:IF\s+EXISTS\s+)?([\w.\"]+)\s*;?\s*$", re.I)


def _snapshot_hive_table(engine, schema: str, table: str,
                         info: TransactionInfo) -> None:
    """Full-compensation snapshot for destructive hive DDL: the
    re-executable SHOW CREATE text (round-5 surface), the partition
    specs, and hard links to every live data file."""
    spark = engine.spark
    from facebook_presto_spark.hive_catalog import get_catalog

    cat = get_catalog(spark)
    qualified = cat.qualified(schema, table)
    create_sql = engine.sql(
        f"SHOW CREATE TABLE hive.{schema}.{table}").collect()[0][0]
    parts = _partition_specs(spark, qualified)
    bdir, backup = _backup_files(spark, qualified)
    if backup:
        info.backup_dirs.append(bdir)

    def undo():
        import os
        import shutil

        cat2 = get_catalog(spark)
        cat2.drop(schema, table, if_exists=True)
        engine.sql(create_sql).collect()
        for orig, bk in backup.items():
            if not os.path.exists(orig):
                os.makedirs(os.path.dirname(orig), exist_ok=True)
                try:
                    os.link(bk, orig)
                except OSError:
                    shutil.copy2(bk, orig)
        if parts:
            now = set(_partition_specs(spark, qualified) or [])
            for spec in parts:
                if spec not in now:
                    spark.sql(f"ALTER TABLE {qualified} "
                              f"ADD PARTITION ({_spec_sql(spec)})")
        spark.catalog.refreshTable(qualified)

    info.undo.append(undo)


def stage_ddl(engine, sql: str) -> None:
    """Register compensating actions for metadata statements (ALTER/
    DROP TABLE, CREATE/DROP VIEW) inside an explicit transaction, per
    SemiTransactionalHiveMetastore's staged renames and drops."""
    tid = engine.current_transaction()
    if tid is None:
        return
    info = engine.transactions.get(tid)
    if info.rolling_back:
        return
    spark = engine.spark

    # schema DDL: the reference BUFFERS createDatabase/dropDatabase as
    # exclusive operations that execute only at COMMIT
    # (SemiTransactionalHiveMetastore.java:283-290, setExclusive:1519) —
    # on ROLLBACK the mutation never happens.  The compensating-undo
    # equivalent: CREATE SCHEMA undoes with a drop (tables created
    # inside the transaction are undone first, reverse order), DROP
    # SCHEMA — which only ever succeeds on an EMPTY schema — undoes by
    # re-creating it.  (SET SESSION is deliberately NOT staged: the
    # reference applies session properties to the session unconditionally
    # — SetSessionTask.java:90 — so they survive ROLLBACK there too.)
    # GRANT/REVOKE: the reference buffers grantTablePrivileges /
    # revokeTablePrivileges the same exclusive way
    # (SemiTransactionalHiveMetastore.java:777, setExclusive) — COMMIT
    # applies, ROLLBACK discards.  The grant registry is a small
    # in-memory dict, so the compensation is a snapshot-restore of the
    # affected (grantee, table) slot.
    from facebook_presto_spark import access

    mg = access.GRANT_RE.match(sql) or access.REVOKE_RE.match(sql)
    if mg:
        import copy

        snapshot = copy.deepcopy(engine.grants._grants)

        def undo_grants():
            engine.grants._grants.clear()
            engine.grants._grants.update(snapshot)

        info.undo.append(undo_grants)
        return

    m = _DDL_CREATE_SCHEMA_RE.match(sql)
    if m:
        schema = m.group("schema").strip('"').lower()
        if m.group("cat").lower() == "hive":
            from facebook_presto_spark.hive_catalog import get_catalog

            if schema not in get_catalog(spark).list_schemas():
                info.undo.append(
                    lambda: get_catalog(spark).drop_schema(schema, True))
        else:
            from facebook_presto_spark.connectors import get_catalogs

            mem = get_catalogs(spark).memory
            if schema not in mem.schemas:
                info.undo.append(lambda: mem.drop_schema(schema, True))
        return

    m = _DDL_DROP_SCHEMA_RE.match(sql)
    if m:
        schema = m.group("schema").strip('"').lower()
        if m.group("cat").lower() == "hive":
            from facebook_presto_spark.hive_catalog import get_catalog

            if schema in get_catalog(spark).list_schemas():
                info.undo.append(
                    lambda: get_catalog(spark).create_schema(schema, True))
        else:
            from facebook_presto_spark.connectors import get_catalogs

            mem = get_catalogs(spark).memory
            if schema in mem.schemas:
                info.undo.append(lambda: mem.create_schema(schema, True))
        return

    m = _DDL_RENAME_RE.match(sql)
    if m:
        cat_name = m.group("cat").lower()
        schema = m.group("schema").strip('"')
        table = m.group("table").strip('"')
        nschema = (m.group("nschema") or schema).strip('"')
        ntable = m.group("ntable").strip('"')
        if cat_name == "hive":
            from facebook_presto_spark.hive_catalog import get_catalog

            cat = get_catalog(spark)
            if cat._exists(schema, table):
                info.undo.append(
                    lambda: get_catalog(spark).rename(
                        nschema, ntable, schema, table))
        else:
            from facebook_presto_spark.connectors import get_catalogs

            mem = get_catalogs(spark).memory
            if (schema, table) in mem.tables:
                info.undo.append(
                    lambda: mem.rename(nschema, ntable, schema, table))
        return

    m = _DDL_ADDCOL_RE.match(sql)
    if m and m.group("cat").lower() == "hive":
        schema = m.group("schema").strip('"')
        table = m.group("table").strip('"')
        from facebook_presto_spark.hive_catalog import get_catalog

        cat = get_catalog(spark)
        if not cat._exists(schema, table):
            return
        db = cat.db_name(schema)
        jcat = spark._jsparkSession.sessionState().catalog()
        jident = spark._jvm.org.apache.spark.sql.catalyst.TableIdentifier(
            table, spark._jvm.scala.Some(db))
        pre_schema = jcat.getTableMetadata(jident).dataSchema().json()

        def undo_addcol():
            # the metadata-only inverse of ADD COLUMNS; SessionCatalog's
            # public path refuses dropped columns, the external catalog
            # applies the recorded pre-ALTER schema verbatim
            jc = spark._jsparkSession.sessionState().catalog()
            jc.externalCatalog().alterTableDataSchema(
                db, table,
                spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
                    pre_schema))
            spark.catalog.refreshTable(f"{db}.{table}")

        info.undo.append(undo_addcol)
        return

    m = _DDL_DESTRUCTIVE_RE.match(sql) or _DDL_DROP_RE.match(sql)
    if m:
        schema = m.group("schema").strip('"')
        table = m.group("table").strip('"')
        if m.group("cat").lower() == "hive":
            from facebook_presto_spark.hive_catalog import get_catalog

            if get_catalog(spark)._exists(schema, table):
                _snapshot_hive_table(engine, schema, table, info)
        else:
            from facebook_presto_spark.connectors import get_catalogs

            mem = get_catalogs(spark).memory
            view = mem.tables.get((schema, table))
            if view is not None and _DDL_DROP_RE.match(sql):
                prev = spark.table(view).localCheckpoint(eager=True)

                def undo_mem_drop():
                    mem.tables[(schema, table)] = view
                    mem._pin(view, prev)

                info.undo.append(undo_mem_drop)
        return

    m = _DDL_CREATE_VIEW_RE.match(sql)
    if m:
        name = m.group(1).strip('"').split(".")[-1].lower()
        prev = engine._views.get(name)

        def undo_create_view():
            if prev is None:
                try:
                    spark.catalog.dropTempView(name)
                except Exception:
                    pass
                engine._views.pop(name, None)
            else:
                spark.sql(engine.translate(
                    f"CREATE OR REPLACE VIEW {name} AS {prev}"))
                engine._views[name] = prev

        info.undo.append(undo_create_view)
        return

    m = _DDL_DROP_VIEW_RE.match(sql)
    if m:
        name = m.group(1).strip('"').split(".")[-1].lower()
        prev = engine._views.get(name)
        if prev is not None:
            def undo_drop_view():
                spark.sql(engine.translate(
                    f"CREATE OR REPLACE VIEW {name} AS {prev}"))
                engine._views[name] = prev

            info.undo.append(undo_drop_view)


def _discard_staging(info: TransactionInfo) -> None:
    """Drop the undo log and its file retention (COMMIT, or after a
    completed ROLLBACK)."""
    import shutil

    info.undo.clear()
    for d in info.backup_dirs:
        shutil.rmtree(d, ignore_errors=True)
    info.backup_dirs.clear()
