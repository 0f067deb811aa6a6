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
CONTEXT with single-statement write semantics — it carries the
isolation level and access mode, REJECTS writes in READ ONLY
transactions with the reference's message, lists live transactions in
``system.runtime.transactions``, and round-trips the protocol headers.
ROLLBACK ends the context without undoing statements that already
committed — the documented divergence (COVERAGE.md); the reference's
hive connector behaves the same way for already-flushed partitions
only at the metastore level, so read-only enforcement is the part a
migrating JDBC client (``setAutoCommit(false)`` → READ ONLY checks)
actually exercises.
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
                 "create_time", "last_active", "written_catalog", "catalogs")

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
    m = _COMMIT_RE.match(sql) or _ROLLBACK_RE.match(sql)
    if m:
        tid = engine.current_transaction()
        if tid is None:
            # CommitTask.java / RollbackTask.java — NOT_IN_TRANSACTION
            raise ValueError("No transaction in progress")
        engine.transactions.end(tid)
        engine.set_current_transaction(None)
        engine.txn_event = ("cleared", tid)
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
