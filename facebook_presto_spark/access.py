"""GRANT / REVOKE / SHOW GRANTS — the reference's table-privilege surface.

Reference: execution/GrantTask.java:39 / RevokeTask.java (privilege
parsing + validation), spi/security/Privilege.java (SELECT / INSERT /
DELETE / UPDATE), ShowQueriesRewrite.visitShowGrants:211 (SHOW GRANTS
rewrites to a select over information_schema.table_privileges, whose
shape InformationSchemaMetadata.java:107-116 declares).

The engine keeps grants in a session-scoped registry (the reference
delegates storage to the connector's metadata — a session catalog here),
feeds them into the ``information_schema.table_privileges`` view, and
answers SHOW GRANTS from the same rows.  Enforcement is NOT wired into
query execution (the reference enforces through AccessControl plugins;
this engine is single-user) — the surface is metadata bookkeeping with
the reference's validation errors, and that limit is documented in
COVERAGE.md.
"""

from __future__ import annotations

import re

# spi/security/Privilege.java
PRIVILEGES = ("SELECT", "INSERT", "DELETE", "UPDATE")

GRANT_RE = re.compile(
    r"\s*GRANT\s+(.+?)\s+ON\s+(?:TABLE\s+)?([\w.\"]+)\s+TO\s+"
    r"(?:USER\s+|ROLE\s+)?([\w\"]+)(\s+WITH\s+GRANT\s+OPTION)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
REVOKE_RE = re.compile(
    r"\s*REVOKE\s+(GRANT\s+OPTION\s+FOR\s+)?(.+?)\s+ON\s+(?:TABLE\s+)?"
    r"([\w.\"]+)\s+FROM\s+(?:USER\s+|ROLE\s+)?([\w\"]+)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
SHOW_GRANTS_RE = re.compile(
    r"\s*SHOW\s+GRANTS(?:\s+ON\s+(?:TABLE\s+)?([\w.\"]+))?\s*;?\s*$",
    re.IGNORECASE,
)


def parse_privileges(text: str) -> list[str]:
    """Privilege list with GrantTask.java's validation: ALL PRIVILEGES
    expands; unknown names raise, matching 'Unknown privilege: %s'."""
    if re.fullmatch(r"ALL\s+PRIVILEGES", text.strip(), re.IGNORECASE):
        return list(PRIVILEGES)
    out = []
    for p in text.split(","):
        name = p.strip().upper()
        if name not in PRIVILEGES:
            raise ValueError(f"Unknown privilege: {p.strip()}")
        out.append(name)
    return out


class GrantRegistry:
    """(grantee, table) → privilege → is_grantable."""

    def __init__(self, catalog: str = "spark", schema: str = "default",
                 grantor: str = "admin"):
        self.catalog = catalog
        self.schema = schema
        self.grantor = grantor
        self._grants: dict[tuple[str, str], dict[str, bool]] = {}

    def grant(self, grantee: str, table: str, privs: list[str],
              grantable: bool) -> None:
        slot = self._grants.setdefault((grantee, table), {})
        for p in privs:
            slot[p] = grantable or slot.get(p, False)

    def revoke(self, grantee: str, table: str, privs: list[str],
               grant_option_only: bool) -> None:
        slot = self._grants.get((grantee, table))
        if not slot:
            return
        for p in privs:
            if p not in slot:
                continue
            if grant_option_only:
                slot[p] = False  # RevokeTask: keep privilege, drop option
            else:
                del slot[p]
        if not slot:
            del self._grants[(grantee, table)]

    def rows(self, table: str | None = None) -> list[tuple]:
        """information_schema.table_privileges rows
        (InformationSchemaMetadata.java:107-116 column order)."""
        out = []
        for (grantee, tbl), privs in sorted(self._grants.items()):
            if table is not None and tbl != table:
                continue
            for p in sorted(privs):
                out.append((
                    self.grantor, grantee, self.catalog, self.schema,
                    tbl, p, privs[p], False,
                ))
        return out


def dispatch(engine, sql: str):
    """Handle GRANT / REVOKE / SHOW GRANTS; None if ``sql`` is neither."""
    m = GRANT_RE.match(sql)
    if m:
        privs = parse_privileges(m.group(1))
        table = m.group(2).strip('"')
        if not engine.spark.catalog.tableExists(table):
            raise ValueError(f"Table '{table}' does not exist")
        engine.grants.grant(m.group(3).strip('"'), table, privs,
                            grantable=bool(m.group(4)))
        return engine.spark.sql("SELECT true AS ok WHERE false")
    m = REVOKE_RE.match(sql)
    if m:
        privs = parse_privileges(m.group(2))
        table = m.group(3).strip('"')
        if not engine.spark.catalog.tableExists(table):
            raise ValueError(f"Table '{table}' does not exist")
        engine.grants.revoke(m.group(4).strip('"'), table, privs,
                             grant_option_only=bool(m.group(1)))
        return engine.spark.sql("SELECT true AS ok WHERE false")
    m = SHOW_GRANTS_RE.match(sql)
    if m:
        table = m.group(1).strip('"') if m.group(1) else None
        if table is not None and not engine.spark.catalog.tableExists(table):
            raise ValueError(f"Table '{table}' does not exist")
        from facebook_presto_spark.infoschema import TABLE_SCHEMAS

        full = engine.spark.createDataFrame(
            engine.grants.rows(table), TABLE_SCHEMAS["table_privileges"]
        )
        # ShowQueriesRewrite.visitShowGrants:244-254 — aliased projection
        # over table_privileges, ordered by grantee, table_name
        return full.selectExpr(
            "grantee AS Grantee", "table_catalog AS Catalog",
            "table_schema AS Schema", "table_name AS Table",
            "privilege_type AS Privilege", "is_grantable AS Grantable",
        ).orderBy("Grantee", "Table")
    return None


_TXN_RE = re.compile(
    r"\s*(START\s+TRANSACTION|COMMIT|ROLLBACK)\b", re.IGNORECASE
)
_CALL_RE = re.compile(r"\s*CALL\s+", re.IGNORECASE)


def reject_unsupported(sql: str) -> None:
    """Loud, specific failures for the transaction / procedure surface
    (StartTransactionTask.java:37, CallTask.java:60): Spark's writers
    commit per statement (two-phase per job), so multi-statement
    transactions cannot be honored, and no connector procedures exist."""
    if _TXN_RE.match(sql):
        raise NotImplementedError(
            "transactions (START TRANSACTION/COMMIT/ROLLBACK) are not "
            "supported: Spark commits writes per statement (per-job "
            "two-phase commit); there is no multi-statement transaction "
            "context to manage (reference: StartTransactionTask.java)"
        )
    if _CALL_RE.match(sql):
        raise NotImplementedError(
            "CALL is not supported for connector procedures "
            "(CallTask.java) — no Spark-session equivalent here; the "
            "system procedure CALL system.runtime.kill_query(id, msg) "
            "IS supported (systemtables.py)"
        )
