"""Extract the reference's AbstractTestQueries differential corpus.

presto-tests/.../AbstractTestQueries.java (8079 LoC) is the reference's
workhorse correctness tier: ~600 @Test methods call ``assertQuery(sql)``
(run on Presto AND the H2 oracle, diff the row multisets —
AbstractTestQueryFramework.java:124-147) or ``assertQuery(sql, oracleSql)``
when the oracle needs a dialect rewrite.

This module extracts every such call whose arguments are pure string
literals (including Java ``"a" + "b"`` concatenation) directly from the
reference source at run time.  The runner (tests/test_abstract_queries.py)
replays them over the driver's synthetic TPC-H tables through engine.sql,
with DuckDB standing in for H2 — the same differential protocol, same
query texts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

ABSTRACT_TEST_QUERIES = (
    "/root/reference/presto-tests/src/main/java/com/facebook/presto/tests/"
    "AbstractTestQueries.java"
)

# sibling suites sharing the same assertQuery protocol
SOURCES = (
    ABSTRACT_TEST_QUERIES,
    ABSTRACT_TEST_QUERIES.replace(
        "AbstractTestQueries", "AbstractTestAggregations"),
    ABSTRACT_TEST_QUERIES.replace(
        "AbstractTestQueries", "AbstractTestIntegrationSmokeTest"),
)


@dataclass
class DiffCase:
    case_id: str         # testMethodName#k
    sql: str             # run on the engine (Presto dialect)
    oracle: str | None   # run on DuckDB (None → same text as sql)
    ordered: bool        # assertQueryOrdered → positional compare


_CALL_RE = re.compile(r"\b(assertQuery|assertQueryOrdered)\s*\(")
_TEST_RE = re.compile(r"public\s+void\s+(\w+)\s*\(")


def _java_string_args(src: str, open_paren: int) -> list[str] | None:
    """Parse a balanced call-argument list; return the argument strings if
    every top-level argument is a pure literal concatenation, else None."""
    depth, i, n = 0, open_paren, len(src)
    args: list[list[str]] = [[]]
    buf: list[str] = []

    def flush_nonliteral() -> bool:
        # anything non-whitespace outside string literals besides '+'
        text = "".join(buf).strip()
        buf.clear()
        return text == "" or set(text) <= {"+", " ", "\n", "\r", "\t"}

    while i < n:
        ch = src[i]
        if ch == '"':
            # java string literal
            j = i + 1
            out = []
            while j < n:
                c = src[j]
                if c == "\\":
                    esc = src[j + 1]
                    out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\",
                                "'": "'"}.get(esc, esc))
                    j += 2
                    continue
                if c == '"':
                    break
                out.append(c)
                j += 1
            if not flush_nonliteral():
                return None
            args[-1].append("".join(out))
            i = j + 1
            continue
        if ch == "(":
            depth += 1
            if depth > 1:
                return None  # nested call → not a pure literal arg list
        elif ch == ")":
            depth -= 1
            if depth == 0:
                if not flush_nonliteral():
                    return None
                return ["".join(a) for a in args]
        elif ch == "," and depth == 1:
            if not flush_nonliteral():
                return None
            args.append([])
            i += 1
            continue
        if ch not in "()":
            buf.append(ch)
        i += 1
    return None


# TPCH-connector-style (unprefixed) projections of the driver's synthetic
# star schema (TpchMetadata.java:86-93 column naming), shared by the engine
# and the DuckDB stand-in oracle so both see identical relations.
CONNECTOR_VIEWS: dict[str, str] = {
    "orders": "SELECT o_orderkey AS orderkey, o_custkey AS custkey, "
              "o_orderstatus AS orderstatus, o_totalprice AS totalprice, "
              "o_orderdate AS orderdate, o_orderpriority AS orderpriority "
              "FROM {src}",
    "lineitem": "SELECT l_orderkey AS orderkey, l_partkey AS partkey, "
                "l_suppkey AS suppkey, l_linenumber AS linenumber, "
                "l_quantity AS quantity, l_extendedprice AS extendedprice, "
                "l_discount AS discount, l_tax AS tax, "
                "l_returnflag AS returnflag, l_linestatus AS linestatus, "
                "l_shipdate AS shipdate FROM {src}",
    "customer": "SELECT c_custkey AS custkey, c_name AS name, "
                "c_nationkey AS nationkey, c_acctbal AS acctbal, "
                "c_mktsegment AS mktsegment FROM {src}",
    "supplier": "SELECT s_suppkey AS suppkey, s_name AS name, "
                "s_nationkey AS nationkey, s_acctbal AS acctbal FROM {src}",
    "part": "SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand, "
            "p_type AS type, p_size AS size, p_retailprice AS retailprice "
            "FROM {src}",
    "nation": "SELECT n_nationkey AS nationkey, n_name AS name, "
              "n_regionkey AS regionkey FROM {src}",
    "region": "SELECT r_regionkey AS regionkey, r_name AS name FROM {src}",
}


def extract_all() -> list[DiffCase]:
    """Extract every suite in SOURCES, case ids prefixed by suite name."""
    import os

    out: list[DiffCase] = []
    for path in SOURCES:
        if not os.path.exists(path):
            continue
        prefix = os.path.basename(path).removesuffix(".java") \
            .removeprefix("AbstractTest").lower()
        for c in extract(path):
            c.case_id = f"{prefix}:{c.case_id}" if prefix != "queries" \
                else c.case_id
            out.append(c)
    return out


@dataclass
class FailCase:
    case_id: str      # testMethodName#k
    sql: str          # must be REJECTED by the engine
    message: str      # the reference's expected error regex


def extract_fails(path: str = ABSTRACT_TEST_QUERIES) -> list["FailCase"]:
    """Extract every pure-literal ``assertQueryFails(sql, regex)`` call —
    the reference's REJECTION corpus (AbstractTestQueryFramework.java:
    assertQueryFails runs the query and asserts it fails with a message
    matching the given regex)."""
    src = open(path).read()
    methods = [(m.start(), m.group(1)) for m in _TEST_RE.finditer(src)]
    fail_re = re.compile(r"\bassertQueryFails\s*\(")
    cases: list[FailCase] = []
    counters: dict[str, int] = {}
    for m in fail_re.finditer(src):
        name = "unknown"
        for pos, meth in methods:
            if pos < m.start():
                name = meth
            else:
                break
        args = _java_string_args(src, m.end() - 1)
        if not args or len(args) < 2 or not args[0].strip():
            continue
        sql = args[0].strip()
        if not sql.upper().startswith(("SELECT", "WITH", "VALUES", "(")):
            continue
        k = counters.get(name, 0)
        counters[name] = k + 1
        cases.append(FailCase(f"{name}#{k}", sql, args[1].strip()))
    return cases


def extract(path: str = ABSTRACT_TEST_QUERIES) -> list[DiffCase]:
    src = open(path).read()
    # map positions → enclosing test method name
    methods = [(m.start(), m.group(1)) for m in _TEST_RE.finditer(src)]
    cases: list[DiffCase] = []
    counters: dict[str, int] = {}
    for m in _CALL_RE.finditer(src):
        name = "unknown"
        for pos, meth in methods:
            if pos < m.start():
                name = meth
            else:
                break
        args = _java_string_args(src, m.end() - 1)
        if not args or not args[0].strip():
            continue
        sql = args[0].strip()
        if not sql.upper().startswith(("SELECT", "WITH", "VALUES", "(")):
            continue
        oracle = None
        if len(args) >= 2 and args[1].strip().upper().startswith(
                ("SELECT", "WITH", "VALUES", "(")):
            oracle = args[1].strip()
        elif len(args) >= 2:
            continue  # second arg is a session/flag object → too dynamic
        k = counters.get(name, 0)
        counters[name] = k + 1
        cases.append(DiffCase(
            f"{name}#{k}", sql, oracle,
            ordered=m.group(1) == "assertQueryOrdered",
        ))
    return cases
