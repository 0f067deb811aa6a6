"""Run the reference's own sql-tests golden corpus against the engine.

The reference ships its end-user acceptance corpus at
``presto-product-tests/src/main/resources/sql-tests/testcases`` (tempto
convention: a ``.sql`` file whose leading ``--`` comment carries options,
with expected rows either inline after ``--!`` separators or in a sibling
``.result`` file).  This module parses that format, rebuilds the corpus'
fixture tables from the reference's own dataset files
(``sql-tests/datasets/*.ddl`` + ``*.data``, tempto's
``table-results/presto-nation.result``), and compares engine output
value-by-value — the literal "a user of the reference could switch"
check.  Nothing is copied into this repo: files are read from the
reference tree at run time and everything is skipped if it is absent.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

REFERENCE_SQL_TESTS = (
    "/root/reference/presto-product-tests/src/main/resources/sql-tests"
)
NATION_RESULT = (
    "/root/reference/presto-product-tests/src/main/resources/"
    "table-results/presto-nation.result"
)

# ---------------------------------------------------------------------------
# Testcase parsing (tempto convention)
# ---------------------------------------------------------------------------


@dataclass
class Case:
    """One query + golden section of a testcase file."""

    case_id: str
    sql: str
    expected: list[list[str]] | None  # None => no golden (smoke only)
    options: dict[str, str] = field(default_factory=dict)

    @property
    def tables(self) -> set[str]:
        t = self.options.get("tables", "")
        return {x.strip() for x in t.split(",") if x.strip()}

    @property
    def mutable_tables(self) -> list[tuple[str, str]]:
        """tempto ``mutable_tables: name|state`` declarations: a fresh
        per-case table with ``name``'s schema (state ``created`` = empty)."""
        out = []
        for decl in self.options.get("mutable_tables", "").split(","):
            decl = decl.strip()
            if decl:
                name, _, state = decl.partition("|")
                out.append((name.strip(), state.strip() or "created"))
        return out

    @property
    def statements(self) -> list[str]:
        """Split multi-statement sections on top-level semicolons."""
        parts, depth, cur, in_str = [], 0, [], False
        for ch in self.sql:
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == ";" and depth == 0:
                    parts.append("".join(cur).strip())
                    cur = []
                    continue
            cur.append(ch)
        tail = "".join(cur).strip()
        if tail:
            parts.append(tail)
        return [p for p in parts if p]


def _parse_options(lines: list[str]) -> dict[str, str]:
    opts: dict[str, str] = {}
    for line in lines:
        body = line.lstrip("-").strip()
        for piece in body.split(";"):
            if ":" in piece:
                k, _, v = piece.partition(":")
                opts[k.strip().lower()] = v.strip()
    return opts


def _split_rows(chunk: list[str], delim: str) -> list[list[str]]:
    rows = []
    for line in chunk:
        if not line.strip() or line.startswith("--"):
            continue
        cells = line.split(delim)
        if cells and cells[-1] == "":  # golden rows end with the delimiter
            cells = cells[:-1]
        rows.append(cells)
    return rows


def parse_testcase(sql_path: str) -> list[Case]:
    """Parse one testcase file into its (possibly several) cases."""
    text = open(sql_path).read()
    lines = text.splitlines()
    header: list[str] = []
    i = 0
    while i < len(lines) and lines[i].startswith("--") and not lines[i].startswith("--!"):
        header.append(lines[i])
        i += 1
    opts = _parse_options(header)
    rel = os.path.relpath(sql_path, REFERENCE_SQL_TESTS)
    base = rel.removeprefix("testcases/").removesuffix(".sql")

    if any(l.startswith("--!") for l in lines):
        # inline sections: --! name: x / SQL / --! / expected rows
        cases = []
        name, sql_buf, exp_buf, mode = None, [], [], None
        def flush():
            if name is not None and "\n".join(sql_buf).strip():
                delim = opts.get("delimiter", "|")
                suffix = f":{name}" if name else ""
                cases.append(Case(f"{base}{suffix}", "\n".join(sql_buf).strip(),
                                  _split_rows(exp_buf, delim), dict(opts)))
        for line in lines[i:]:
            m = re.match(r"--!\s*name\s*:\s*(.*)", line)
            if m:
                flush()
                name, sql_buf, exp_buf, mode = m.group(1).strip(), [], [], "sql"
            elif line.startswith("--!"):
                # bare separator: opens an (unnamed) SQL section, then
                # flips it to its expected-rows block
                if mode is None or mode == "exp":
                    flush()
                    name, sql_buf, exp_buf, mode = "", [], [], "sql"
                else:
                    mode = "exp"
            elif mode == "sql":
                sql_buf.append(line)
            elif mode == "exp":
                exp_buf.append(line)
        flush()
        return cases

    sql = "\n".join(l for l in lines[i:] if not l.startswith("--")).strip()
    result_path = sql_path[:-4] + ".result"
    expected = None
    if os.path.exists(result_path):
        rlines = open(result_path).read().splitlines()
        ropts_lines = [l for l in rlines if l.startswith("--")]
        opts.update(_parse_options(ropts_lines))
        if not any("todo" in l.lower() for l in ropts_lines):
            expected = _split_rows(rlines, opts.get("delimiter", "|"))
    return [Case(base, sql, expected, opts)]


def discover(root: str = REFERENCE_SQL_TESTS) -> list[str]:
    out = []
    tc = os.path.join(root, "testcases")
    for dirpath, _, files in os.walk(tc):
        for f in sorted(files):
            if f.endswith(".sql"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


# ---------------------------------------------------------------------------
# Fixture tables (from the reference's own dataset files)
# ---------------------------------------------------------------------------

_HIVE_TYPES = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "boolean": T.BooleanType(),
}


def _parse_ddl(path: str) -> T.StructType:
    cols = []
    body = open(path).read()
    m = re.search(r"\((.*)\)\s*ROW FORMAT", body, re.S | re.I)
    inner = m.group(1) if m else body.split("(", 1)[1].rsplit(")", 1)[0]
    for piece in re.split(r",\s*\n", inner.strip()):
        piece = piece.strip().rstrip(",")
        if not piece:
            continue
        mm = re.match(r"(\w+)\s+(\w+(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)", piece)
        if not mm:
            continue
        name, typ = mm.group(1), mm.group(2).lower().replace(" ", "")
        dm = re.match(r"decimal\((\d+),(\d+)\)", typ)
        dtype = (T.DecimalType(int(dm.group(1)), int(dm.group(2))) if dm
                 else _HIVE_TYPES[typ])
        cols.append(T.StructField(name, dtype))
    return T.StructType(cols)


def _parse_cell(raw: str, dtype: T.DataType):
    if raw == r"\N" or raw == "":
        return None
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(raw)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dtype, T.DecimalType):
        return decimal.Decimal(raw)
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(raw)
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
        return dt.datetime.fromisoformat(raw)
    if isinstance(dtype, T.BooleanType):
        return raw.strip().lower() == "true"
    return raw


def _load_delimited(spark: SparkSession, ddl: str, data: str) -> DataFrame:
    schema = _parse_ddl(ddl)
    rows = []
    if os.path.exists(data):
        for line in open(data).read().splitlines():
            if not line:
                continue
            cells = line.split("|")
            if len(cells) == len(schema) + 1 and cells[-1] == "":
                cells = cells[:-1]
            rows.append(tuple(_parse_cell(c, f.dataType)
                              for c, f in zip(cells, schema.fields)))
    return spark.createDataFrame(rows, schema)


# region is 5 constant rows (TPC-H spec); values as they appear in the
# corpus' own goldens (join/explicit_inner_join_select_star.result).
_REGION_ROWS = [
    (0, "AFRICA", "lar deposits. blithely final packages cajole. regular "
                  "waters are final requests. regular accounts are according to "),
    (1, "AMERICA", "hs use ironic, even requests. s"),
    (2, "ASIA", "ges. thinly even pinto beans ca"),
    (3, "EUROPE", "ly final courts cajole furiously final excuse"),
    (4, "MIDDLE EAST", "uickly special accounts cajole carefully blithely "
                       "close requests. carefully final asymptotes haggle furiousl"),
]


def load_fixtures(spark: SparkSession) -> dict[str, DataFrame]:
    """Build the corpus fixture tables used by the runnable testcases."""
    ds = os.path.join(REFERENCE_SQL_TESTS, "datasets")
    out: dict[str, DataFrame] = {}

    nation_schema = T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
        T.StructField("n_comment", T.StringType()),
    ])
    nrows = []
    for line in open(NATION_RESULT).read().splitlines():
        if not line or line.startswith("--"):
            continue
        c = line.split("|")
        nrows.append((int(c[0]), c[1], int(c[2]), c[3]))
    out["nation"] = spark.createDataFrame(nrows, nation_schema)

    region_schema = T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
        T.StructField("r_comment", T.StringType()),
    ])
    out["region"] = spark.createDataFrame(_REGION_ROWS, region_schema)

    for name in ("workers", "datatype", "empty"):
        ddl = os.path.join(ds, f"{name}.ddl")
        data = os.path.join(ds, f"{name}.data")
        if os.path.exists(ddl):
            out[name] = _load_delimited(spark, ddl, data)

    # the remaining TPC-H tables as tempto's Hive fixtures: real tiny data
    # (dbgen), prefixed column names, DOUBLE money columns
    from facebook_presto_spark.compat import tpch_tiny

    stage = tpch_tiny.generate()
    for name in ("customer", "supplier", "part", "partsupp", "orders",
                 "lineitem"):
        path = os.path.join(stage, f"{name}.parquet")
        cols = tpch_tiny.columns_of(name)
        exprs = [
            (F.col(c).cast("double") if c in tpch_tiny._DOUBLE_COLS
             else F.col(c)).alias(c)
            for c in cols
        ]
        out[name] = spark.read.parquet(path).select(*exprs)
    return out


def register_tiny_schema(spark: SparkSession, fixtures: dict[str, DataFrame]) -> None:
    """Register ``tiny.nation`` / ``tiny.region`` for testcases that address
    the in-process TPCH connector as ``tpch.tiny.t`` (TpchMetadata.java:86-93;
    connector columns are unprefixed: nationkey, name, …).  Persistent views
    can't reference temp views, so the fixtures are staged as parquet."""
    from facebook_presto_spark.compat import tpch_tiny

    stage = tpch_tiny.generate()
    spark.sql("CREATE DATABASE IF NOT EXISTS tiny")
    for name in tpch_tiny.TABLES:
        if name == "nation":
            # DuckDB's dbgen reproduces the official numeric streams but
            # not the official COMMENT text; the nation fixture
            # (table-results/presto-nation.result) carries the canonical
            # text the comment-ordering goldens assume.
            p = os.path.join(stage, "nation_official.parquet")
            df = fixtures["nation"]
            df.select(*[
                df[c].alias(c.split("_", 1)[1]) for c in df.columns
            ]).write.mode("overwrite").parquet(p)
            spark.sql(
                f"CREATE OR REPLACE VIEW tiny.nation AS "
                f"SELECT * FROM parquet.`{p}`"
            )
            continue
        p = os.path.join(stage, f"{name}.parquet")
        spark.sql(
            f"CREATE OR REPLACE VIEW tiny.{name} AS "
            + tpch_tiny.unprefixed_select(
                name, tpch_tiny.columns_of(name), f"parquet.`{p}`")
        )


# ---------------------------------------------------------------------------
# Result comparison
# ---------------------------------------------------------------------------


def _canon_decimal(d: decimal.Decimal) -> str:
    s = format(d, "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    return "0" if s in ("-0", "") else s


def _canon_actual(v, trim: bool):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 8 significant digits: goldens print floats with at most 9, and the
        # last can sit one ulp off across engines (double vs exact paths)
        return format(v, ".8g")
    if isinstance(v, decimal.Decimal):
        return _canon_decimal(v)
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, str):
        return v.strip() if trim else v
    return str(v)


def _canon_expected(raw: str, sample, trim: bool):
    s = raw.strip() if trim else raw
    if sample is None or isinstance(sample, str):
        # untyped comparison — still normalize the obvious scalars
        if s.lower() == "null":
            return "null"
        return s
    if s.lower() == "null":
        return "null"
    if isinstance(sample, bool):
        return s.strip().lower()
    if isinstance(sample, float):
        try:
            return format(float(s), ".8g")
        except ValueError:
            return s
    if isinstance(sample, decimal.Decimal):
        try:
            return _canon_decimal(decimal.Decimal(s.strip()))
        except decimal.InvalidOperation:
            return s
    if isinstance(sample, int):
        try:
            return str(int(s.strip()))
        except ValueError:
            return s
    if isinstance(sample, dt.datetime):
        try:
            return (dt.datetime.fromisoformat(s.strip())
                    .strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip("."))
        except ValueError:
            return s
    if isinstance(sample, dt.date):
        return s.strip()
    return s


def compare(df: DataFrame, case: Case) -> str | None:
    """Return None on match, else a human-readable diff summary."""
    rows = df.collect()
    trim = case.options.get("trimvalues", "false").lower() == "true"
    ignore_order = case.options.get("ignoreorder", "false").lower() == "true"
    ignore_excess = case.options.get("ignoreexcessrows", "false").lower() == "true"

    # column samples (first non-null per column) drive typed parsing of the
    # expected text — mirroring tempto, which parses goldens using the JDBC
    # result-set types.
    ncols = len(df.columns)
    samples = [None] * ncols
    for r in rows:
        for j in range(ncols):
            if samples[j] is None and r[j] is not None:
                samples[j] = r[j]

    actual = [tuple(_canon_actual(r[j], trim) for j in range(ncols)) for r in rows]
    expected = []
    for cells in case.expected or []:
        if len(cells) != ncols:
            return (f"{case.case_id}: golden has {len(cells)} columns, "
                    f"query produced {ncols}: {cells}")
        expected.append(tuple(_canon_expected(cells[j], samples[j], trim)
                              for j in range(ncols)))

    if ignore_order or ignore_excess:
        from collections import Counter
        a, e = Counter(actual), Counter(expected)
        if ignore_excess:
            missing = e - a
            if missing:
                return f"{case.case_id}: golden rows absent from output: {list(missing)[:5]}"
            return None
        if a != e:
            return (f"{case.case_id}: row multisets differ; "
                    f"missing={list((e - a))[:5]} extra={list((a - e))[:5]}")
        return None
    if actual != expected:
        for k, (x, y) in enumerate(zip(expected, actual)):
            if x != y:
                return f"{case.case_id}: row {k} differs: golden={x} actual={y}"
        return f"{case.case_id}: row count {len(actual)} != golden {len(expected)}"
    return None
