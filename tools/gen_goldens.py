"""Generate .result goldens for tests/sql_corpus via DuckDB.

Mirrors the reference's golden corpus
(presto-product-tests/src/main/resources/sql-tests/testcases/): each
``<group>/<name>.sql`` gets a ``<name>.result`` with one pipe-joined line
per row, in query order (every corpus query has a total ORDER BY).
NULL renders as ``NULL``; doubles are excluded from the corpus by design
(float formatting isn't portable — the oracle-hash suites cover them).

A testcase may carry a DuckDB-specific oracle rewrite after a line
``--!oracle`` (the reference's own H2-oracle suite rewrites expected SQL
the same way — QueryAssertions practice, SURVEY.md §7 risk register):
text above the marker runs through the engine, text below runs on DuckDB
to produce the golden.  Without the marker the same text runs on both.

Usage: python tools/gen_goldens.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb

CORPUS = os.path.join(os.path.dirname(__file__), "..", "tests", "sql_corpus")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)


def render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for path in sorted(glob.glob(os.path.join(CORPUS, "*", "*.sql"))):
        sql = open(path).read()
        if "--!oracle" in sql:
            sql = sql.split("--!oracle", 1)[1]
        rows = con.execute(sql).fetchall()
        out = path[:-4] + ".result"
        with open(out, "w") as f:
            for r in rows:
                f.write("|".join(render(v) for v in r) + "\n")
        print(f"{os.path.relpath(out, CORPUS)}: {len(rows)} rows")


if __name__ == "__main__":
    main()
