"""Golden-file SQL corpus runner (SURVEY.md §5 tier 3).

Mirrors the reference's presto-product-tests sql-tests layout: each
``tests/sql_corpus/<group>/<name>.sql`` runs through the Presto-dialect
front-end (``PrestoSparkEngine.sql``) and must reproduce
``<name>.result`` (DuckDB-generated, pipe-joined rows, query order —
every corpus query carries a total ORDER BY).
"""

from __future__ import annotations

import glob
import os

import pytest

from facebook_presto_spark.engine import PrestoSparkEngine

CORPUS = os.path.join(os.path.dirname(__file__), "sql_corpus")
CASES = sorted(glob.glob(os.path.join(CORPUS, "*", "*.sql")))


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


@pytest.mark.parametrize(
    "sql_path", CASES, ids=[os.path.relpath(p, CORPUS)[:-4] for p in CASES]
)
def test_golden(engine, sql_path):
    sql = open(sql_path).read()
    # text after a `--!oracle` marker is the DuckDB golden-side rewrite
    # (see tools/gen_goldens.py); the engine runs the text above it.
    sql = sql.split("--!oracle", 1)[0]
    want = open(sql_path[:-4] + ".result").read().splitlines()
    rows = engine.sql(sql).collect()
    got = ["|".join(_render(v) for v in r) for r in rows]
    assert got == want, (
        f"{os.path.basename(sql_path)}: {len(got)} rows vs golden {len(want)}\n"
        f"first diff: {next(((a, b) for a, b in zip(got, want) if a != b), None)}"
    )
