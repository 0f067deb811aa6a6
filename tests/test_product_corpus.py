"""The reference's own sql-tests golden corpus, run verbatim.

Every runnable testcase from
``/root/reference/presto-product-tests/src/main/resources/sql-tests`` is
parsed in the tempto format, executed through ``engine.sql`` against
fixture tables rebuilt from the reference's own dataset files, and
compared against the shipped goldens (see
``facebook_presto_spark/compat/product_tests.py``).

Runnable = the case's required tables are all rebuildable from the
reference tree (nation, region, workers, datatype, empty).  Directories
that need the real TPC-H tiny dataset (hive_tpch, tpcds, window_functions,
order_by, tpch_connector), live Hive/JMX/system infrastructure, mutable
tables (insert), or the CLI color easter-eggs are excluded with reasons.
"""

from __future__ import annotations

import os

import pytest

from facebook_presto_spark.compat import product_tests as pt

pytestmark = pytest.mark.skipif(
    not os.path.isdir(pt.REFERENCE_SQL_TESTS),
    reason="reference sql-tests corpus not present",
)

AVAILABLE_TABLES = {"nation", "region", "workers", "datatype", "empty",
                    "customer", "supplier", "part", "partsupp", "orders",
                    "lineitem"}

# directory (relative to testcases/) -> why it cannot run here
SKIP_DIRS = {
    "tpcds": "covered by tests/test_tpcds.py (full 103-query differential)",
    "hive_tpch": "goldens are the canonical SF1 answer set with Presto's "
                 "same-scale decimal aggregates; TPC-H correctness is "
                 "covered at sf0.01/sf0.1 by the driver oracle gate, the "
                 "prestosql_* suite and tests/test_reference_sql.py",
    "catalog": "SHOW TABLES/COLUMNS against jmx/system catalogs",
    "system": "system.runtime tables are coordinator-specific",
    "connectors": "live connector infrastructure",
    "color_functions": "CLI rendering easter-eggs (skipped per SURVEY §2.2)",
    "ml_functions": "libsvm SVM models (our ML ops are pipeline/ml.py)",
    "orc": "Hive ORC table fixtures",
}

SKIP_CASES = {
    "functions/checkFunctionsRegistered":
        "SHOW FUNCTIONS golden lists Java signatures (ours differ by design)",
    "tpch_connector/showSchemas":
        "tpch-connector catalog listing (sf1..sf100000 schema names)",
    "tpch_connector/showTables": "tpch-connector catalog listing",
    "group-by/runHavingWithMultipleAggs": "golden computed on the sf1 "
        "dataset (part counts ~1300/type; tiny has ~80)",
}


def _runnable():
    cases, skips = [], []
    for path in pt.discover():
        rel = os.path.relpath(path, os.path.join(pt.REFERENCE_SQL_TESTS, "testcases"))
        d = rel.split(os.sep)[0]
        for case in pt.parse_testcase(path):
            if d in SKIP_DIRS:
                skips.append((case.case_id, SKIP_DIRS[d]))
                continue
            base = case.case_id.split(":")[0]
            if base in SKIP_CASES or case.case_id in SKIP_CASES:
                skips.append((case.case_id, SKIP_CASES.get(base) or SKIP_CASES[case.case_id]))
                continue
            if "show functions" in case.sql.lower():
                skips.append((case.case_id, "SHOW FUNCTIONS signature listing"))
                continue
            if not case.tables <= AVAILABLE_TABLES:
                skips.append((case.case_id,
                              f"needs tables {sorted(case.tables - AVAILABLE_TABLES)}"))
                continue
            cases.append(case)
    return cases, skips


CASES, SKIPS = _runnable() if os.path.isdir(pt.REFERENCE_SQL_TESTS) else ([], [])


@pytest.fixture(scope="module")
def corpus_engine(spark, sf_dir):
    from facebook_presto_spark.engine import PrestoSparkEngine

    engine = PrestoSparkEngine.for_dir(sf_dir, spark=spark)
    fixtures = pt.load_fixtures(spark)
    for name, df in fixtures.items():
        df.createOrReplaceTempView(name)
    pt.register_tiny_schema(spark, fixtures)
    yield engine
    # restore the driver tables the fixtures shadowed
    from facebook_presto_spark import catalog

    for name, df in catalog.register_views(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


import re as _re

_MUTABLE_RE = _re.compile(r"\$\{mutableTables\.\w+\.(\w+)\}")


@pytest.mark.parametrize("case", CASES, ids=[c.case_id for c in CASES])
def test_product_corpus(corpus_engine, case):
    statements = case.statements
    made_tables = []
    if case.mutable_tables:
        # tempto mutable-table protocol: each case gets a fresh table with
        # the named fixture's schema (state 'created' = empty), addressed
        # through the ${mutableTables.hive.name} placeholder.
        import hashlib

        spark = corpus_engine.spark
        fixtures = pt.load_fixtures(spark)
        tag = hashlib.md5(case.case_id.encode()).hexdigest()[:8]
        for name, state in case.mutable_tables:
            tbl = f"mut_{name}_{tag}"
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            src = fixtures[name]
            (src if state == "loaded" else src.limit(0)) \
                .write.mode("overwrite").saveAsTable(tbl)
            made_tables.append(tbl)
        statements = [
            _MUTABLE_RE.sub(lambda m: f"mut_{m.group(1)}_{tag}", s)
            for s in statements
        ]
    try:
        for stmt in statements[:-1]:
            corpus_engine.sql(stmt).collect()
        df = corpus_engine.sql(statements[-1])
        if case.expected is None:
            # golden marked 'todo' upstream: execution smoke only.  count()
            # rather than collect() — interval results execute fine but
            # lack a PySpark collection codec
            # (YearMonthIntervalType.fromInternal).
            assert df.count() >= 0
            return
        err = pt.compare(df, case)
        assert err is None, err
    finally:
        for tbl in made_tables:
            corpus_engine.spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_corpus_coverage_accounting():
    """The corpus split is explicit: everything is either run or skipped
    with a reason — no silently dropped testcases."""
    total = sum(len(pt.parse_testcase(p)) for p in pt.discover())
    assert total == len(CASES) + len(SKIPS)
    assert len(CASES) >= 100
