"""Rejection parity: the reference's assertQueryFails corpus.

AbstractTestQueries.java asserts ~77 queries FAIL with a given message
regex (AbstractTestQueryFramework.assertQueryFails).  This suite
replays every pure-literal case through engine.sql and pins, per case,
whether this engine also rejects it — with an explicit, named
classification for each case the engine legitimately ACCEPTS:

- SPARK_SUPERSET: Spark natively implements a form the reference
  rejects as "not yet implemented" or restricts (INTERSECT ALL /
  EXCEPT ALL with ANSI bag semantics, recursive WITH, LEFT JOIN
  UNNEST).  Accepting with correct semantics is strictly better for a
  migrating user; the reference's own message signals intended future
  support.
- COERCION_SUPERSET: Presto's strict type system rejects mixed-type
  expressions that Spark's implicit-coercion rules resolve
  deterministically ('a' <> 1, length(1), mixed BETWEEN/ARRAY).
- PERMISSIVE_DIVERGENCE: documented engine divergence — integer
  division by zero yields NULL instead of raising DIVISION_BY_ZERO
  (sqlfront/translate.py module docstring; Spark non-ANSI arithmetic,
  COVERAGE.md).

Everything else must RAISE.  Message texts are Spark's error classes,
not the reference's analyzer strings — rejection parity is the
contract here (the reference's messages come from its own parser);
the engine's own reference-text errors are pinned where they exist
(test_access.py, test_hive_catalog.py, test_sqlfront.py).
"""

import pytest

from facebook_presto_spark.compat import abstract_queries as aq
from facebook_presto_spark.engine import PrestoSparkEngine

SF_DIR = "/root/testdata/sf0.001"

SPARK_SUPERSET = {
    "testIntersectAllFails#0",   # Spark INTERSECT ALL: ANSI bag semantics
    "testExceptAllFails#0",      # Spark EXCEPT ALL: ANSI bag semantics
    "testWithRecursive#0",       # Spark 4 recursive CTE
    # the translator's FROM-less subquery folds (_pass_scalar_no_from /
    # _pass_exists_no_from) decorrelate shapes the reference's planner
    # gave up on — the fold yields the ANSI-correct result
    "testCorrelatedScalarSubqueries#0",
    "testCorrelatedScalarSubqueriesWithScalarAggregation"
    "AndEqualityPredicatesInWhere#0",
    "testCorrelatedExistsSubqueriesWithEqualityPredicatesInWhere#0",
}

COERCION_SUPERSET = {
    "testOrderByWithOutputColumnReference#3",  # Spark resolves the alias
    "testFunctionNotRegistered#0",             # length(1): int→string
    "testTypeMismatch#0",                      # 1 <> 'x': coerced compare
    "testInvalidTypeInfixOperator#0",          # varchar + int: coerced
    "testInvalidTypeBetweenOperator#0",        # mixed BETWEEN: coerced
    "testInvalidTypeArray#0",                  # ARRAY[1,2,'a']: unified
    "testCaseNoElseInconsistentResultType#0",  # CASE arms: 2 → '2'
}

PERMISSIVE_DIVERGENCE = {
    "testTry#1",                  # 1/0 → NULL, not DIVISION_BY_ZERO
    "testTryNoMergeProjections#0",
}

ACCEPTED = SPARK_SUPERSET | COERCION_SUPERSET | PERMISSIVE_DIVERGENCE


@pytest.fixture(scope="module")
def eng(spark):
    engine = PrestoSparkEngine.for_dir(SF_DIR, spark=spark)
    for name, view_sql in aq.CONNECTOR_VIEWS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
            + view_sql.format(src=f"parquet.`{SF_DIR}/{name}.parquet`")
        )
    yield engine
    from facebook_presto_spark import catalog

    for name, df in catalog.register_views(spark, SF_DIR).items():
        df.createOrReplaceTempView(name)


# exception categories that count as a deliberate REJECTION — the
# analyzer/parser/translator refusing the statement, like the
# reference's SemanticException.  Anything else (Py4JJavaError from a
# UDF, SparkException mid-execution, a stray TypeError) means the
# engine ACCEPTED the statement and then crashed — that is a bug, not
# rejection parity, and fails the suite by name.
_REJECTION_KINDS = {"AnalysisException", "ParseException",
                    "ValueError", "NotImplementedError"}


def test_fail_corpus_rejection_parity(eng):
    cases = aq.extract_fails()
    assert len(cases) >= 30, "extraction regressed"
    wrong_accepts, wrong_rejects, crashes = [], [], []
    for case in cases:
        try:
            eng.sql(case.sql).collect()
            accepted = True
        except Exception as e:
            accepted = False
            kind = type(e).__name__
            if kind not in _REJECTION_KINDS:
                crashes.append(
                    f"{case.case_id}: {kind} is a crash, not a "
                    f"rejection: {str(e).splitlines()[0][:120]}")
        if accepted and case.case_id not in ACCEPTED:
            wrong_accepts.append(
                f"{case.case_id}: engine accepted; reference rejects "
                f"with /{case.message[:60]}/ — {case.sql[:90]}"
            )
        elif not accepted and case.case_id in ACCEPTED:
            wrong_rejects.append(
                f"{case.case_id}: classified accept-by-design but raised"
            )
    assert not wrong_accepts, "\n".join(wrong_accepts)
    assert not wrong_rejects, "\n".join(wrong_rejects)
    assert not crashes, "\n".join(crashes)


def test_fail_corpus_classification_is_current(eng):
    """Every classification entry still matches an extracted case, so
    closed divergences can't linger here unnoticed."""
    ids = {c.case_id for c in aq.extract_fails()}
    stale = ACCEPTED - ids
    assert not stale, f"stale classification entries: {sorted(stale)}"
