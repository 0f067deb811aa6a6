"""Type/literal semantics (SURVEY.md M1) — where silent wrongness lives.

Each test pins a semantic the reference defines precisely, checked against
either a hand-computed value or DuckDB:

- integer division truncates (Presto BIGINT '/' — ArithmeticBinaryExpression);
- decimal precision/scale arithmetic (DecimalType p≤38, same max as Spark);
- try_cast returns NULL on malformed input (TryCastFunction.java);
- timestamp is zone-less and the session runs UTC (SURVEY §1.2);
- varchar comparisons are unpadded (unlike char(n) — spi/type/Chars.java);
- double special values: NaN/Infinity ordering and is_finite behavior
  (MathFunctions.java is_finite/is_nan/infinity/nan);
- BIGINT overflow wraps silently with ANSI off, matching the reference's
  permissive long arithmetic.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import pytest


def _one(spark, sql):
    return spark.sql(sql).collect()[0][0]


def test_integer_division_truncates(spark):
    # Presto: 7/2 = 3 (integer); Spark with ANSI off: 7/2 = 3.5 (double) —
    # the dialect divergence is bridged by `div` in our emitted SQL.
    assert _one(spark, "SELECT 7 div 2") == 3
    assert _one(spark, "SELECT -7 div 2") == -3  # truncation toward zero


def test_decimal_arithmetic_precision(spark):
    v = _one(spark, "SELECT CAST('1.05' AS DECIMAL(10,2)) * CAST('2.10' AS DECIMAL(10,2))")
    assert v == Decimal("2.2050")  # scale adds: s1+s2
    v = _one(spark, "SELECT CAST('1' AS DECIMAL(38,0)) + CAST('0.5' AS DECIMAL(2,1))")
    assert v == Decimal("1.5")


def test_decimal_literal_typing_via_sqlfront(spark):
    from facebook_presto_spark.sqlfront import translate

    out = translate("SELECT DECIMAL '1.25' + DECIMAL '0.75'")
    row = spark.sql(out).collect()[0]
    assert row[0] == Decimal("2.00")


def test_try_cast_null_on_malformed(spark):
    assert _one(spark, "SELECT try_cast('abc' AS INTEGER)") is None
    assert _one(spark, "SELECT try_cast('42' AS INTEGER)") == 42
    assert _one(spark, "SELECT try_cast('1e3' AS DOUBLE)") == 1000.0


def test_try_division_by_zero(spark):
    from facebook_presto_spark.sqlfront import translate

    out = translate("SELECT try(1 / 0)")
    assert _one(spark, out) is None


def test_timestamp_zoneless_utc(spark):
    # parquet timestamps load as NTZ; literals are wall-clock
    v = _one(spark, "SELECT TIMESTAMP '2020-06-01 12:34:56'")
    assert v == datetime(2020, 6, 1, 12, 34, 56)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_varchar_comparison_unpadded(spark):
    assert _one(spark, "SELECT 'abc' = 'abc '") is False
    assert _one(spark, "SELECT rtrim('abc ') = 'abc'") is True


def test_double_special_values(spark):
    assert math.isnan(_one(spark, "SELECT CAST('NaN' AS DOUBLE)"))
    assert _one(spark, "SELECT CAST('Infinity' AS DOUBLE)") == math.inf
    # NaN sorts greatest (both Presto and Spark ordering semantics)
    rows = spark.sql(
        "SELECT v FROM VALUES (1.0), (CAST('NaN' AS DOUBLE)), "
        "(CAST('Infinity' AS DOUBLE)) AS t(v) ORDER BY v"
    ).collect()
    assert rows[0][0] == 1.0 and rows[1][0] == math.inf and math.isnan(rows[2][0])


def test_is_finite_translation(spark):
    from facebook_presto_spark.sqlfront import translate

    sql = translate("SELECT is_finite(x) FROM (VALUES (1.0), (CAST('Infinity' AS DOUBLE)), (CAST('NaN' AS DOUBLE))) AS t(x)")
    got = [r[0] for r in spark.sql(sql).collect()]
    assert got == [True, False, False]


def test_bigint_wraps_silently(spark):
    # ANSI off: long overflow wraps (the reference's unchecked long math)
    v = _one(spark, "SELECT CAST(9223372036854775807 AS BIGINT) + 1")
    assert v == -9223372036854775808


def test_day_of_week_iso(spark):
    from facebook_presto_spark.sqlfront import translate

    # 2020-06-01 was a Monday → ISO dow 1 (Presto day_of_week)
    sql = translate("SELECT day_of_week(DATE '2020-06-01'), day_of_week(DATE '2020-06-07')")
    row = spark.sql(sql).collect()[0]
    assert (row[0], row[1]) == (1, 7)


def test_null_sorting_matches_duckdb(spark):
    import duckdb

    from facebook_presto_spark.sqlfront import translate

    presto = "SELECT v FROM (VALUES (3), (NULL), (1)) AS t(v) ORDER BY v DESC"
    got = [r[0] for r in spark.sql(translate(presto)).collect()]
    want = [r[0] for r in duckdb.sql(
        "SELECT v FROM (VALUES (3), (NULL), (1)) t(v) ORDER BY v DESC NULLS LAST"
    ).fetchall()]
    assert got == want == [3, 1, None]
