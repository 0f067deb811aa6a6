"""The reference's own scalar assertion corpus, as a frozen gate.

compat/scalar_assertions.py harvests every assertFunction case with an
interpretable expected literal from the reference's operator/type test
sources (~2,320 of ~3,400 calls across 23 files) and this test replays
them through engine.sql.  Unlike the DuckDB differential, the expected
values here are the REFERENCE'S OWN — they catch divergences both
engines share (e.g. the round-10 finds: integer `/` semantics, LIKE's
no-default-escape rule, chr() beyond ASCII, typed json_array_contains,
map equality, canonical JSON casts).

KNOWN holds the reviewed residual (222 of 2,320 at freeze), by class:

* division-by-zero IEEE semantics — Presto doubles give NaN/±Inf,
  Spark returns NULL for every `/` by zero; respelling every division
  with a typeof dispatch would tax hot paths (documented hold, same
  class as the module-header integer-`/` note in sqlfront/translate.py)
* integer `/` — Presto int/int truncates; Spark divides fractionally
  (documented: write `div` explicitly)
* CHAR(n) type semantics — trailing-space-insensitive comparison,
  length() of padded values
* REAL (float32) formatting — Python erases the 32-bit type, so
  Float.toString digit shortening can't be reproduced
* array/row comparison three-valued logic with NULL elements
  (`ARRAY[1,null] = ARRAY[1,null]` is NULL in the reference)
* `||` between an array and a scalar (append/prepend) — untyped
  at the token layer
* regexp_replace lambda variant; regexp named-group ${name}
  replacement references; regexp_split empty-pattern boundary rows
* JSON→typed-array coercion casts (JSON '[12, "12"]' AS ARRAY<TINYINT>
  — the reference coerces across token kinds, from_json does not)
* varchar(n)/decimal default-precision typeof text
* test-local helpers (vl(), unchecked_to_json) that exist only inside
  the reference's test class
"""

from __future__ import annotations

import pytest

from facebook_presto_spark.compat.scalar_assertions import (
    harvest,
    match,
    to_py,
)

KNOWN = {
    'TestArrayOperators#27': 'mismatch',
    'TestArrayOperators#32': 'mismatch',
    'TestArrayOperators#37': 'error',
    'TestArrayOperators#44': 'mismatch',
    'TestArrayOperators#45': 'mismatch',
    'TestArrayOperators#46': 'mismatch',
    'TestArrayOperators#47': 'mismatch',
    'TestArrayOperators#48': 'mismatch',
    'TestArrayOperators#50': 'mismatch',
    'TestArrayOperators#54': 'mismatch',
    'TestArrayOperators#57': 'mismatch',
    'TestArrayOperators#108': 'error',
    'TestArrayOperators#116': 'mismatch',
    'TestArrayOperators#117': 'error',
    'TestArrayOperators#118': 'error',
    'TestArrayOperators#130': 'error',
    'TestArrayOperators#131': 'error',
    'TestArrayOperators#134': 'error',
    'TestArrayOperators#255': 'error',
    'TestArrayOperators#256': 'error',
    'TestArrayOperators#257': 'error',
    'TestArrayOperators#258': 'error',
    'TestArrayOperators#260': 'error',
    'TestArrayOperators#483': 'error',
    'TestArrayOperators#507': 'error',
    'TestArrayOperators#508': 'error',
    'TestArrayOperators#514': 'error',
    'TestArrayOperators#518': 'error',
    'TestArrayOperators#523': 'mismatch',
    'TestArrayOperators#524': 'mismatch',
    'TestArrayOperators#525': 'mismatch',
    'TestArrayOperators#526': 'mismatch',
    'TestArrayOperators#531': 'mismatch',
    'TestArrayOperators#558': 'mismatch',
    'TestArrayOperators#562': 'mismatch',
    'TestArrayOperators#603': 'error',
    'TestArrayOperators#675': 'error',
    'TestMapOperators#31': 'mismatch',
    'TestMapOperators#41': 'mismatch',
    'TestMapOperators#46': 'mismatch',
    'TestMapOperators#51': 'error',
    'TestMapOperators#64': 'mismatch',
    'TestMapOperators#80': 'error',
    'TestMapOperators#221': 'error',
    'TestMapOperators#222': 'error',
    'TestMapOperators#223': 'error',
    'TestMapOperators#224': 'error',
    'TestMapOperators#225': 'error',
    'TestMapOperators#226': 'error',
    'TestMapOperators#227': 'error',
    'TestMapOperators#228': 'error',
    'TestMapOperators#229': 'error',
    'TestMapOperators#230': 'error',
    'TestMapOperators#231': 'error',
    'TestMapOperators#232': 'error',
    'TestMapOperators#233': 'error',
    'TestMapOperators#234': 'error',
    'TestMapOperators#235': 'error',
    'TestMapOperators#267': 'error',
    'TestMapOperators#269': 'mismatch',
    'TestMapOperators#270': 'error',
    'TestMapOperators#272': 'error',
    'TestMapOperators#273': 'error',
    'TestMapOperators#275': 'error',
    'TestMapOperators#276': 'error',
    'TestMapOperators#277': 'error',
    'TestMapOperators#286': 'error',
    'TestMapOperators#287': 'error',
    'TestMapOperators#288': 'error',
    'TestMapOperators#289': 'error',
    'TestMapOperators#290': 'error',
    'TestMapOperators#303': 'error',
    'TestStringFunctions#444': 'error',
    'TestStringFunctions#445': 'error',
    'TestStringFunctions#446': 'error',
    'TestStringFunctions#455': 'mismatch',
    'TestStringFunctions#457': 'mismatch',
    'TestStringFunctions#459': 'mismatch',
    'TestMathFunctions#316': 'mismatch',
    'TestMathFunctions#318': 'mismatch',
    'TestMathFunctions#319': 'mismatch',
    'TestMathFunctions#320': 'mismatch',
    'TestMathFunctions#322': 'mismatch',
    'TestMathFunctions#323': 'mismatch',
    'TestMathFunctions#327': 'mismatch',
    'TestMathFunctions#329': 'mismatch',
    'TestMathFunctions#331': 'mismatch',
    'TestMathFunctions#335': 'mismatch',
    'TestMathFunctions#390': 'error',
    'TestMathFunctions#392': 'error',
    'TestMathFunctions#396': 'error',
    'TestMathFunctions#413': 'error',
    'TestMathFunctions#415': 'error',
    'TestMathFunctions#427': 'error',
    'TestMathFunctions#428': 'error',
    'TestMathFunctions#432': 'error',
    'TestMathFunctions#571': 'error',
    'TestMathFunctions#572': 'error',
    'TestMathFunctions#574': 'error',
    'TestMathFunctions#575': 'error',
    'TestMathFunctions#580': 'mismatch',
    'TestMathFunctions#581': 'mismatch',
    'TestMathFunctions#640': 'mismatch',
    'TestMathFunctions#641': 'mismatch',
    'TestMathFunctions#645': 'mismatch',
    'TestMathFunctions#679': 'mismatch',
    'TestMathFunctions#704': 'mismatch',
    'TestMathFunctions#727': 'mismatch',
    'TestMathFunctions#738': 'mismatch',
    'TestMathFunctions#739': 'mismatch',
    'TestMathFunctions#748': 'error',
    'TestMathFunctions#749': 'error',
    'TestZipFunction#14': 'error',
    'TestZipWithFunction#11': 'error',
    'TestMapZipWithFunction#7': 'mismatch',
    'TestMapFilterFunction#10': 'mismatch',
    'TestMapTransformKeyFunction#6': 'error',
    'TestMapTransformKeyFunction#18': 'error',
    'TestMapTransformKeyFunction#20': 'error',
    'TestMapTransformValueFunction#6': 'error',
    'TestMapTransformValueFunction#19': 'error',
    'TestArrayFilterFunction#1': 'mismatch',
    'TestArrayTransformFunction#2': 'mismatch',
    'TestArrayTransformFunction#9': 'mismatch',
    'TestArrayTransformFunction#10': 'error',
    'TestArrayTransformFunction#16': 'error',
    'TestArrayTransformFunction#30': 'error',
    'TestArrayReduceFunction#2': 'error',
    'TestArrayReduceFunction#16': 'error',
    'TestArrayExceptFunction#8': 'error',
    'TestArrayExceptFunction#9': 'error',
    'TestArrayExceptFunction#10': 'error',
    'TestRegexpFunctions#25': 'mismatch',
    'TestRegexpFunctions#26': 'mismatch',
    'TestRegexpFunctions#27': 'mismatch',
    'TestRegexpFunctions#28': 'mismatch',
    'TestRegexpFunctions#30': 'error',
    'TestRegexpFunctions#31': 'error',
    'TestRegexpFunctions#32': 'error',
    'TestRegexpFunctions#33': 'error',
    'TestRegexpFunctions#34': 'error',
    'TestRegexpFunctions#35': 'error',
    'TestRegexpFunctions#36': 'error',
    'TestRegexpFunctions#37': 'error',
    'TestRegexpFunctions#38': 'error',
    'TestRegexpFunctions#39': 'error',
    'TestRegexpFunctions#40': 'error',
    'TestRegexpFunctions#41': 'error',
    'TestRegexpFunctions#42': 'error',
    'TestRegexpFunctions#43': 'error',
    'TestRegexpFunctions#44': 'error',
    'TestRegexpFunctions#45': 'error',
    'TestRegexpFunctions#46': 'error',
    'TestRegexpFunctions#47': 'error',
    'TestRegexpFunctions#48': 'error',
    'TestRegexpFunctions#49': 'error',
    'TestRegexpFunctions#50': 'error',
    'TestRegexpFunctions#51': 'error',
    'TestRegexpFunctions#52': 'error',
    'TestRegexpFunctions#53': 'error',
    'TestRegexpFunctions#54': 'error',
    'TestRegexpFunctions#55': 'error',
    'TestRegexpFunctions#56': 'error',
    'TestRegexpFunctions#57': 'error',
    'TestRegexpFunctions#58': 'error',
    'TestRegexpFunctions#59': 'error',
    'TestRegexpFunctions#60': 'error',
    'TestRegexpFunctions#61': 'error',
    'TestRegexpFunctions#62': 'error',
    'TestRegexpFunctions#63': 'error',
    'TestRegexpFunctions#64': 'error',
    'TestRegexpFunctions#65': 'error',
    'TestRegexpFunctions#66': 'error',
    'TestRegexpFunctions#67': 'error',
    'TestRegexpFunctions#68': 'error',
    'TestRegexpFunctions#69': 'error',
    'TestRegexpFunctions#70': 'error',
    'TestRegexpFunctions#71': 'error',
    'TestRegexpFunctions#74': 'mismatch',
    'TestRegexpFunctions#87': 'mismatch',
    'TestJsonFunctions#0': 'error',
    'TestJsonFunctions#1': 'error',
    'TestJsonFunctions#2': 'error',
    'TestJsonFunctions#3': 'error',
    'TestJsonFunctions#4': 'error',
    'TestJsonFunctions#5': 'error',
    'TestJsonFunctions#6': 'error',
    'TestJsonFunctions#7': 'error',
    'TestJsonFunctions#8': 'error',
    'TestJsonFunctions#9': 'error',
    'TestJsonFunctions#10': 'error',
    'TestJsonFunctions#11': 'error',
    'TestJsonFunctions#12': 'error',
    'TestJsonFunctions#54': 'mismatch',
    'TestUrlFunctions#2': 'mismatch',
    'TestUrlFunctions#3': 'mismatch',
    'TestUrlFunctions#6': 'mismatch',
    'TestTryFunction#0': 'error',
    'TestTryFunction#1': 'error',
    'TestTryFunction#3': 'error',
    'TestTryFunction#4': 'error',
    'TestTryFunction#5': 'error',
    'TestTryFunction#6': 'error',
    'TestTryFunction#7': 'error',
    'TestTryFunction#8': 'error',
    'TestTryFunction#9': 'error',
    'TestTryFunction#10': 'error',
    'TestTryFunction#11': 'error',
    'TestTypeOfFunction#5': 'mismatch',
    'TestTypeOfFunction#7': 'mismatch',
    'TestTypeOfFunction#10': 'mismatch',
    'TestLambdaExpression#1': 'mismatch',
    'TestLambdaExpression#9': 'error',
    'TestLambdaExpression#10': 'mismatch',
    'TestLambdaExpression#16': 'error',
    'TestLambdaExpression#17': 'error',
    'TestLambdaExpression#18': 'error',
    'TestLambdaExpression#19': 'error',
    'TestLambdaExpression#21': 'error',
    'TestLambdaExpression#22': 'error',
    'TestLambdaExpression#28': 'error',
    'TestLambdaExpression#42': 'error',
}

KNOWN_IDS = set(KNOWN)


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    from facebook_presto_spark.engine import PrestoSparkEngine

    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def test_reference_scalar_assertions(eng):
    cases, _skipped = harvest()
    assert len(cases) >= 2300, "harvest shrank — parser regression?"
    failures: list[str] = []
    fixed: list[str] = []
    B = 40
    for i in range(0, len(cases), B):
        batch = cases[i:i + B]
        sel = ", ".join(f"({e}) AS c{j}" for j, (_, e, _x) in enumerate(batch))
        rows = None
        try:
            rows = eng.sql(f"SELECT {sel}").collect()[0]
        except Exception:
            pass
        results: list[tuple[str, str, bool]] = []
        if rows is not None:
            for j, (cid, e, want) in enumerate(batch):
                results.append((cid, e, match(to_py(rows[j]), want)))
        else:
            for cid, e, want in batch:
                try:
                    got = to_py(
                        eng.sql(f"SELECT ({e}) AS c0").collect()[0][0])
                except Exception:
                    results.append((cid, e, False))
                    continue
                results.append((cid, e, match(got, want)))
        for cid, e, ok in results:
            if ok and cid in KNOWN_IDS:
                fixed.append(cid)
            elif not ok and cid not in KNOWN_IDS:
                failures.append(f"{cid}: {e[:100]}")
    if fixed:
        print(f"note: {len(fixed)} KNOWN entries now pass "
              f"(prune on next sweep): {fixed[:10]}")
    n_pass = len(cases) - len(failures) - (len(KNOWN_IDS) - len(fixed))
    print(f"scalar assertions: {n_pass}/{len(cases)} pass, "
          f"{len(KNOWN_IDS) - len(fixed)} known-divergent")
    assert not failures, (
        f"{len(failures)} NEW scalar divergences:\n" + "\n".join(failures[:30]))
    assert n_pass >= 2080
