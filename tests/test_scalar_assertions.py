"""The reference's own scalar assertion corpus, as a frozen gate.

compat/scalar_assertions.py harvests every assertFunction case with an
interpretable expected literal from the reference's operator/type test
sources (~2,320 of ~3,400 calls across 23 files; calls inside
try{...fail()} blocks are expected-to-throw and excluded) and this test
replays them through engine.sql.  Unlike the DuckDB differential, the
expected values here are the REFERENCE'S OWN — they catch divergences
both engines share (round-10 finds: integer `/` semantics, LIKE escape
rules, chr() beyond ASCII; round-11 closed the regexp lambda
replacement, literal IEEE division, JSON→typed coercion casts, array/
map three-valued comparison, CHAR(n) comparison, and `||` append/
prepend classes — 222 → 17 residual cases).

KNOWN holds the reviewed residual (17 of ~2,317), each annotated in
place; the structural holds are the zone-typed timestamp carrier, the
reference test session's Pacific/Kiritimati zone, test-local helpers,
float32 value widening, Spark's nested-cast/ordering matrix for exotic
map shapes, and the two documented type-invisible `/` and
group-participation corners.
"""

from __future__ import annotations

import pytest

from facebook_presto_spark.compat.scalar_assertions import (
    harvest,
    match,
    to_py,
)

KNOWN = {
    # array_intersect over row elements with an untyped NULL field —
    # Spark cannot unify struct<int, void> with struct<int, string>
    'TestArrayOperators#483': 'error',
    # TIMESTAMP '... <zone>' literals — zone-typed carrier hold
    'TestArrayOperators#507': 'error',
    'TestArrayOperators#508': 'error',
    # lexicographic < over mixed-precision DECIMAL arrays — Spark's
    # array ordering rejects the operand pair; a double rewrite would
    # lose digits 17+ of the 20-digit literals
    'TestArrayOperators#603': 'error',
    # current_timezone(): the reference test session pins
    # Pacific/Kiritimati; this engine runs UTC sessions
    'TestArrayTransformFunction#9': 'mismatch',
    'TestLambdaExpression#10': 'mismatch',
    # concat(ARRAY[1], x) with a lambda-variable element — element-
    # variant dispatch needs the variable's type, invisible to SQL
    'TestArrayTransformFunction#10': 'error',
    # unchecked_to_json / vl(): helpers that exist only inside the
    # reference's test class
    'TestMapOperators#80': 'error',
    'TestStringFunctions#444': 'error',
    'TestStringFunctions#445': 'error',
    'TestStringFunctions#446': 'error',
    # nested-map VALUE coercion (map<double,bool> -> map<bigint,bigint>
    # inside a map cast) — Spark's nested cast matrix rejects bool ->
    # bigint inside maps
    'TestMapOperators#267': 'error',
    # CAST(MAP ... AS MAP(bigint, varchar)) renders timestamps without
    # the reference's millisecond suffix (element-level presto-cast
    # semantics are invisible inside a runtime map)
    'TestMapOperators#269': 'mismatch',
    # REAL (float32) value widening: 1.23456f as double is
    # 1.2345600128... — the Python layer erases the 32-bit type
    'TestMapOperators#270': 'mismatch',
    # map keys that are themselves maps — Spark forbids map-typed keys
    'TestMapOperators#303': 'error',
    # integer '/' inside a lambda (v1/v2) — the documented int-division
    # hold (non-literal operands)
    'TestMapZipWithFunction#7': 'mismatch',
    # regexp_extract group that matched but did not participate —
    # Spark's builtin renders '' and participation is invisible to SQL
    'TestRegexpFunctions#74': 'mismatch',
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
    # keep the known-to-error cases OUT of the batches: one erroring
    # expression fails its whole 40-wide SELECT and forced a 40-query
    # per-case fallback around every such case (~14 of them) — they run
    # in their own all-known batches at the end instead, where the
    # fallback is the expected path
    known_err = [c for c in cases if KNOWN.get(c[0]) == "error"]
    cases = [c for c in cases if KNOWN.get(c[0]) != "error"] + known_err
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
    assert n_pass >= 2290
