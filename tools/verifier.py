"""Query-pair verifier — the reference's presto-verifier tier.

The reference replays (control, test) query pairs against two clusters
and compares row multisets with precision-limited numeric equality,
re-running the control on mismatch to rule out nondeterminism
(presto-verifier/src/main/java/com/facebook/presto/verifier/
Validator.java:210-258 validate(), :607-618 resultsMatch(),
:795 precisionCompare(); Verifier.java drives the pair list).

Here the two "clusters" are two executions of the engine (the drop-in
use: does the rewritten query match the original?), or — with
``oracle=True`` — DuckDB as the control, which is the configuration the
rest of the repo's correctness tiers use.

Usage::

    from tools.verifier import QueryPair, verify_pair
    r = verify_pair(engine, QueryPair(control="SELECT ...", test="SELECT ..."))
    r.state        # "MATCH" | "MISMATCH" | "NONDETERMINISTIC" | "INVALID"
    r.comparison   # human-readable diff summary (Validator.getResultsComparison)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

DEFAULT_PRECISION = 5      # significant digits, VerifierConfig default
DEFAULT_MAX_ROWS = 100_000  # Validator maxRowCount guard


@dataclass
class QueryPair:
    control: str
    test: str
    name: str = "pair"


@dataclass
class VerifyResult:
    state: str                     # MATCH / MISMATCH / NONDETERMINISTIC / INVALID
    control_rows: int = 0
    test_rows: int = 0
    comparison: str = ""
    error: str | None = None
    changed: list = field(default_factory=list)

    def valid(self) -> bool:
        return self.state == "MATCH"


def _canon_cell(v, precision: int):
    """Comparable canonical form — mirrors Validator.columnComparator:
    floating values compare on ``precision`` significant digits
    (precisionCompare), integral/other values exactly, nulls first."""
    if v is None:
        return (0,)
    if isinstance(v, bool):
        return (1, "bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "float", "nan")
        if math.isinf(v):
            return (1, "float", "inf" if v > 0 else "-inf")
        if v == 0:
            return (1, "float", 0.0)
        from decimal import Decimal

        exp = math.floor(math.log10(abs(v)))
        q = round(v, precision - 1 - exp)
        return (1, "float", float(Decimal(repr(q))))
    if isinstance(v, (list, tuple)):
        return (1, "list", tuple(_canon_cell(x, precision) for x in v))
    if isinstance(v, dict):
        return (1, "map", tuple(sorted(
            (_canon_cell(k, precision), _canon_cell(x, precision))
            for k, x in v.items()
        )))
    if hasattr(v, "asDict"):  # pyspark Row (struct cell)
        return (1, "list", tuple(_canon_cell(x, precision) for x in v))
    return (1, type(v).__name__, v)


def _multiset(rows, precision: int):
    from collections import Counter

    return Counter(
        tuple(_canon_cell(c, precision) for c in row) for row in rows
    )


def results_match(control_rows, test_rows, precision: int = DEFAULT_PRECISION) -> bool:
    """Validator.resultsMatch: sorted-multiset equality under the
    precision comparator."""
    return _multiset(control_rows, precision) == _multiset(test_rows, precision)


def _comparison_text(control_rows, test_rows, precision: int, limit: int = 100):
    """Validator.getResultsComparison: row counts + up to ``limit``
    REMOVED/ADDED rows."""
    c, t = _multiset(control_rows, precision), _multiset(test_rows, precision)
    removed = list((c - t).elements())[:limit]
    added = list((t - c).elements())[:limit]
    lines = [f"Control {sum(c.values())} rows, Test {sum(t.values())} rows"]
    lines += [f"REMOVED: {r}" for r in removed]
    lines += [f"ADDED: {r}" for r in added]
    return "\n".join(lines), removed + added


def verify_pair(
    engine,
    pair: QueryPair,
    *,
    precision: int = DEFAULT_PRECISION,
    max_rows: int = DEFAULT_MAX_ROWS,
    oracle=None,
) -> VerifyResult:
    """Validator.validate(): control first (failure → INVALID, pair not
    chargeable to the test side), then test, multiset compare, and a
    control re-run on mismatch to detect nondeterminism.

    ``oracle``: optional callable(sql) → rows to run the control side
    elsewhere (e.g. DuckDB); default runs both sides through ``engine``.
    """
    run_control = (lambda sql: oracle(sql)) if oracle else (
        lambda sql: engine.sql(sql).collect()
    )
    try:
        control = run_control(pair.control)
    except Exception as e:  # control failed: query invalid, pair passes
        return VerifyResult(state="INVALID", error=str(e)[:500])
    if len(control) > max_rows:
        return VerifyResult(state="INVALID",
                            error=f"more than {max_rows} rows, failing query")
    try:
        test = engine.sql(pair.test).collect()
    except Exception as e:
        return VerifyResult(state="MISMATCH", control_rows=len(control),
                            error=str(e)[:500],
                            comparison="test side failed to execute")
    if results_match(control, test, precision):
        return VerifyResult(state="MATCH", control_rows=len(control),
                            test_rows=len(test))
    # Validator.checkForDeterministicAndRerunTestQueriesIfNeeded
    try:
        rerun = run_control(pair.control)
    except Exception:
        rerun = None
    if rerun is None or not results_match(control, rerun, precision):
        return VerifyResult(state="NONDETERMINISTIC",
                            control_rows=len(control), test_rows=len(test))
    text, changed = _comparison_text(control, test, precision)
    return VerifyResult(state="MISMATCH", control_rows=len(control),
                        test_rows=len(test), comparison=text, changed=changed)


def main() -> None:
    import argparse
    import sys

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("control")
    ap.add_argument("test")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--precision", type=int, default=DEFAULT_PRECISION)
    args = ap.parse_args()

    from facebook_presto_spark.engine import PrestoSparkEngine

    eng = PrestoSparkEngine.for_dir(args.sf_dir)
    r = verify_pair(eng, QueryPair(control=args.control, test=args.test),
                    precision=args.precision)
    print(r.state)
    if r.comparison:
        print(r.comparison)
    sys.exit(0 if r.valid() else 1)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
