"""Dump the KNOWN scalar-assertion residual with engine-vs-reference values.

For each KNOWN id in tests/test_scalar_assertions.py, re-run the case and
print expr / expected / got (or the error class) so residual burn-down can
target real classes instead of guessing.

Usage: python tools/residual_report.py [substr-filter ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from facebook_presto_spark.compat.scalar_assertions import (  # noqa: E402
    harvest,
    match,
    to_py,
)
from test_scalar_assertions import KNOWN  # noqa: E402

from facebook_presto_spark.engine import PrestoSparkEngine  # noqa: E402
from facebook_presto_spark.session import get_spark  # noqa: E402


def main() -> None:
    filters = sys.argv[1:]
    eng = PrestoSparkEngine.for_dir("/root/testdata/sf0.001", spark=get_spark())
    cases = {cid: (e, w) for cid, e, w in harvest()[0]}
    now_pass = []
    for cid in sorted(KNOWN, key=lambda c: (c.split("#")[0], int(c.split("#")[1]))):
        if filters and not any(f in cid for f in filters):
            continue
        if cid not in cases:
            print(f"{cid}: NOT-IN-HARVEST")
            continue
        e, want = cases[cid]
        try:
            got = to_py(eng.sql(f"SELECT ({e}) AS c0").collect()[0][0])
        except Exception as ex:
            msg = str(ex).split("\n")[0][:160]
            print(f"{cid}: ERROR {type(ex).__name__}: {msg}\n    expr: {e[:200]}\n    want: {want!r}")
            continue
        if match(got, want):
            now_pass.append(cid)
            continue
        print(f"{cid}: MISMATCH\n    expr: {e[:200]}\n    want: {want!r}\n    got:  {got!r}")
    if now_pass:
        print(f"\nNOW-PASS ({len(now_pass)}): {now_pass}")


if __name__ == "__main__":
    main()
