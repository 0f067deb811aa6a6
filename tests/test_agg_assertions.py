"""The reference's aggregation assertion corpus, as a frozen gate.

compat/agg_assertions.py reconstructs every literal
``assertAggregation(fn, expected, blocks…)`` case from the reference's
operator/aggregation tests as a one-aggregate SQL query over VALUES and
replays it here — the §2.3 twin of the §2.2 scalar-assertion rail: the
expected values are the REFERENCE'S OWN (AggregationTestUtils replays
each through single/partial/grouped execution, so they pin merge
semantics too).  66 cases at freeze (array_agg, arbitrary, histogram,
map_agg, multimap_agg, approx_percentile incl. weighted and
array-of-percentile forms), all passing; programmatic sequences
(AbstractTestAggregationFunction subclasses compute expected values in
Java code) and mapBlockOf/checksum-helper inputs are skipped by
construction and counted by the harvester.
"""

from __future__ import annotations

import pytest

from facebook_presto_spark.compat.agg_assertions import harvest_agg
from facebook_presto_spark.compat.scalar_assertions import match, to_py

KNOWN: dict[str, str] = {}

KNOWN_IDS = set(KNOWN)


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    from facebook_presto_spark.engine import PrestoSparkEngine

    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def test_reference_aggregation_assertions(eng):
    cases, _skipped = harvest_agg()
    assert len(cases) >= 60, "harvest shrank — parser regression?"
    failures: list[str] = []
    fixed: list[str] = []
    for cid, sql, want in cases:
        try:
            got = to_py(eng.sql(sql).collect()[0][0])
            ok = match(got, want)
        except Exception:
            ok = False
        if ok and cid in KNOWN_IDS:
            fixed.append(cid)
        elif not ok and cid not in KNOWN_IDS:
            failures.append(f"{cid}: {sql[:100]}")
    if fixed:
        print(f"note: {len(fixed)} KNOWN entries now pass: {fixed}")
    n_pass = len(cases) - len(failures) - (len(KNOWN_IDS) - len(fixed))
    print(f"aggregation assertions: {n_pass}/{len(cases)} pass")
    assert not failures, (
        f"{len(failures)} NEW aggregation divergences:\n"
        + "\n".join(failures[:20]))
