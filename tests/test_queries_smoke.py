"""Smoke: every driver-contract query runs at sf0.001 and the oracle keys
line up.  (Full value verification is tools/selfcheck.py at sf0.01 — the
driver's own gate.)"""

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # every query should either have an oracle or be a documented sketch op
    rows_only = set(q) - set(o)
    # approx_aggs is the single remaining rows-only check: HLL/KLL sketch
    # internals are engine-defined by nature (the reference's own sketches
    # are airlift-specific the same way)
    assert rows_only <= {"approx_aggs"}, rows_only


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_queries_run_sf0001(spark, sf_dir):
    failures = {}
    for name, fn in entry_mod.queries().items():
        try:
            fn(spark, sf_dir).limit(5).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e)[:200]
    assert not failures, failures
