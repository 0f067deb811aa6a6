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
    # the 193 declared queries are independent; overlapping them through
    # the scheduler (optimization guide §2.6) cuts this smoke from ~4.5
    # minutes to under one.  tpcds entries stay serial: their runner
    # mutates shared module state (view registration memo + CTE persist
    # list).
    from concurrent.futures import ThreadPoolExecutor

    # stateful families run serially: tpcds (module-level view memo +
    # persist list), ddl/connector/source/meta/events (create or write
    # catalog objects and tables)
    stateful = ("tpcds_", "ddl_", "connector_", "source_", "meta_", "events_")
    items = sorted(entry_mod.queries().items())
    par = [(n, f) for n, f in items if not n.startswith(stateful)]
    ser = [(n, f) for n, f in items if n.startswith(stateful)]

    def run(item):
        name, fn = item
        try:
            fn(spark, sf_dir).limit(5).collect()
            return None
        except Exception as e:  # noqa: BLE001
            return (name, str(e)[:200])

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(run, par))
    results += [run(i) for i in ser]
    failures = dict(r for r in results if r)
    assert not failures, failures
