"""Benchmark harness — prints ONE JSON line for the driver.

Protocol (BASELINE.md): per query, 2 prewarm + 6 measured runs, median
seconds, over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Headline set: the 22 adapted TPC-H queries
plus the heavyweight pipeline operators (LSH dedup, cosine top-k,
session windows) so the scale-path ops are measured, not just claimed.

Usage: python bench.py [--queries name1,name2] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [f"tpch_q{i:02d}" for i in range(1, 23)] + [
    # scale-path pipeline operators
    "dedup_minhash_lsh",
    "dedup_exact",
    "similarity_cosine_topk",
    "similarity_ann_ivf",
    "stream_session_1h",
    "text_quality_score",
    "multimodal_decode_features",
    "agg_hll_sketch",
    # the SQL front-end path (translation overhead must stay negligible)
    "prestosql_q06",
    # TPC-DS rung (round 9): the plan shapes TPC-H lacks — deep CTEs,
    # ROLLUP + windowed rank, LAG over self-joins (data staged by the
    # first prewarm run via plans.tpcds.stage_dir, outside the timing)
    "tpcds_q01",
    "tpcds_q36",
    "tpcds_q47",
    "tpcds_q57",
    "tpcds_q67",
    "tpcds_q95",
    # round 10: INTERSECT-heavy, multi-CTE double-agg, anti-join-heavy
    "tpcds_q14_1",
    "tpcds_q23_1",
    "tpcds_q78",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--prewarm", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from facebook_presto_spark.session import get_spark

    spark = get_spark("bench")
    queries = entry_mod.queries()
    names = args.queries.split(",") if args.queries else HEADLINE
    names = [n for n in names if n in queries]

    # JVM/codegen warmup on an unrelated plan
    queries["tpch_q06"](spark, SF_DIR).collect()

    load_before = os.getloadavg()[0]
    per_query: dict[str, float] = {}
    spread_pct: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        for _ in range(args.prewarm):
            fn(spark, SF_DIR).collect()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            times.append(time.perf_counter() - t0)
            assert rows is not None
        med = statistics.median(times)
        per_query[name] = round(med, 4)
        spread_pct[name] = round(100.0 * (max(times) - min(times)) / med, 1)
    load_after = os.getloadavg()[0]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    worst = max(spread_pct, key=spread_pct.get) if spread_pct else None
    # the round-8 headline set, frozen: cross-round trend lines compare
    # THIS subtotal (the headline set is append-only, so the full total
    # grows whenever a new rung joins — r9 added ~16s of TPC-DS)
    legacy = [n for n in per_query if not n.startswith("tpcds_")]
    out = {
        "metric": "median_sec_per_query_total",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "legacy_subtotal_sec": round(
            sum(per_query[n] for n in legacy), 4),
        "legacy_set": "all-non-tpcds (r8 headline set)",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # ambient-noise accounting (SCALE.md accept/reject rule):
        # reject the measurement if the machine was already loaded when
        # the run started (loadavg_before > cpus/2) or any query's
        # max-min run spread exceeded 50% of its median
        "noise": {
            "loadavg_before": round(load_before, 2),
            "loadavg_after": round(load_after, 2),
            "cpus": os.cpu_count(),
            "worst_spread_query": worst,
            "worst_spread_pct": spread_pct.get(worst, 0.0),
            "spread_pct": spread_pct,
            "suspect": bool(
                load_before > (os.cpu_count() or 1) / 2
                or (spread_pct and spread_pct[worst] > 50.0)
            ),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
