"""Build the sf10 spot-rung: natural TPC-H data at 100× the bench scale.

Round-6 verdict item #6: `tpch_q03/q12/q13/q15` sat at 2.3-2.5× on the
sf1 rung (10× data) — this rung (60M lineitem rows, ~100× bench data)
checks whether those ratios flatten once the working set outgrows the
page cache, or keep compounding.  Only the TPC-H tables are generated
(the six spot queries touch customer/orders/lineitem/supplier/part);
same projections/types as tools/sf1_build.py so the HEADLINE query
callables run unchanged.

Usage: python tools/sf10_build.py      # writes /tmp/fps_sf10 once
Then:  SPARK_GRAFT_SF_DIR=/tmp/fps_sf10 python bench.py \
           --queries tpch_q01,tpch_q03,tpch_q06,tpch_q12,tpch_q13,tpch_q15
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DST = "/tmp/fps_sf10"

from sf1_build import PROJECTIONS  # same driver column set  # noqa: E402


def main() -> None:
    import duckdb

    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    print("dbgen sf=10 ...")
    con.execute("CALL dbgen(sf=10)")
    for table, proj in PROJECTIONS.items():
        out = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {proj} FROM {table}) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        print(f"{table}: {n} rows")
    open(os.path.join(DST, "_DONE"), "w").close()
    print(f"built {DST}")


if __name__ == "__main__":
    main()
