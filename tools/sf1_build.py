"""Build the sf1 rung: natural TPC-H data at 10× the bench scale.

DuckDB's dbgen generates true TPC-H distributions at sf=1 (~6M
lineitem); the export projects down to the driver's synthetic column
set (TESTDATA.md) with matching logical types (DECIMAL→DOUBLE,
DATE→TIMESTAMP) so every HEADLINE query runs unchanged.  The pipeline
tables (documents/embeddings/events) come from the 10× replicated set
`tools/scale_probe.py` builds — dbgen has no document corpus.

Usage: python tools/sf1_build.py   # writes /tmp/fps_sf1 once
Then:  SPARK_GRAFT_SF_DIR=/tmp/fps_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

DST = "/tmp/fps_sf1"
SCALE10 = "/tmp/fps_scale10"

# driver column set per table (TESTDATA.md schemas at sf0.1)
PROJECTIONS = {
    "region": "r_regionkey::INT AS r_regionkey, r_name",
    "nation": (
        "n_nationkey::INT AS n_nationkey, n_name, "
        "n_regionkey::INT AS n_regionkey"
    ),
    "customer": (
        "c_custkey, c_name, c_nationkey::INT AS c_nationkey, "
        "c_acctbal::DOUBLE AS c_acctbal, c_mktsegment"
    ),
    "supplier": (
        "s_suppkey, s_name, s_nationkey::INT AS s_nationkey, "
        "s_acctbal::DOUBLE AS s_acctbal"
    ),
    "part": (
        "p_partkey, p_name, p_brand, p_type, p_size::INT AS p_size, "
        "p_retailprice::DOUBLE AS p_retailprice"
    ),
    "orders": (
        "o_orderkey, o_custkey, o_orderstatus, "
        "o_totalprice::DOUBLE AS o_totalprice, "
        "o_orderdate::TIMESTAMP AS o_orderdate, o_orderpriority"
    ),
    "lineitem": (
        "l_orderkey, l_partkey, l_suppkey, l_linenumber::INT AS l_linenumber, "
        "l_quantity::DOUBLE AS l_quantity, "
        "l_extendedprice::DOUBLE AS l_extendedprice, "
        "l_discount::DOUBLE AS l_discount, l_tax::DOUBLE AS l_tax, "
        "l_returnflag, l_linestatus, l_shipdate::TIMESTAMP AS l_shipdate"
    ),
}


def main() -> None:
    import duckdb

    if os.path.exists(os.path.join(DST, "_DONE")):
        print(f"{DST} already built")
        return
    if not os.path.exists(os.path.join(SCALE10, "_DONE")):
        print("build the 10x replica first: python tools/scale_probe.py")
        sys.exit(1)
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    print("dbgen sf=1 ...")
    con.execute("CALL dbgen(sf=1)")
    for table, proj in PROJECTIONS.items():
        out = f"{DST}/{table}.parquet"
        con.execute(
            f"COPY (SELECT {proj} FROM {table}) TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        print(f"{table}: {n} rows")
    for t in ("documents", "embeddings", "events"):
        src = f"{SCALE10}/{t}.parquet"
        dst = f"{DST}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
        print(f"{t}: copied from scale10")
    open(os.path.join(DST, "_DONE"), "w").close()
    print(f"built {DST}")


if __name__ == "__main__":
    main()
