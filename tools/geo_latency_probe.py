"""Measure geometry relation-predicate plan-compile + execute latency.

Round-7 probe for the r6 verdict's compile-latency finding: times each
geo_* selfcheck entry end-to-end at a given SF dir and a single-row
predicate compile for the relation family.
"""
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("geo-latency-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from facebook_presto_spark.functions import call
    from facebook_presto_spark.plans import geospatial as g

    # single-row relation predicate compile+run
    one = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "POINT (5 5)")],
        "a string, b string",
    )
    for name in ["ST_Contains", "ST_Intersects", "ST_Equals", "ST_Touches",
                 "ST_Crosses", "ST_Overlaps", "ST_Distance"]:
        t0 = time.time()
        one.select(call(name, F.col("a"), F.col("b")).alias("r")).collect()
        print(f"{name:15s} single-row: {time.time() - t0:7.2f}s", flush=True)

    for qname in ["geo_contains_join", "geo_distance_join", "geo_kdb_join"]:
        fn = g.QUERIES.get(qname)
        if fn is None:
            continue
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        print(f"{qname:20s} end-to-end: {time.time() - t0:7.2f}s rows={n}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
