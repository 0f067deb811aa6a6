"""Geospatial queries: the SpatialJoinOperator story + geo function coverage.

Reference: SpatialJoinOperator (presto-main/.../operator/SpatialJoinOperator.
java:40, plan node sql/planner/plan/SpatialJoinNode.java:33, extraction rule
iterative/rule/ExtractSpatialJoins.java) joins via an R-tree built over the
build side (PagesRTreeIndex).  The Spark-first equivalents used here:

- **contains join** — broadcast the (small) polygon side and evaluate the
  codegen'd ST_Contains predicate on the probe stream: exactly the
  reference's build-small/probe-large layout with Catalyst's BNLJ replacing
  the R-tree walk.  At 100 TB the polygon side is still small (dims are);
  nothing shuffles.
- **distance join** — grid-cell blocking: each point maps to a
  ``radius``-sized cell; the left side expands to its 3×3 neighborhood and
  the join is a hash **equi-join on the cell id** followed by an exact
  distance refine.  No cross join, no R-tree: the shuffle is O(rows·9) and
  partitions by cell — the standard distributed spatial-join layout (same
  partition-then-refine idea as the reference's KdbTree spatial
  partitioning, presto-geospatial SpatialPartitioningAggregateFunction).

Coordinates are synthesized deterministically from integer keys (modular
arithmetic — bit-identical in Spark and DuckDB) since the driver's tables
carry no geo columns.  Distances/contains tests then reduce to plain
arithmetic the DuckDB oracle replicates verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from facebook_presto_spark.functions import call
from facebook_presto_spark.plans.tpch import _t

# deterministic synthetic coordinates in a [0, 100)² plane
_X = "((%(key)s * 7919) %% 1000) / 1e1"
_Y = "((%(key)s * 104729) %% 1000) / 1e1"


def _points(df: DataFrame, key: str, id_cols: list[str]) -> DataFrame:
    x = (F.col(key) * 7919) % 1000 / F.lit(1e1)
    y = (F.col(key) * 104729) % 1000 / F.lit(1e1)
    return df.select(*id_cols, x.alias("px"), y.alias("py"))


def geo_contains_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count customers whose synthetic point falls in each of 4 fixed zone
    polygons (one non-rectangular) — broadcast spatial contains-join."""
    zones = spark.createDataFrame(
        [
            ("nw_square", "POLYGON ((0 50, 50 50, 50 100, 0 100, 0 50))"),
            ("se_square", "POLYGON ((50 0, 100 0, 100 50, 50 50, 50 0))"),
            ("center_diamond", "POLYGON ((50 25, 75 50, 50 75, 25 50, 50 25))"),
            ("east_triangle", "POLYGON ((70 0, 100 0, 100 100, 70 0))"),
        ],
        "zone string, wkt string",
    )
    pts = _points(_t(spark, sf_dir, "customer"), "c_custkey", ["c_custkey"])
    pt_wkt = call("ST_Point", F.col("px"), F.col("py"))
    joined = F.broadcast(zones).join(pts, call("ST_Contains", F.col("wkt"), pt_wkt))
    return (
        joined.groupBy("zone")
        .agg(F.count(F.lit(1)).alias("n_points"), F.min("c_custkey").alias("first_key"))
        .orderBy("zone")
    )


_PIP = """
    list_sum(list_transform(generate_series(1, len(ring) - 1), i ->
      CASE WHEN ((ring[i][2] > py) <> (ring[i+1][2] > py))
            AND px < ring[i][1] + (ring[i+1][1] - ring[i][1])
                     * (py - ring[i][2]) / (ring[i+1][2] - ring[i][2])
      THEN 1 ELSE 0 END)) % 2 = 1
"""

GEO_CONTAINS_JOIN_SQL = (
    """
WITH zones AS (
  SELECT * FROM (VALUES
    ('nw_square',      [[0.0,50.0],[50.0,50.0],[50.0,100.0],[0.0,100.0],[0.0,50.0]]),
    ('se_square',      [[50.0,0.0],[100.0,0.0],[100.0,50.0],[50.0,50.0],[50.0,0.0]]),
    ('center_diamond', [[50.0,25.0],[75.0,50.0],[50.0,75.0],[25.0,50.0],[50.0,25.0]]),
    ('east_triangle',  [[70.0,0.0],[100.0,0.0],[100.0,100.0],[70.0,0.0]])
  ) AS z(zone, ring)
), pts AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 1000) / 1e1 AS px,
         ((c_custkey * 104729) % 1000) / 1e1 AS py
  FROM customer
)
SELECT zone, count(*) AS n_points, min(c_custkey) AS first_key
FROM zones JOIN pts ON """
    + _PIP
    + """
GROUP BY zone ORDER BY zone
"""
)


def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier↔customer pairs within euclidean radius 1.5, via grid-cell
    blocking + exact ST_Distance refine (no cross join)."""
    radius = 1.5
    cust = _points(_t(spark, sf_dir, "customer"), "c_custkey", ["c_custkey"])
    supp = _points(_t(spark, sf_dir, "supplier"), "s_suppkey", ["s_suppkey"])
    # supplier side expands to its 3×3 cell neighborhood; customer keeps its
    # own cell → every qualifying pair meets in exactly one cell
    cell = lambda c: F.floor(c / radius)  # noqa: E731
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    supp_cells = (
        supp.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "s_suppkey", "px", "py",
            (cell(F.col("px")) + F.col("dx")).alias("cx"),
            (cell(F.col("py")) + F.col("dy")).alias("cy"),
        )
    )
    cust_cells = cust.select(
        "c_custkey",
        F.col("px").alias("qx"), F.col("py").alias("qy"),
        cell(F.col("px")).alias("cx"), cell(F.col("py")).alias("cy"),
    )
    dist = call(
        "ST_Distance",
        call("ST_Point", F.col("px"), F.col("py")),
        call("ST_Point", F.col("qx"), F.col("qy")),
    )
    return (
        supp_cells.join(cust_cells, ["cx", "cy"])
        .select("s_suppkey", "c_custkey", dist.alias("dist"))
        .filter(F.col("dist") <= radius)
    )


GEO_DISTANCE_JOIN_SQL = """
WITH supp AS (
  SELECT s_suppkey,
         ((s_suppkey * 7919) % 1000) / 1e1 AS px,
         ((s_suppkey * 104729) % 1000) / 1e1 AS py
  FROM supplier
), cust AS (
  SELECT c_custkey,
         ((c_custkey * 7919) % 1000) / 1e1 AS qx,
         ((c_custkey * 104729) % 1000) / 1e1 AS qy
  FROM customer
)
SELECT s_suppkey, c_custkey,
       sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)) AS dist
FROM supp JOIN cust
  ON sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)) <= 1.5
"""


def geo_point_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation point statistics through the ST_ accessors: count, bbox,
    and mean distance to the plane center (50, 50)."""
    cust = _t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_nationkey",
        call(
            "ST_Point",
            ((F.col("c_custkey") * 7919) % 1000 / F.lit(1e1)),
            ((F.col("c_custkey") * 104729) % 1000 / F.lit(1e1)),
        ).alias("pt"),
    )
    center = call("ST_Point", F.lit(50.0), F.lit(50.0))
    return (
        pts.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(call("ST_X", F.col("pt"))).alias("xmin"),
            F.max(call("ST_X", F.col("pt"))).alias("xmax"),
            F.min(call("ST_Y", F.col("pt"))).alias("ymin"),
            F.max(call("ST_Y", F.col("pt"))).alias("ymax"),
            F.round(F.avg(call("ST_Distance", F.col("pt"), center)), 6).alias("avg_dist"),
        )
        .orderBy("c_nationkey")
    )


GEO_POINT_MEASURES_SQL = """
WITH pts AS (
  SELECT c_nationkey,
         ((c_custkey * 7919) % 1000) / 1e1 AS px,
         ((c_custkey * 104729) % 1000) / 1e1 AS py
  FROM customer
)
SELECT c_nationkey, count(*) AS n,
       min(px) AS xmin, max(px) AS xmax, min(py) AS ymin, max(py) AS ymax,
       round(avg(sqrt((px - 50.0) * (px - 50.0) + (py - 50.0) * (py - 50.0))), 6) AS avg_dist
FROM pts GROUP BY c_nationkey ORDER BY c_nationkey
"""


def geo_bing_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed into zoom-5 Bing tiles from synthetic lat/lng;
    per-tile count + quadkey (BingTileFunctions.java semantics)."""
    cust = _t(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 104729) % 1600) / F.lit(1e1) - 80.0
    lng = ((F.col("c_custkey") * 7919) % 3600) / F.lit(1e1) - 180.0
    tile = call("bing_tile_at", lat, lng, 5)
    tiled = cust.select(
        tile["x"].alias("tile_x"),
        tile["y"].alias("tile_y"),
        call("bing_tile_quadkey", tile).alias("quadkey"),
    )
    return (
        tiled.groupBy("tile_x", "tile_y", "quadkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy("tile_x", "tile_y")
    )


GEO_BING_TILES_SQL = """
WITH geo AS (
  SELECT ((c_custkey * 104729) % 1600) / 1e1 - 80.0 AS lat,
         ((c_custkey * 7919) % 3600) / 1e1 - 180.0 AS lng
  FROM customer
), tiles AS (
  SELECT CAST(least(greatest(floor((lng + 180.0) / 360.0 * 32), 0), 31) AS INT) AS tile_x,
         CAST(least(greatest(floor(
             (0.5 - ln((1 + sin(radians(least(greatest(lat, -85.05112878), 85.05112878)))) /
                       (1 - sin(radians(least(greatest(lat, -85.05112878), 85.05112878)))))
              / (4 * pi())) * 32), 0), 31) AS INT) AS tile_y
  FROM geo
)
SELECT tile_x, tile_y,
       array_to_string(list_transform(generate_series(5, 1, -1),
         i -> CAST(((tile_x >> (i - 1)) & 1) + 2 * ((tile_y >> (i - 1)) & 1) AS VARCHAR)), '') AS quadkey,
       count(*) AS n
FROM tiles
GROUP BY tile_x, tile_y HAVING count(*) >= 2
ORDER BY tile_x, tile_y
"""


def geo_relation_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-predicate coverage (GeoFunctions.java stIntersects /
    stTouches / stDisjoint / stCrosses + greatCircleDistance) over
    synthetic per-customer squares: each customer owns a 2×2 square
    centered on its point; relations are evaluated against a fixed
    center zone and a fixed diagonal line.  The geometry kernel runs the
    general segment-orientation tests; the DuckDB oracle reduces each
    relation to the interval arithmetic that is provably equivalent for
    axis-aligned boxes — an independent spelling, not a port."""
    cust = _t(spark, sf_dir, "customer")
    px = ((F.col("c_custkey") * 7919) % 1000) / F.lit(1e1)
    py = ((F.col("c_custkey") * 104729) % 1000) / F.lit(1e1)
    num = lambda c: c.cast("string")  # noqa: E731
    pt = lambda x, y: F.concat(num(x), F.lit(" "), num(y))  # noqa: E731
    sq = F.concat(
        F.lit("POLYGON (("),
        pt(px - 1, py - 1), F.lit(", "), pt(px + 1, py - 1), F.lit(", "),
        pt(px + 1, py + 1), F.lit(", "), pt(px - 1, py + 1), F.lit(", "),
        pt(px - 1, py - 1), F.lit("))"),
    )
    zone = F.lit("POLYGON ((40 40, 60 40, 60 60, 40 60, 40 40))")
    # offset keeps the line off every square corner (grid step is 0.1),
    # so all boundary crossings are transversal
    diag = F.lit("LINESTRING (0 0.05, 100 100.05)")
    gcd = call("great_circle_distance", py - 50, px - 50, F.lit(0.0), F.lit(0.0))
    # Build each geometry kernel's Column tree ONCE and derive the other
    # relations from it (disjoint = ¬intersects; touches = intersects ∧
    # ¬interiors-overlap): the trees are thousands of py4j constructions,
    # so naive per-predicate calls spend 15s+ of pure driver time.  Each
    # flag then aggregates in its own branch — one projection holding
    # every kernel exceeds the JIT method-size limit and drops the whole
    # stage to interpreted eval (measured 15s vs 3s split).
    from facebook_presto_spark.functions import geo_fns as G

    inter = G.st_intersects(sq, zone)
    overlap = G._interiors_overlap(
        sq, zone, G._coords(sq), G._coords(zone), G._typ(sq), G._typ(zone)
    )
    cross = G.st_crosses(diag, sq)
    branches = [
        cust.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(gcd), 2).alias("avg_gcd"),
        )
    ]
    for alias, flag in [
        ("n_intersect", inter),
        ("n_touch", inter & ~overlap),
        ("n_disjoint", ~inter),
        ("n_cross", cross),
    ]:
        branches.append(
            cust.groupBy("c_nationkey").agg(
                F.count(F.when(flag, F.lit(1))).alias(alias)
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.join(b, "c_nationkey")
    return out.select(
        "c_nationkey", "n", "n_intersect", "n_touch", "n_disjoint",
        "n_cross", "avg_gcd",
    ).orderBy("c_nationkey")


GEO_RELATION_PREDICATES_SQL = """
WITH pts AS (
  SELECT c_nationkey,
         ((c_custkey * 7919) % 1000) / 1e1 AS px,
         ((c_custkey * 104729) % 1000) / 1e1 AS py
  FROM customer
), flags AS (
  SELECT c_nationkey,
         (px + 1 >= 40 AND px - 1 <= 60 AND py + 1 >= 40 AND py - 1 <= 60) AS i,
         (px + 1 >= 40 AND px - 1 <= 60 AND py + 1 >= 40 AND py - 1 <= 60)
           AND NOT (px + 1 > 40 AND px - 1 < 60 AND py + 1 > 40 AND py - 1 < 60) AS t,
         NOT (px + 1 >= 40 AND px - 1 <= 60 AND py + 1 >= 40 AND py - 1 <= 60) AS d,
         (py - px > -1.95 AND py - px < 2.05) AS x,
         atan2(
           sqrt(pow(cos(radians(0.0)) * sin(radians(px - 50) - radians(0.0)), 2)
              + pow(cos(radians(py - 50)) * sin(radians(0.0))
                  - sin(radians(py - 50)) * cos(radians(0.0))
                    * cos(radians(px - 50) - radians(0.0)), 2)),
           sin(radians(py - 50)) * sin(radians(0.0))
             + cos(radians(py - 50)) * cos(radians(0.0))
               * cos(radians(px - 50) - radians(0.0))
         ) * 6371.01 AS gcd
  FROM pts
)
SELECT c_nationkey, count(*) AS n,
       count(*) FILTER (i) AS n_intersect,
       count(*) FILTER (t) AS n_touch,
       count(*) FILTER (d) AS n_disjoint,
       count(*) FILTER (x) AS n_cross,
       round(avg(gcd), 2) AS avg_gcd
FROM flags GROUP BY c_nationkey ORDER BY c_nationkey
"""


QUERIES = {
    "geo_contains_join": geo_contains_join,
    "geo_distance_join": geo_distance_join,
    "geo_point_measures": geo_point_measures,
    "geo_bing_tiles": geo_bing_tiles,
    "geo_relation_predicates": geo_relation_predicates,
}

ORACLE = {
    "geo_contains_join": GEO_CONTAINS_JOIN_SQL,
    "geo_distance_join": GEO_DISTANCE_JOIN_SQL,
    "geo_point_measures": GEO_POINT_MEASURES_SQL,
    "geo_bing_tiles": GEO_BING_TILES_SQL,
    "geo_relation_predicates": GEO_RELATION_PREDICATES_SQL,
}
