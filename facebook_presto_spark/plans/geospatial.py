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


# even-odd parity AND not-on-boundary: ST_Contains(polygon, point) is
# INTERIOR membership (round 6 — Esri `contains` excludes the boundary),
# so the oracle tests the same point-set
_PIP = """
    (list_sum(list_transform(generate_series(1, len(ring) - 1), i ->
      CASE WHEN ((ring[i][2] > py) <> (ring[i+1][2] > py))
            AND px < ring[i][1] + (ring[i+1][1] - ring[i][1])
                     * (py - ring[i][2]) / (ring[i+1][2] - ring[i][2])
      THEN 1 ELSE 0 END)) % 2 = 1
    AND NOT list_sum(list_transform(generate_series(1, len(ring) - 1), i ->
      CASE WHEN (ring[i+1][1] - ring[i][1]) * (py - ring[i][2])
                 = (ring[i+1][2] - ring[i][2]) * (px - ring[i][1])
            AND px >= least(ring[i][1], ring[i+1][1])
            AND px <= greatest(ring[i][1], ring[i+1][1])
            AND py >= least(ring[i][2], ring[i+1][2])
            AND py <= greatest(ring[i][2], ring[i+1][2])
      THEN 1 ELSE 0 END)) > 0)
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


def _relation_flags_udf():
    """One Arrow scalar UDF computing all four relation flags per point.

    This is the 100-TB plan shape: the pure-Catalyst kernels in
    ``geo_fns`` (exercised directly by tests/test_geo.py) build
    multi-MiB expression trees per predicate, which forced the previous
    version of this query into five separate corpus scans joined at the
    end (one per aggregate branch, to stay under the JVM JIT
    method-size limit) and shipped ~18 MiB task binaries.  Here the same
    segment-orientation math — inclusive/proper segment intersection,
    convex point-in-polygon half-plane tests, parametric half-plane
    clipping (GeoFunctions.java stIntersects/stTouches/stDisjoint/
    stCrosses semantics) — runs vectorized in NumPy behind a single
    ArrowEvalPython boundary: ONE corpus scan, one aggregation, tiny
    task binaries.  The DuckDB oracle reduces each relation to interval
    arithmetic that is provably equivalent for axis-aligned boxes — an
    independent spelling, not a port."""
    import numpy as np
    import pandas as pd

    # fixed center zone, CCW ring
    ZX = np.array([40.0, 60.0, 60.0, 40.0])
    ZY = np.array([40.0, 40.0, 60.0, 60.0])
    # fixed diagonal probe line; the 0.05 offset keeps it off every
    # square corner (grid step 0.1) so all crossings are transversal
    AX, AY, BX, BY = 0.0, 0.05, 100.0, 100.05

    def _cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    def _on_seg(px_, py_, ax, ay, bx, by):
        return (
            (_cross(ax, ay, bx, by, px_, py_) == 0)
            & (np.minimum(ax, bx) <= px_) & (px_ <= np.maximum(ax, bx))
            & (np.minimum(ay, by) <= py_) & (py_ <= np.maximum(ay, by))
        )

    def _seg_proper(ax, ay, bx, by, cx, cy, dx, dy):
        d1 = _cross(cx, cy, dx, dy, ax, ay)
        d2 = _cross(cx, cy, dx, dy, bx, by)
        d3 = _cross(ax, ay, bx, by, cx, cy)
        d4 = _cross(ax, ay, bx, by, dx, dy)
        return (np.sign(d1) * np.sign(d2) < 0) & (np.sign(d3) * np.sign(d4) < 0)

    def _seg_incl(ax, ay, bx, by, cx, cy, dx, dy):
        return (
            _seg_proper(ax, ay, bx, by, cx, cy, dx, dy)
            | _on_seg(ax, ay, cx, cy, dx, dy)
            | _on_seg(bx, by, cx, cy, dx, dy)
            | _on_seg(cx, cy, ax, ay, bx, by)
            | _on_seg(dx, dy, ax, ay, bx, by)
        )

    @F.pandas_udf("i boolean, t boolean, d boolean, x boolean")
    def flags(px, py):
        pxv = px.to_numpy(dtype=np.float64)
        pyv = py.to_numpy(dtype=np.float64)
        n = len(pxv)
        # per-row 2×2 square, CCW ring: (N, 4) vertex arrays
        sx = np.stack([pxv - 1, pxv + 1, pxv + 1, pxv - 1], axis=1)
        sy = np.stack([pyv - 1, pyv - 1, pyv + 1, pyv + 1], axis=1)

        def zone_half(qx, qy, strict):
            # convex CCW half-plane test: inside ⇔ cross ≥ 0 on every edge
            acc = np.ones(np.shape(qx), dtype=bool)
            for k in range(4):
                k2 = (k + 1) % 4
                c = _cross(ZX[k], ZY[k], ZX[k2], ZY[k2], qx, qy)
                acc &= (c > 0) if strict else (c >= 0)
            return acc

        def square_half(qx, qy, strict):
            acc = np.ones(n, dtype=bool)
            for k in range(4):
                k2 = (k + 1) % 4
                c = _cross(sx[:, k], sy[:, k], sx[:, k2], sy[:, k2], qx, qy)
                acc &= (c > 0) if strict else (c >= 0)
            return acc

        # inclusive intersects: vertex-in-or-on either way, or any edge pair
        inter = np.zeros(n, dtype=bool)
        overlap = np.zeros(n, dtype=bool)
        for k in range(4):
            inter |= zone_half(sx[:, k], sy[:, k], strict=False)
            overlap |= zone_half(sx[:, k], sy[:, k], strict=True)
            inter |= square_half(ZX[k], ZY[k], strict=False)
            overlap |= square_half(ZX[k], ZY[k], strict=True)
        for a in range(4):
            a2 = (a + 1) % 4
            e = (sx[:, a], sy[:, a], sx[:, a2], sy[:, a2])
            for b in range(4):
                b2 = (b + 1) % 4
                z = (ZX[b], ZY[b], ZX[b2], ZY[b2])
                inter |= _seg_incl(*e, *z)
                overlap |= _seg_proper(*e, *z)

        # line-crosses-interior: clip the probe segment against the
        # square's CCW half-planes (parametric Liang–Barsky form);
        # non-empty open t-interval ⇔ the line enters the interior
        t_lo = np.zeros(n)
        t_hi = np.ones(n)
        alive = np.ones(n, dtype=bool)
        for k in range(4):
            k2 = (k + 1) % 4
            c0 = _cross(sx[:, k], sy[:, k], sx[:, k2], sy[:, k2], AX, AY)
            c1 = _cross(sx[:, k], sy[:, k], sx[:, k2], sy[:, k2], BX, BY)
            den = c1 - c0
            with np.errstate(divide="ignore", invalid="ignore"):
                tstar = np.where(den != 0, -c0 / np.where(den != 0, den, 1.0), 0.0)
            t_lo = np.where(den > 0, np.maximum(t_lo, tstar), t_lo)
            t_hi = np.where(den < 0, np.minimum(t_hi, tstar), t_hi)
            alive &= ~((den == 0) & (c0 <= 0))
        crossed = alive & (t_lo < t_hi)

        return pd.DataFrame(
            {"i": inter, "t": inter & ~overlap, "d": ~inter, "x": crossed}
        )

    return flags


def geo_relation_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation-predicate coverage (GeoFunctions.java stIntersects /
    stTouches / stDisjoint / stCrosses + greatCircleDistance) over
    synthetic per-customer squares: each customer owns a 2×2 square
    centered on its point; relations are evaluated against a fixed
    center zone and a fixed diagonal line.  Single corpus scan: all
    four flags come from one vectorized Arrow kernel (see
    ``_relation_flags_udf``), then one hash aggregation."""
    cust = _t(spark, sf_dir, "customer")
    px = ((F.col("c_custkey") * 7919) % 1000) / F.lit(1e1)
    py = ((F.col("c_custkey") * 104729) % 1000) / F.lit(1e1)
    gcd = call("great_circle_distance", py - 50, px - 50, F.lit(0.0), F.lit(0.0))
    flags = _relation_flags_udf()
    staged = cust.select(
        "c_nationkey", gcd.alias("gcd"), flags(px, py).alias("f")
    )
    return (
        staged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("f.i"), F.lit(1))).alias("n_intersect"),
            F.count(F.when(F.col("f.t"), F.lit(1))).alias("n_touch"),
            F.count(F.when(F.col("f.d"), F.lit(1))).alias("n_disjoint"),
            F.count(F.when(F.col("f.x"), F.lit(1))).alias("n_cross"),
            F.round(F.avg("gcd"), 2).alias("avg_gcd"),
        )
        .orderBy("c_nationkey")
    )


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


def geo_wkb_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 tail coverage (GeoFunctions.java:136-890): WKB
    serialize/deserialize roundtrip, polygon interior-ring accessors,
    multi-geometry part accessors, envelope corners, ST_LineString
    construction, ST_CoordDim and geometry_invalid_reason — all over
    per-customer synthetic integer-coordinate geometries, so the WKT
    spellings the DuckDB oracle rebuilds by string concat are exact."""
    cust = _t(spark, sf_dir, "customer")
    ix = ((F.col("c_custkey") * 7919) % 100).cast("bigint")
    iy = ((F.col("c_custkey") * 104729) % 100).cast("bigint")
    s = lambda c: c.cast("string")  # noqa: E731
    pt = lambda x, y: F.concat(s(x), F.lit(" "), s(y))  # noqa: E731
    poly = F.concat(
        F.lit("POLYGON (("),
        pt(ix, iy), F.lit(", "), pt(ix + 10, iy), F.lit(", "),
        pt(ix + 10, iy + 10), F.lit(", "), pt(ix, iy + 10), F.lit(", "),
        pt(ix, iy), F.lit("), ("),
        pt(ix + 1, iy + 1), F.lit(", "), pt(ix + 2, iy + 1), F.lit(", "),
        pt(ix + 2, iy + 2), F.lit(", "), pt(ix + 1, iy + 1), F.lit("))"),
    )
    mp = F.concat(
        F.lit("MULTIPOINT ("), pt(ix, iy), F.lit(", "), pt(ix + 5, iy + 5), F.lit(")")
    )
    bowtie = F.concat(
        F.lit("POLYGON (("),
        pt(ix, iy), F.lit(", "), pt(ix + 2, iy + 2), F.lit(", "),
        pt(ix, iy + 2), F.lit(", "), pt(ix + 2, iy), F.lit(", "),
        pt(ix, iy), F.lit("))"),
    )
    line = call(
        "ST_LineString",
        F.array(
            call("ST_Point", ix.cast("double"), iy.cast("double")),
            call("ST_Point", (ix + 1).cast("double"), (iy + 3).cast("double")),
        ),
    )
    env = call("ST_EnvelopeAsPts", poly)
    return cust.select(
        "c_custkey",
        call("ST_GeomFromBinary", call("ST_AsBinary", poly)).alias("rt_poly"),
        call("ST_NumInteriorRing", poly).alias("n_holes"),
        call("ST_InteriorRingN", poly, F.lit(1)).alias("hole1"),
        F.element_at(env, 1).alias("env_lo"),
        F.element_at(env, 2).alias("env_hi"),
        call("ST_NumGeometries", mp).alias("ngeom"),
        call("ST_GeometryN", mp, F.lit(2)).alias("part2"),
        line.alias("line2"),
        call("ST_CoordDim", poly).alias("cdim"),
        call("geometry_invalid_reason", bowtie).alias("invalid_reason"),
    ).orderBy("c_custkey")


GEO_WKB_ROUNDTRIP_SQL = """
WITH g AS (
  SELECT c_custkey,
         (c_custkey * 7919) % 100 AS ix,
         (c_custkey * 104729) % 100 AS iy
  FROM customer
)
SELECT c_custkey,
  'POLYGON ((' || ix || ' ' || iy || ', ' || ix + 10 || ' ' || iy || ', '
    || ix + 10 || ' ' || iy + 10 || ', ' || ix || ' ' || iy + 10 || ', '
    || ix || ' ' || iy || '), (' || ix + 1 || ' ' || iy + 1 || ', '
    || ix + 2 || ' ' || iy + 1 || ', ' || ix + 2 || ' ' || iy + 2 || ', '
    || ix + 1 || ' ' || iy + 1 || '))' AS rt_poly,
  CAST(1 AS BIGINT) AS n_holes,
  'LINESTRING (' || ix + 1 || ' ' || iy + 1 || ', ' || ix + 2 || ' ' || iy + 1
    || ', ' || ix + 2 || ' ' || iy + 2 || ', ' || ix + 1 || ' ' || iy + 1 || ')'
    AS hole1,
  'POINT (' || ix || ' ' || iy || ')' AS env_lo,
  'POINT (' || ix + 10 || ' ' || iy + 10 || ')' AS env_hi,
  CAST(2 AS INT) AS ngeom,
  'POINT (' || ix + 5 || ' ' || iy + 5 || ')' AS part2,
  'LINESTRING (' || ix || ' ' || iy || ', ' || ix + 1 || ' ' || iy + 3 || ')'
    AS line2,
  CAST(2 AS TINYINT) AS cdim,
  'Intersecting or overlapping segments at or near (' || ix || '.0 ' || iy
    || '.0) and (' || ix || '.0 ' || iy + 2 || '.0)' AS invalid_reason
FROM g ORDER BY c_custkey
"""


def geo_spatial_partition_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PARTITIONED spatial join (ExtractSpatialJoins.
    java:578-591 + SpatialPartitioningAggregateFunction): build a
    KdbTree over the build side, assign partition ids to both sides via
    spatial_partitions (probe side expanded by the radius), shuffle on
    the partition id, refine with the exact distance predicate.  Build
    points land in exactly ONE partition (the half-open point rule), so
    no pair dedup is needed.  At 100 TB this replaces the broadcast /
    grid-cell layouts with a data-adaptive partitioning: the KdbTree is
    a tiny broadcast, both sides shuffle once on the leaf id, and skewed
    point clusters split into deeper leaves — same result set as
    geo_distance_join, different (scalable) plan."""
    radius = 1.5
    supp = _points(_t(spark, sf_dir, "supplier"), "s_suppkey", ["s_suppkey"])
    cust = _points(_t(spark, sf_dir, "customer"), "c_custkey", ["c_custkey"])
    s_wkt = call("ST_Point", F.col("px"), F.col("py"))
    # partition count sizes the leaves: too coarse and every leaf becomes
    # a quadratic candidate block (a 10x probe with count=8 measured
    # 30s — leaf occupancy is the knob, exactly like _lsh_bits)
    tree = supp.select(call("spatial_partitioning", s_wkt, 64).alias("kdb"))
    s_parts = (
        supp.crossJoin(F.broadcast(tree))
        .select(
            "s_suppkey", "px", "py",
            F.explode(call("spatial_partitions", F.col("kdb"), s_wkt)).alias("pid"),
        )
    )
    c_wkt = call("ST_Point", F.col("px"), F.col("py"))
    c_parts = (
        cust.crossJoin(F.broadcast(tree))
        .select(
            "c_custkey",
            F.col("px").alias("qx"), F.col("py").alias("qy"),
            F.explode(
                call("spatial_partitions", F.col("kdb"), c_wkt, F.lit(radius))
            ).alias("pid"),
        )
    )
    # post-partition refine is plain codegen'd arithmetic on the numeric
    # point columns (the reference's SpatialJoinOperator also refines on
    # deserialized coordinates, not on the text carrier); the WKT path
    # is exercised by the partitioning functions above and by
    # geo_distance_join
    dist = F.sqrt(
        (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
        + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy"))
    )
    return (
        s_parts.join(c_parts, "pid")
        .select("s_suppkey", "c_custkey", dist.alias("dist"))
        .filter(F.col("dist") <= radius)
    )


def _overlay_metrics_udf():
    """One Arrow kernel computing the overlay family per row: the
    intersection/union/difference/symdifference areas of the customer's
    4×4 square against the fixed [40,60]² center zone, the buffered-
    square area, and the ST_Relate 'T********' interior-intersection
    flag.  Exercises the full geo_kernel WKT→boolean-op→area path
    (GeoFunctions.java ST_Intersection:944 / ST_Union:619 /
    ST_Difference:907 / ST_SymDifference:979 / ST_Buffer:293 /
    ST_Relate:1078) in a SINGLE corpus scan — the buffer is
    translation-invariant so it is computed once per batch, and the
    per-row boolean ops run on 4-8 edge squares (tiny).  The DuckDB
    oracle reduces each area to interval arithmetic, exact for
    axis-aligned boxes."""
    import pandas as pd

    @F.pandas_udf(
        "ia double, ua double, da double, sa double, ba double, rt boolean"
    )
    def metrics(ax, ay):
        from facebook_presto_spark.functions import geo_kernel as gk

        def square_wkt(x0, y0, s):
            x1, y1 = x0 + s, y0 + s
            return (
                f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                f"{x0} {y1}, {x0} {y0}))"
            )

        def area(bag):
            return sum(
                gk.signed_area(r) for poly in bag.polys for r in poly
            )

        zone = gk.parse_wkt(square_wkt(40, 40, 20))
        # buffer is translation-invariant: one kernel run per batch
        buf_area = area(
            gk.buffer_bag(gk.parse_wkt(square_wkt(0, 0, 4)), 0.5)
        )
        ia, ua, da, sa, ba, rt = [], [], [], [], [], []
        for x0, y0 in zip(ax, ay):
            sq = gk.parse_wkt(square_wkt(int(x0), int(y0), 4))
            ia.append(area(gk.intersection(sq, zone)))
            ua.append(area(gk.union(sq, zone)))
            da.append(area(gk.difference(sq, zone)))
            sa.append(area(gk.symdifference(sq, zone)))
            ba.append(buf_area)
            rt.append(gk.relate_match(gk.de9im(sq, zone), "T********"))
        return pd.DataFrame(
            {"ia": ia, "ua": ua, "da": da, "sa": sa, "ba": ba, "rt": rt}
        )

    return metrics


def geo_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlay-family coverage over synthetic per-customer squares vs
    the fixed center zone: per-nation sums of the boolean-op areas,
    buffered area, and interiors-intersect counts.  Single scan, one
    Arrow boundary, one hash aggregation."""
    cust = _t(spark, sf_dir, "customer")
    ax = ((F.col("c_custkey") * 7919) % 90).cast("bigint")
    ay = ((F.col("c_custkey") * 104729) % 90).cast("bigint")
    m = _overlay_metrics_udf()
    staged = cust.select("c_nationkey", m(ax, ay).alias("m"))
    return (
        staged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("m.ia"), 4).alias("inter_area"),
            F.round(F.sum("m.ua"), 4).alias("union_area"),
            F.round(F.sum("m.da"), 4).alias("diff_area"),
            F.round(F.sum("m.sa"), 4).alias("sym_area"),
            F.round(F.avg("m.ba"), 6).alias("avg_buf_area"),
            F.count(F.when(F.col("m.rt"), F.lit(1))).alias("n_interior_overlap"),
        )
        .orderBy("c_nationkey")
    )


GEO_OVERLAY_SQL = """
WITH sq AS (
  SELECT c_nationkey,
         (c_custkey * 7919) % 90 AS ax,
         (c_custkey * 104729) % 90 AS ay
  FROM customer
), m AS (
  SELECT c_nationkey,
         greatest(least(ax + 4, 60) - greatest(ax, 40), 0)
           * greatest(least(ay + 4, 60) - greatest(ay, 40), 0) AS ia,
         (greatest(least(ax + 4, 60) - greatest(ax, 40), 0)
           * greatest(least(ay + 4, 60) - greatest(ay, 40), 0) > 0) AS rt
  FROM sq
)
SELECT c_nationkey, count(*) AS n,
       round(sum(ia), 4) AS inter_area,
       round(sum(416 - ia), 4) AS union_area,
       round(sum(16 - ia), 4) AS diff_area,
       round(sum(416 - 2 * ia), 4) AS sym_area,
       round(avg(16 + 8 + 96 * 0.5 * 0.25 * sin(2 * pi() / 96)), 6) AS avg_buf_area,
       count(*) FILTER (rt) AS n_interior_overlap
FROM m GROUP BY c_nationkey ORDER BY c_nationkey
"""


QUERIES = {
    "geo_contains_join": geo_contains_join,
    "geo_distance_join": geo_distance_join,
    "geo_point_measures": geo_point_measures,
    "geo_bing_tiles": geo_bing_tiles,
    "geo_relation_predicates": geo_relation_predicates,
    "geo_wkb_roundtrip": geo_wkb_roundtrip,
    "geo_overlay": geo_overlay,
    "geo_spatial_partition_join": geo_spatial_partition_join,
}

ORACLE = {
    "geo_wkb_roundtrip": GEO_WKB_ROUNDTRIP_SQL,
    "geo_contains_join": GEO_CONTAINS_JOIN_SQL,
    "geo_distance_join": GEO_DISTANCE_JOIN_SQL,
    "geo_point_measures": GEO_POINT_MEASURES_SQL,
    "geo_bing_tiles": GEO_BING_TILES_SQL,
    "geo_relation_predicates": GEO_RELATION_PREDICATES_SQL,
    "geo_overlay": GEO_OVERLAY_SQL,
    # same point-set result as the grid-cell distance join, via the
    # KdbTree-partitioned plan
    "geo_spatial_partition_join": GEO_DISTANCE_JOIN_SQL,
}
