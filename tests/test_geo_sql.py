"""SQL-path parity for the geospatial library (functions/geo_sql.py).

The reference resolves geo functions through the same FunctionRegistry
as every other function, so ``SELECT ST_Area(geom) FROM t`` is plain
SQL.  geo_sql.py registers the scalar surface under the reference names
for engine.sql; THIS suite is the drift gate the module docstring
promises: every registered name runs through BOTH paths — the Column
builder (functions/geo_fns.py via call()) and the SQL text through
engine.sql — over a geometry battery, requiring EXACT equality.
"""

import math

import pytest
from pyspark.sql import functions as F

from facebook_presto_spark.engine import PrestoSparkEngine
from facebook_presto_spark.functions import call

# battery: one row per geometry; g2 pairs it with a second geometry
BATTERY = [
    # (g1, g2)
    ("POINT (1 2.5)", "POINT (3 4)"),
    ("POINT (-3 -7.25)", "POINT (-3 -7.25)"),
    ("LINESTRING (0 0, 4 0, 4 4)", "LINESTRING (2 -1, 2 5)"),
    ("LINESTRING (0 0, 1 0, 1 1, 0 0)", "POINT (0.5 0.25)"),
    ("POLYGON ((0 0, 4 0, 5 3, 2 5, -1 3, 0 0))", "POINT (2 2)"),
    ("POLYGON ((0 0, 3 0, 3 1, 1 1, 1 3, 0 3, 0 0))",
     "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"),
    ("POLYGON ((0 0, 8 0, 0 8, 0 0), (1 1, 1 5, 5 1, 1 1))",
     "POINT (3 3)"),
    ("MULTIPOINT (1 2, 3 4, 5 6)", "POINT (3 4)"),
    ("MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))", "LINESTRING (3 0, 3 5)"),
    ("MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))",
     "POINT (1.5 1.5)"),
    ("GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))",
     "LINESTRING (3 4, 5 4)"),
    ("LINESTRING EMPTY", "POINT EMPTY"),
    ("POLYGON EMPTY", "POINT (1 1)"),
    # >7-significant-digit coordinates in Java's scientific bands
    # ([1e7, 1e16) and [1e-4, 1e-3)) — Web-Mercator-scale values whose
    # Double.toString is scientific with a long mantissa, pinning the
    # SQL path's _jdtoa against Spark's double→string cast
    ("LINESTRING (20037508.342789244 -20037508.342789244, "
     "12345678.9 87654321.125)",
     "POINT (20037508.342789244 0.00012345)"),
    ("POLYGON ((10000000.5 10000000.5, 30000000.25 10000000.5, "
     "30000000.25 30000000.75, 10000000.5 30000000.75, "
     "10000000.5 10000000.5))",
     "POINT (0.00056789012 0.0009999999999)"),
]

LINES = [g for g, _ in BATTERY if g.startswith(("LINESTRING", "MULTILINE"))]
POLYS = [g for g, _ in BATTERY if g.startswith(("POLYGON", "MULTIPOLY"))]

# name → (column builder over row columns, SQL expression text, battery)
# battery: "any" = full battery on (g1, g2); "line"/"poly" = g1 subsets
CASES = {
    "ST_AsText": (lambda: call("ST_AsText", F.col("g1")),
                  "ST_AsText(g1)", "any"),
    "ST_GeometryFromText": (
        lambda: call("ST_GeometryFromText", F.col("g1")),
        "ST_GeometryFromText(g1)", "any"),
    "ST_GeometryType": (lambda: call("ST_GeometryType", F.col("g1")),
                        "ST_GeometryType(g1)", "any"),
    "ST_X": (lambda: call("ST_X", F.col("g1")), "ST_X(g1)", "any"),
    "ST_Y": (lambda: call("ST_Y", F.col("g1")), "ST_Y(g1)", "any"),
    "ST_XMin": (lambda: call("ST_XMin", F.col("g1")), "ST_XMin(g1)", "any"),
    "ST_XMax": (lambda: call("ST_XMax", F.col("g1")), "ST_XMax(g1)", "any"),
    "ST_YMin": (lambda: call("ST_YMin", F.col("g1")), "ST_YMin(g1)", "any"),
    "ST_YMax": (lambda: call("ST_YMax", F.col("g1")), "ST_YMax(g1)", "any"),
    "ST_NumPoints": (lambda: call("ST_NumPoints", F.col("g1")),
                     "ST_NumPoints(g1)", "any"),
    "ST_IsClosed": (lambda: call("ST_IsClosed", F.col("g1")),
                    "ST_IsClosed(g1)", "any"),
    "ST_IsEmpty": (lambda: call("ST_IsEmpty", F.col("g1")),
                   "ST_IsEmpty(g1)", "any"),
    "ST_IsSimple": (lambda: call("ST_IsSimple", F.col("g1")),
                    "ST_IsSimple(g1)", "any"),
    "ST_IsValid": (lambda: call("ST_IsValid", F.col("g1")),
                   "ST_IsValid(g1)", "any"),
    "ST_Dimension": (lambda: call("ST_Dimension", F.col("g1")),
                     "ST_Dimension(g1)", "any"),
    "ST_CoordDim": (lambda: call("ST_CoordDim", F.col("g1")),
                    "ST_CoordDim(g1)", "any"),
    "ST_CoordinateDimension": (
        lambda: call("ST_CoordinateDimension", F.col("g1")),
        "ST_CoordinateDimension(g1)", "any"),
    "ST_Envelope": (lambda: call("ST_Envelope", F.col("g1")),
                    "ST_Envelope(g1)", "any"),
    "ST_EnvelopeAsPts": (lambda: call("ST_EnvelopeAsPts", F.col("g1")),
                         "ST_EnvelopeAsPts(g1)", "any"),
    "ST_Boundary": (lambda: call("ST_Boundary", F.col("g1")),
                    "ST_Boundary(g1)", "any"),
    "ST_Centroid": (lambda: call("ST_Centroid", F.col("g1")),
                    "ST_Centroid(g1)", "any"),
    "ST_StartPoint": (lambda: call("ST_StartPoint", F.col("g1")),
                      "ST_StartPoint(g1)", "any"),
    "ST_EndPoint": (lambda: call("ST_EndPoint", F.col("g1")),
                    "ST_EndPoint(g1)", "any"),
    "ST_PointN": (lambda: call("ST_PointN", F.col("g1"), F.lit(2)),
                  "ST_PointN(g1, 2)", "any"),
    "ST_IsRing": (lambda: call("ST_IsRing", F.col("g1")),
                  "ST_IsRing(g1)", "any"),
    "ST_NumGeometries": (lambda: call("ST_NumGeometries", F.col("g1")),
                         "ST_NumGeometries(g1)", "any"),
    "ST_Geometries": (lambda: call("ST_Geometries", F.col("g1")),
                      "ST_Geometries(g1)", "any"),
    "ST_GeometryN": (lambda: call("ST_GeometryN", F.col("g1"), F.lit(2)),
                     "ST_GeometryN(g1, 2)", "any"),
    "geometry_invalid_reason": (
        lambda: call("geometry_invalid_reason", F.col("g1")),
        "geometry_invalid_reason(g1)", "any"),
    "ST_AsBinary": (lambda: call("ST_AsBinary", F.col("g1")),
                    "ST_AsBinary(g1)", "any"),
    "ST_Area": (lambda: call("ST_Area", F.col("g1")), "ST_Area(g1)", "any"),
    "ST_Distance": (lambda: call("ST_Distance", F.col("g1"), F.col("g2")),
                    "ST_Distance(g1, g2)", "any"),
    "ST_Contains": (lambda: call("ST_Contains", F.col("g1"), F.col("g2")),
                    "ST_Contains(g1, g2)", "any"),
    "ST_Within": (lambda: call("ST_Within", F.col("g2"), F.col("g1")),
                  "ST_Within(g2, g1)", "any"),
    "ST_Intersects": (
        lambda: call("ST_Intersects", F.col("g1"), F.col("g2")),
        "ST_Intersects(g1, g2)", "any"),
    "ST_Disjoint": (lambda: call("ST_Disjoint", F.col("g1"), F.col("g2")),
                    "ST_Disjoint(g1, g2)", "any"),
    "ST_Touches": (lambda: call("ST_Touches", F.col("g1"), F.col("g2")),
                   "ST_Touches(g1, g2)", "any"),
    "ST_Crosses": (lambda: call("ST_Crosses", F.col("g1"), F.col("g2")),
                   "ST_Crosses(g1, g2)", "any"),
    "ST_Overlaps": (lambda: call("ST_Overlaps", F.col("g1"), F.col("g2")),
                    "ST_Overlaps(g1, g2)", "any"),
    "ST_Equals": (lambda: call("ST_Equals", F.col("g1"), F.col("g2")),
                  "ST_Equals(g1, g2)", "any"),
    "ST_Relate": (
        lambda: call("ST_Relate", F.col("g1"), F.col("g2"),
                     F.lit("T********")),
        "ST_Relate(g1, g2, 'T********')", "any"),
    "ST_Union": (lambda: call("ST_Union", F.col("g1"), F.col("g2")),
                 "ST_Union(g1, g2)", "any"),
    "ST_Intersection": (
        lambda: call("ST_Intersection", F.col("g1"), F.col("g2")),
        "ST_Intersection(g1, g2)", "any"),
    "ST_Difference": (
        lambda: call("ST_Difference", F.col("g1"), F.col("g2")),
        "ST_Difference(g1, g2)", "any"),
    "ST_SymDifference": (
        lambda: call("ST_SymDifference", F.col("g1"), F.col("g2")),
        "ST_SymDifference(g1, g2)", "any"),
    "ST_ConvexHull": (lambda: call("ST_ConvexHull", F.col("g1")),
                      "ST_ConvexHull(g1)", "any"),
    "ST_Buffer": (lambda: call("ST_Buffer", F.col("g1"), F.lit(0.5)),
                  "ST_Buffer(g1, 0.5)", "any"),
    "simplify_geometry": (
        lambda: call("simplify_geometry", F.col("g1"), F.lit(0.1)),
        "simplify_geometry(g1, 0.1)", "any"),
    "geometry_to_bing_tiles": (
        lambda: call("geometry_to_bing_tiles", F.col("g2"), F.lit(10)),
        "geometry_to_bing_tiles(g2, 10)", "any"),
    # line-only (raise on other types)
    "ST_Length": (lambda: call("ST_Length", F.col("g1")),
                  "ST_Length(g1)", "line"),
    "line_locate_point": (
        lambda: call("line_locate_point", F.col("g1"),
                     F.lit("POINT (2 1)")),
        "line_locate_point(g1, 'POINT (2 1)')", "line"),
    # polygon-only
    "ST_ExteriorRing": (lambda: call("ST_ExteriorRing", F.col("g1")),
                        "ST_ExteriorRing(g1)", "poly"),
    "ST_NumInteriorRing": (
        lambda: call("ST_NumInteriorRing", F.col("g1")),
        "ST_NumInteriorRing(g1)", "poly"),
    "ST_InteriorRingN": (
        lambda: call("ST_InteriorRingN", F.col("g1"), F.lit(1)),
        "ST_InteriorRingN(g1, 1)", "poly"),
    "ST_InteriorRings": (lambda: call("ST_InteriorRings", F.col("g1")),
                         "ST_InteriorRings(g1)", "poly"),
}


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return PrestoSparkEngine.for_dir(sf_dir, spark=spark)


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if hasattr(v, "asDict"):
        return tuple(_norm(x) for x in v)
    return v


def _battery_df(spark, kind):
    if kind == "line":
        rows = [(g, "POINT (2 1)") for g in LINES]
    elif kind == "poly":
        # only POLYGON (not MULTIPOLYGON): the *_only accessors raise
        rows = [(g, "POINT (2 2)") for g in POLYS
                if g.startswith("POLYGON") and not g.endswith("EMPTY")]
        rows += [("POLYGON EMPTY", "POINT (1 1)")]
    else:
        rows = BATTERY
    return spark.createDataFrame(rows, "g1 string, g2 string")


def test_sql_path_matches_column_path(eng, spark):
    # one battery view per kind up front, then the 55 independent cases
    # (two tiny collects each) overlap through the scheduler — the
    # serial spelling re-created the DataFrame and view per case and was
    # the suite's #2 cost (296 s)
    from concurrent.futures import ThreadPoolExecutor

    dfs = {}
    for kind in {k for (_, _, k) in CASES.values()}:
        dfs[kind] = _battery_df(spark, kind)
        dfs[kind].createOrReplaceTempView(f"geo_battery_{kind}")

    def run(item):
        name, (builder, sql_expr, kind) = item
        try:
            expected = [_norm(r[0]) for r in
                        dfs[kind].select(builder().alias("v")).collect()]
        except Exception as e:
            return f"{name}: column path raised: {str(e)[:80]}"
        try:
            actual = [_norm(r[0]) for r in eng.sql(
                f"SELECT {sql_expr} AS v FROM geo_battery_{kind}").collect()]
        except Exception as e:
            return (f"{name}: SQL path raised: "
                    f"{str(e).splitlines()[0][:120]}")
        if expected != actual:
            diffs = [
                (i, e, a) for i, (e, a) in enumerate(zip(expected, actual))
                if e != a
            ][:3]
            return f"{name}: mismatch {diffs}"
        return None

    with ThreadPoolExecutor(max_workers=8) as pool:
        failures = [f for f in pool.map(run, sorted(CASES.items())) if f]
    assert not failures, "\n".join(failures)


def test_sql_path_bing_tiles(eng):
    """Bing tile family end-to-end through SQL (struct carrier)."""
    row = eng.sql("""
        SELECT bing_tile_quadkey(bing_tile(3, 5, 3)) AS qk,
               bing_tile_quadkey(bing_tile('213')) AS qk2,
               bing_tile_zoom_level(bing_tile(3, 5, 3)) AS z,
               bing_tile_coordinates(bing_tile_at(47.6, -122.3, 10)) AS c,
               bing_tile_polygon(bing_tile(0, 0, 1)) AS p,
               size(bing_tiles_around(47.6, -122.3, 10)) AS n
    """).collect()[0]
    assert row.qk == "213"
    assert row.qk2 == "213"
    assert row.z == 3
    assert (row.c.x, row.c.y) == (164, 357)
    assert row.p.startswith("POLYGON ((-180 0, 0 0, 0 85.05112877980659")
    assert row.n == 9


def test_sql_path_geo_aggregates(eng):
    """The three geo aggregates via their sqlfront rewrites."""
    rows = eng.sql("""
        SELECT ST_AsText(geometry_union_agg(g)) AS u,
               ST_AsText(convex_hull_agg(g)) AS h
        FROM (VALUES 'POINT (0 0)', 'POINT (4 0)', 'POINT (2 3)') t(g)
    """).collect()
    assert rows[0].u == "MULTIPOINT ((0 0), (4 0), (2 3))"
    assert rows[0].h == "POLYGON ((0 0, 4 0, 2 3, 0 0))"
    row = eng.sql("""
        SELECT spatial_partitions(tree, 'POINT (5 5)') AS pid
        FROM (SELECT spatial_partitioning(g, 2) AS tree
              FROM (VALUES 'POINT (1 1)', 'POINT (5 5)', 'POINT (9 9)',
                           'POINT (2 8)') t(g))
    """).collect()[0]
    assert row.pid is not None and len(row.pid) >= 1


def test_sql_path_error_texts(eng):
    """Reference error texts surface through the SQL path too."""
    with pytest.raises(Exception, match="ST_Length only applies to"):
        eng.sql("SELECT ST_Length('POINT (1 1)')").collect()
    with pytest.raises(Exception, match="only applies to POLYGON"):
        eng.sql("SELECT ST_NumInteriorRing('POINT (1 1)')").collect()
    with pytest.raises(Exception, match="consecutive duplicate"):
        eng.sql(
            "SELECT ST_LineString(array('POINT (1 1)', 'POINT (1 1)'))"
        ).collect()
    with pytest.raises(Exception, match="distance is negative"):
        eng.sql("SELECT ST_Buffer('POINT (1 1)', -1.0)").collect()


def test_sql_path_constructors(eng, spark):
    """Constructors/conversions with literal args, SQL vs Column."""
    pairs = [
        (call("ST_Point", F.lit(1.0), F.lit(2.5)), "ST_Point(1.0, 2.5)"),
        (call("ST_LineFromText", F.lit("LINESTRING (0 0, 1 1)")),
         "ST_LineFromText('LINESTRING (0 0, 1 1)')"),
        (call("ST_Polygon", F.lit("POLYGON ((0 0, 1 0, 1 1))")),
         "ST_Polygon('POLYGON ((0 0, 1 0, 1 1))')"),
        (call("ST_LineString",
              F.array(F.lit("POINT (1 2)"), F.lit("POINT (3 4)"))),
         "ST_LineString(array('POINT (1 2)', 'POINT (3 4)'))"),
        (call("ST_MultiPoint",
              F.array(F.lit("POINT (1 2)"), F.lit("POINT (3 4)"))),
         "ST_MultiPoint(array('POINT (1 2)', 'POINT (3 4)'))"),
        (call("ST_GeomFromBinary",
              call("ST_AsBinary", F.lit("POINT (7 8)"))),
         "ST_GeomFromBinary(ST_AsBinary('POINT (7 8)'))"),
        (call("geometry_union",
              F.array(F.lit("POINT (1 1)"), F.lit("POINT (2 2)"))),
         "geometry_union(array('POINT (1 1)', 'POINT (2 2)'))"),
        (call("great_circle_distance", F.lit(36.12), F.lit(-86.67),
              F.lit(33.94), F.lit(-118.40)),
         "great_circle_distance(36.12, -86.67, 33.94, -118.40)"),
    ]
    for col, sql_expr in pairs:
        expected = _norm(spark.range(1).select(col.alias("v"))
                         .collect()[0][0])
        actual = _norm(eng.sql(f"SELECT {sql_expr} AS v").collect()[0][0])
        assert expected == actual, f"{sql_expr}: {expected!r} != {actual!r}"


def test_every_registered_name_is_swept():
    """No registered geo SQL name escapes this suite — additions must
    bring a parity case."""
    from facebook_presto_spark.functions import geo_sql

    swept = set(CASES) | {
        # exercised in the dedicated tests below/above
        "ST_Point", "ST_LineFromText", "ST_Polygon", "ST_LineString",
        "ST_MultiPoint", "ST_GeomFromBinary", "geometry_union",
        "great_circle_distance",
        "bing_tile", "bing_tile_from_quadkey", "bing_tile_at",
        "bing_tile_quadkey", "bing_tile_zoom_level",
        "bing_tile_coordinates", "bing_tile_polygon", "bing_tiles_around",
        "spatial_partitions", "presto_spatial_partitions_dist",
        "presto_convex_hull_of_collection",
        "presto_spatial_partitioning_build",
    }
    missing = set(geo_sql._specs()) - swept
    assert not missing, f"registered but not parity-swept: {sorted(missing)}"


def test_sql_path_reference_query_shapes(eng):
    """A reference-style spatial query as plain SQL: contains-join over
    inline tables (the SpatialJoinOperator's SQL surface)."""
    rows = eng.sql("""
        SELECT z.name, count(*) AS n
        FROM (VALUES ('a', 'POLYGON ((0 0, 4 0, 4 4, 0 4))'),
                     ('b', 'POLYGON ((4 0, 8 0, 8 4, 4 4))')) z(name, zone),
             (VALUES 'POINT (1 1)', 'POINT (5 2)', 'POINT (6 3)',
                     'POINT (9 9)') p(pt)
        WHERE ST_Contains(z.zone, p.pt)
        GROUP BY z.name ORDER BY z.name
    """).collect()
    assert [(r.name, r.n) for r in rows] == [("a", 1), ("b", 2)]
