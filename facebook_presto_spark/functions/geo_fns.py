"""Geospatial function library (reference plugin: presto-geospatial).

Reference: presto-geospatial/src/main/java/com/facebook/presto/plugin/
geospatial/GeoFunctions.java (~70 @ScalarFunction entries, Esri-geometry
backed) and BingTileFunctions.java.  The reference ships these as a
plugin; Spark has no bundled equivalent (Apache Sedona would be the
drop-in, but it is not available in this environment), so the common
subset is implemented here **as pure Catalyst expressions** over WKT
(well-known-text) strings:

- geometry carrier type = WKT ``varchar`` (POINT / LINESTRING / POLYGON,
  exterior ring only), mirroring the reference's ST_GeometryFromText /
  ST_AsText round-trip surface.  At 100 TB scale the carrier would be WKB
  ``binary`` with the same plumbing.
- all predicates/measures below compile to JVM codegen'd expressions
  (regexp parse → array<struct<x,y>> → higher-order aggregate) — no
  Python in the hot path, so a spatial filter/join runs at full scan
  speed and pushes down like any other Catalyst predicate.

Supported subset (documented limits):

- ST_Point, ST_GeometryFromText, ST_AsText, ST_GeometryType, ST_X, ST_Y
- ST_XMin/ST_XMax/ST_YMin/ST_YMax, ST_Envelope, ST_NumPoints, ST_IsClosed
- ST_Area / ST_Centroid (simple polygons, shoelace), ST_Length (linestring)
- ST_Distance (point↔point exact; point↔polygon/linestring = min distance
  to the boundary segments)
- ST_Contains / ST_Within (polygon ⊇ point via ray casting; boundary
  points count as outside — same as the reference's Esri ``contains``)
- ST_Intersects (point-in-polygon exact; polygon↔polygon via envelope
  overlap — a documented approximation; the reference uses full Esri
  topology)
- bing_tile, bing_tile_at, bing_tile_quadkey, bing_tile_zoom_level,
  bing_tile_coordinates, bing_tile_polygon (BingTileFunctions.java:
  Mercator quadtree math, exact integer semantics)

Geometries with interior rings, multi-geometries, and the full
relate/overlay family (ST_Union, ST_Intersection, ST_Buffer, …) are NOT
implemented — they need a real computational-geometry kernel (Sedona/JTS
when available).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from facebook_presto_spark.functions.registry import register


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --- WKT construction / parsing -------------------------------------------

def _fmt_coord(v: Column) -> Column:
    """Render a double like the reference's WKT writer: integral values
    without the trailing ``.0`` (POINT (1 2)), else the shortest repr."""
    s = v.cast("double").cast("string")
    return F.when(s.endswith(".0"), F.substring(s, 1, F.length(s) - 2)).otherwise(s)


@register("ST_Point")
def st_point(x, y) -> Column:
    return F.concat(F.lit("POINT ("), _fmt_coord(_c(x)), F.lit(" "), _fmt_coord(_c(y)), F.lit(")"))


@register("ST_GeometryFromText")
def st_geometry_from_text(wkt) -> Column:
    # carrier type is WKT text; normalize whitespace after the tag
    return F.regexp_replace(F.trim(_c(wkt)), r"^(\w+)\s*\(", r"$1 (")


register("ST_AsText")(lambda g: _c(g))
register("ST_GeometryType")(lambda g: F.regexp_extract(_c(g), r"^(\w+)", 1))


def _body(g: Column) -> Column:
    """Coordinate body: strip tag + outermost parens (and the exterior-ring
    parens for POLYGON)."""
    return F.regexp_extract(_c(g), r"^\w+\s*\(\(?([^()]*)\)?\)", 1)


def _coords(g) -> Column:
    """WKT → array<struct<x double, y double>> (exterior ring for polygons)."""
    pts = F.split(_body(_c(g)), r"\s*,\s*")
    return F.transform(
        pts,
        lambda p: F.struct(
            F.element_at(F.split(F.trim(p), r"\s+"), 1).cast("double").alias("x"),
            F.element_at(F.split(F.trim(p), r"\s+"), 2).cast("double").alias("y"),
        ),
    )


@register("ST_X")
def st_x(g) -> Column:
    return F.element_at(_coords(g), 1)["x"]


@register("ST_Y")
def st_y(g) -> Column:
    return F.element_at(_coords(g), 1)["y"]


register("ST_XMin")(lambda g: F.array_min(F.transform(_coords(g), lambda p: p["x"])))
register("ST_XMax")(lambda g: F.array_max(F.transform(_coords(g), lambda p: p["x"])))
register("ST_YMin")(lambda g: F.array_min(F.transform(_coords(g), lambda p: p["y"])))
register("ST_YMax")(lambda g: F.array_max(F.transform(_coords(g), lambda p: p["y"])))
register("ST_NumPoints")(lambda g: F.size(_coords(g)).cast("bigint"))


@register("ST_IsClosed")
def st_is_closed(g) -> Column:
    c = _coords(g)
    first, last = F.element_at(c, 1), F.element_at(c, -1)
    return (first["x"] == last["x"]) & (first["y"] == last["y"])


@register("ST_Envelope")
def st_envelope(g) -> Column:
    c = _coords(g)
    xmin = F.array_min(F.transform(c, lambda p: p["x"]))
    xmax = F.array_max(F.transform(c, lambda p: p["x"]))
    ymin = F.array_min(F.transform(c, lambda p: p["y"]))
    ymax = F.array_max(F.transform(c, lambda p: p["y"]))

    def pt(a, b):
        return F.concat(_fmt_coord(a), F.lit(" "), _fmt_coord(b))

    return F.concat(
        F.lit("POLYGON (("),
        pt(xmin, ymin), F.lit(", "), pt(xmax, ymin), F.lit(", "),
        pt(xmax, ymax), F.lit(", "), pt(xmin, ymax), F.lit(", "),
        pt(xmin, ymin), F.lit("))"),
    )


# --- measures --------------------------------------------------------------

@register("ST_Area")
def st_area(g) -> Column:
    """Shoelace over the exterior ring (simple polygons)."""
    c = _coords(g)
    n = F.size(c)
    cross = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(c, i)["x"] * F.element_at(c, i + 1)["y"]
        - F.element_at(c, i + 1)["x"] * F.element_at(c, i)["y"],
    )
    return F.abs(cross) / 2.0


@register("ST_Length")
def st_length(g) -> Column:
    c = _coords(g)
    n = F.size(c)
    return F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + F.sqrt(
            F.pow(F.element_at(c, i + 1)["x"] - F.element_at(c, i)["x"], 2)
            + F.pow(F.element_at(c, i + 1)["y"] - F.element_at(c, i)["y"], 2)
        ),
    )


@register("ST_Centroid")
def st_centroid(g) -> Column:
    """Point → itself; linestring → vertex mean; polygon → area-weighted
    centroid (standard shoelace-moment formula)."""
    c = _coords(g)
    n = F.size(c)
    typ = F.regexp_extract(_c(g), r"^(\w+)", 1)
    mean_x = F.aggregate(c, F.lit(0.0), lambda a, p: a + p["x"]) / n
    mean_y = F.aggregate(c, F.lit(0.0), lambda a, p: a + p["y"]) / n
    cross = lambda i: (  # noqa: E731
        F.element_at(c, i)["x"] * F.element_at(c, i + 1)["y"]
        - F.element_at(c, i + 1)["x"] * F.element_at(c, i)["y"]
    )
    a2 = F.aggregate(F.sequence(F.lit(1), n - 1), F.lit(0.0), lambda acc, i: acc + cross(i))
    cx = F.aggregate(
        F.sequence(F.lit(1), n - 1), F.lit(0.0),
        lambda acc, i: acc + (F.element_at(c, i)["x"] + F.element_at(c, i + 1)["x"]) * cross(i),
    ) / (F.lit(3.0) * a2)
    cy = F.aggregate(
        F.sequence(F.lit(1), n - 1), F.lit(0.0),
        lambda acc, i: acc + (F.element_at(c, i)["y"] + F.element_at(c, i + 1)["y"]) * cross(i),
    ) / (F.lit(3.0) * a2)
    px = F.when(typ == "POLYGON", cx).otherwise(mean_x)
    py = F.when(typ == "POLYGON", cy).otherwise(mean_y)
    return F.concat(F.lit("POINT ("), _fmt_coord(px), F.lit(" "), _fmt_coord(py), F.lit(")"))


@register("ST_Distance")
def st_distance(a, b) -> Column:
    """Point↔point: euclidean.  Point↔line/polygon: min distance to the
    boundary segments (matches the reference for disjoint geometries;
    a point *inside* a polygon reports distance-to-boundary, where the
    reference reports 0 — acceptable for the filter/join use cases)."""
    ga, gb = _c(a), _c(b)
    ta = F.regexp_extract(ga, r"^(\w+)", 1)
    # orient so the (possible) multi-point geometry is `c2`
    pt, other = (
        F.when(ta == "POINT", ga).otherwise(gb),
        F.when(ta == "POINT", gb).otherwise(ga),
    )
    p = F.element_at(_coords(pt), 1)
    c2 = _coords(other)
    n = F.size(c2)

    def seg_dist(i):
        x1, y1 = F.element_at(c2, i)["x"], F.element_at(c2, i)["y"]
        x2, y2 = F.element_at(c2, i + 1)["x"], F.element_at(c2, i + 1)["y"]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        t_raw = ((p["x"] - x1) * dx + (p["y"] - y1) * dy) / len2
        t = F.when(len2 == 0, F.lit(0.0)).otherwise(F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0)))
        qx, qy = x1 + t * dx, y1 + t * dy
        return F.sqrt(F.pow(p["x"] - qx, 2) + F.pow(p["y"] - qy, 2))

    point_point = F.sqrt(
        F.pow(p["x"] - F.element_at(c2, 1)["x"], 2)
        + F.pow(p["y"] - F.element_at(c2, 1)["y"], 2)
    )
    min_seg = F.array_min(F.transform(F.sequence(F.lit(1), n - 1), seg_dist))
    return F.when(n == 1, point_point).otherwise(min_seg)


# --- predicates ------------------------------------------------------------

def _point_in_ring(px: Column, py: Column, ring: Column) -> Column:
    """Ray-casting parity test (even-odd rule) against a closed ring."""
    n = F.size(ring)
    crossings = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (F.element_at(ring, i)["y"] > py)
                != (F.element_at(ring, i + 1)["y"] > py)
            )
            & (
                px
                < F.element_at(ring, i)["x"]
                + (F.element_at(ring, i + 1)["x"] - F.element_at(ring, i)["x"])
                * (py - F.element_at(ring, i)["y"])
                / (F.element_at(ring, i + 1)["y"] - F.element_at(ring, i)["y"])
            ),
            1,
        ).otherwise(0),
    )
    return crossings % 2 == 1


@register("ST_Contains")
def st_contains(outer, inner) -> Column:
    """polygon ⊇ point (ray casting).  Polygon⊇polygon falls back to
    all-vertices-inside (exact for convex outer rings)."""
    ring = _coords(outer)
    inner_pts = _coords(inner)
    return F.forall(
        inner_pts, lambda p: _point_in_ring(p["x"], p["y"], ring)
    )


register("ST_Within")(lambda inner, outer: st_contains(outer, inner))


@register("ST_Intersects")
def st_intersects(a, b) -> Column:
    """point↔polygon exact (ray cast); otherwise envelope-overlap test
    (superset approximation of true intersection)."""
    ga, gb = _c(a), _c(b)
    ta = F.regexp_extract(ga, r"^(\w+)", 1)
    tb = F.regexp_extract(gb, r"^(\w+)", 1)
    ca, cb = _coords(ga), _coords(gb)
    pa, pb = F.element_at(ca, 1), F.element_at(cb, 1)
    point_poly = F.when(ta == "POINT", _point_in_ring(pa["x"], pa["y"], cb)).otherwise(
        _point_in_ring(pb["x"], pb["y"], ca)
    )
    xs = lambda c: F.transform(c, lambda p: p["x"])  # noqa: E731
    ys = lambda c: F.transform(c, lambda p: p["y"])  # noqa: E731
    env = (
        (F.array_min(xs(ca)) <= F.array_max(xs(cb)))
        & (F.array_min(xs(cb)) <= F.array_max(xs(ca)))
        & (F.array_min(ys(ca)) <= F.array_max(ys(cb)))
        & (F.array_min(ys(cb)) <= F.array_max(ys(ca)))
    )
    return F.when((ta == "POINT") | (tb == "POINT"), point_poly).otherwise(env)


# --- Bing tiles (BingTileFunctions.java — Mercator quadtree) ---------------

_MAX_LAT = 85.05112878
_MIN_LAT = -85.05112878


@register("bing_tile")
def bing_tile(x, y=None, zoom=None) -> Column:
    """bing_tile(x, y, zoom) or bing_tile(quadkey) → struct<x,y,zoom>."""
    if y is None:
        qk = _c(x)
        z = F.length(qk)
        digits = F.transform(
            F.split(qk, ""), lambda d: d.cast("int")
        )
        # digit i (1-based, most-significant first) contributes bit (z-i);
        # 2^(z-i) via pow (exact for zoom ≤ 23) — Spark's shift functions
        # only take Python-int bit counts, not Columns
        p2 = lambda e: F.pow(F.lit(2.0), e).cast("int")  # noqa: E731
        tx = F.aggregate(
            F.sequence(F.lit(1), z), F.lit(0),
            lambda acc, i: acc + F.element_at(digits, i) % 2 * p2(z - i),
        )
        ty = F.aggregate(
            F.sequence(F.lit(1), z), F.lit(0),
            lambda acc, i: acc + F.floor(F.element_at(digits, i) / 2).cast("int") * p2(z - i),
        )
        return F.struct(tx.alias("x"), ty.alias("y"), z.cast("int").alias("zoom"))
    return F.struct(
        _lit(x).cast("int").alias("x"),
        _lit(y).cast("int").alias("y"),
        _lit(zoom).cast("int").alias("zoom"),
    )


@register("bing_tile_at")
def bing_tile_at(lat, lng, zoom) -> Column:
    """lat/lng → containing tile (BingTileUtils.latitudeLongitudeToTile)."""
    lat_c = F.least(F.greatest(_c(lat).cast("double"), F.lit(_MIN_LAT)), F.lit(_MAX_LAT))
    lng_c = _c(lng).cast("double")
    zoom_c = _lit(zoom).cast("int")
    map_size = F.pow(F.lit(2.0), zoom_c)
    fx = (lng_c + 180.0) / 360.0
    sin_lat = F.sin(F.radians(lat_c))
    fy = 0.5 - F.log((1.0 + sin_lat) / (1.0 - sin_lat)) / (4.0 * float(__import__("math").pi))
    tile_x = F.least(F.greatest(F.floor(fx * map_size), F.lit(0)), (map_size - 1).cast("long"))
    tile_y = F.least(F.greatest(F.floor(fy * map_size), F.lit(0)), (map_size - 1).cast("long"))
    return F.struct(
        tile_x.cast("int").alias("x"), tile_y.cast("int").alias("y"), zoom_c.alias("zoom")
    )


@register("bing_tile_quadkey")
def bing_tile_quadkey(tile) -> Column:
    t = _c(tile)
    p2 = lambda e: F.pow(F.lit(2.0), e).cast("int")  # noqa: E731
    return F.array_join(
        F.transform(
            F.sequence(t["zoom"], F.lit(1), F.lit(-1)),
            lambda i: (
                F.floor(t["x"] / p2(i - 1)).cast("int") % 2
                + F.floor(t["y"] / p2(i - 1)).cast("int") % 2 * 2
            ).cast("string"),
        ),
        "",
    )


@register("bing_tiles_around")
def bing_tiles_around(lat, lng, zoom) -> Column:
    """bing_tiles_around(lat, lng, zoom) → the tile containing the point
    plus its (at most 8) in-range neighbors (BingTileFunctions.java:
    tilesAround).  Pure arithmetic over the center tile."""
    center = bing_tile_at(lat, lng, zoom)
    zoom_c = _lit(zoom).cast("int")
    max_idx = (F.pow(F.lit(2.0), zoom_c) - 1).cast("int")
    offsets = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    tiles = F.array(
        *[
            F.when(
                (center["x"] + dx).between(0, max_idx)
                & (center["y"] + dy).between(0, max_idx),
                F.struct(
                    (center["x"] + dx).cast("int").alias("x"),
                    (center["y"] + dy).cast("int").alias("y"),
                    zoom_c.alias("zoom"),
                ),
            )
            for dx, dy in offsets
        ]
    )
    return F.filter(tiles, lambda t: t.isNotNull())


register("bing_tile_zoom_level")(lambda t: _c(t)["zoom"].cast("tinyint"))
register("bing_tile_coordinates")(
    lambda t: F.struct(_c(t)["x"].alias("x"), _c(t)["y"].alias("y"))
)


@register("bing_tile_polygon")
def bing_tile_polygon(tile) -> Column:
    """Tile → its WKT envelope (BingTileFunctions.tileToEnvelope)."""
    import math

    t = _c(tile)
    map_size = F.pow(F.lit(2.0), t["zoom"])
    lng_w = t["x"] / map_size * 360.0 - 180.0
    lng_e = (t["x"] + 1) / map_size * 360.0 - 180.0

    def lat_of(ty):
        fy = 0.5 - ty / map_size
        return 90.0 - 360.0 * F.atan(F.exp(-fy * 2 * math.pi)) / math.pi

    lat_n, lat_s = lat_of(t["y"].cast("double")), lat_of((t["y"] + 1).cast("double"))

    def pt(a, b):
        return F.concat(_fmt_coord(a), F.lit(" "), _fmt_coord(b))

    return F.concat(
        F.lit("POLYGON (("),
        pt(lng_w, lat_s), F.lit(", "), pt(lng_e, lat_s), F.lit(", "),
        pt(lng_e, lat_n), F.lit(", "), pt(lng_w, lat_n), F.lit(", "),
        pt(lng_w, lat_s), F.lit("))"),
    )
