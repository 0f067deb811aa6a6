"""Pure-kernel tests for the overlay geometry kernel (no Spark).

Expected values mirror the reference's own tests —
presto-geospatial/src/test/java/com/facebook/presto/plugin/geospatial/
TestGeoFunctions.java: testSTIntersection (:622-629), testSTDifference
(:579-584), testSTSymDifference (:650-655), testSTUnion (:870-930),
testSimplifyGeometry (:333-340), testSTRelate (:750-752), testSTBuffer
(:174-195).  Comparisons are canonical (spelling-insensitive point-set
equality) because the Esri writer's vertex rotation/order is
implementation-defined; divergences from Esri's part-by-part artifacts
are pinned explicitly below.
"""

import math

import pytest

from facebook_presto_spark.functions import geo_kernel as gk


def _op(fn, a, b):
    return gk.render(fn(gk.parse_wkt(a), gk.parse_wkt(b)))


def same(got, want):
    assert gk.canonical(got) == gk.canonical(want), f"{got} != {want}"


def area_of(wkt):
    bag = gk.parse_wkt(wkt)
    return sum(gk.signed_area(r) for poly in bag.polys for r in poly)


# --- intersection (TestGeoFunctions:622-629) -------------------------------

INTERSECTION_CASES = [
    ("POINT (50 100)", "POINT (150 150)", "MULTIPOLYGON EMPTY"),
    ("MULTIPOINT (50 100, 50 200)", "POINT (50 100)", "POINT (50 100)"),
    (
        "LINESTRING (50 100, 50 200)",
        "LINESTRING (20 150, 100 150)",
        "POINT (50 150)",
    ),
    (
        "MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))",
        "MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))",
        "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))",
    ),
    (
        "POLYGON ((1 1, 1 3, 3 3, 3 1))",
        "POLYGON ((4 4, 4 5, 5 5, 5 4))",
        "MULTIPOLYGON EMPTY",
    ),
    (
        "POLYGON ((1 1, 1 4, 4 4, 4 1))",
        "LINESTRING (2 0, 2 3)",
        "LINESTRING (2 1, 2 3)",
    ),
    (
        "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))",
        "LINESTRING (0 0, 1 -1, 1 2)",
        "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (1 0, 1 1))",
    ),
    # touching-envelope cases (assertEnvelopeIntersection, :636-638):
    # inputs meet only along an edge or a corner, so the 2-D boolean is
    # empty and the shared boundary itself is the intersection
    (
        "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
        "POLYGON ((-1 -1, 0 -1, 0 1, -1 1, -1 -1))",
        "LINESTRING (0 0, 0 1)",
    ),
    (
        "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
        "POLYGON ((1 -1, 2 -1, 2 0, 1 0, 1 -1))",
        "LINESTRING (1 0, 2 0)",
    ),
    (
        "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))",
        "POLYGON ((-1 -1, 0 -1, 0 0, -1 0, -1 -1))",
        "POINT (0 0)",
    ),
]


@pytest.mark.parametrize("a,b,want", INTERSECTION_CASES)
def test_intersection(a, b, want):
    same(_op(gk.intersection, a, b), want)
    same(_op(gk.intersection, b, a), want)


def test_intersection_multipolygon_point_set_divergence():
    # TestGeoFunctions:627 — Esri emits a per-part decomposition plus a
    # redundant boundary LINESTRING; our point-set semantics dissolve
    # first.  The area and the polygon point set agree.
    got = _op(
        gk.intersection,
        "MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))",
        "POLYGON ((0 1, 3 1, 3 3, 0 3))",
    )
    assert area_of(got) == pytest.approx(5.0)
    same(
        got,
        "POLYGON ((0 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 1))",
    )


# --- difference (TestGeoFunctions:579-584) ---------------------------------

DIFFERENCE_CASES = [
    ("POINT (50 100)", "POINT (150 150)", "POINT (50 100)"),
    ("MULTIPOINT (50 100, 50 200)", "POINT (50 100)", "POINT (50 200)"),
    (
        "LINESTRING (50 100, 50 200)",
        "LINESTRING (50 50, 50 150)",
        "LINESTRING (50 150, 50 200)",
    ),
    (
        "MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))",
        "MULTILINESTRING ((2 1, 4 1), (3 3, 7 3))",
        "MULTILINESTRING ((1 1, 2 1), (4 1, 5 1), (2 4, 4 4))",
    ),
    (
        "POLYGON ((1 1, 1 4, 4 4, 4 1))",
        "POLYGON ((2 2, 2 5, 5 5, 5 2))",
        "POLYGON ((1 1, 4 1, 4 2, 2 2, 2 4, 1 4, 1 1))",
    ),
    (
        "MULTIPOLYGON (((1 1, 1 3, 3 3, 3 1)), ((0 0, 0 2, 2 2, 2 0)))",
        "POLYGON ((0 1, 3 1, 3 3, 0 3, 0 1))",
        "POLYGON ((1 1, 0 1, 0 0, 2 0, 2 1, 1 1))",
    ),
]


@pytest.mark.parametrize("a,b,want", DIFFERENCE_CASES)
def test_difference(a, b, want):
    same(_op(gk.difference, a, b), want)


# --- symdifference (TestGeoFunctions:650-655) ------------------------------

SYMDIFFERENCE_CASES = [
    (
        "POINT (50 100)",
        "POINT (50 150)",
        "MULTIPOINT ((50 100), (50 150))",
    ),
    (
        "MULTIPOINT (50 100, 60 200)",
        "MULTIPOINT (60 200, 70 150)",
        "MULTIPOINT ((50 100), (70 150))",
    ),
    (
        "LINESTRING (50 100, 50 200)",
        "LINESTRING (50 50, 50 150)",
        "MULTILINESTRING ((50 50, 50 100), (50 150, 50 200))",
    ),
    (
        "MULTILINESTRING ((1 1, 5 1), (2 4, 4 4))",
        "MULTILINESTRING ((3 4, 6 4), (5 0, 5 4))",
        "MULTILINESTRING ((5 0, 5 1), (1 1, 5 1), (5 1, 5 4), "
        "(2 4, 3 4), (4 4, 5 4), (5 4, 6 4))",
    ),
    (
        "POLYGON ((1 1, 1 4, 4 4, 4 1))",
        "POLYGON ((2 2, 2 5, 5 5, 5 2))",
        "MULTIPOLYGON (((1 1, 4 1, 4 2, 2 2, 2 4, 1 4, 1 1)), "
        "((4 2, 5 2, 5 5, 2 5, 2 4, 4 4, 4 2)))",
    ),
    (
        "MULTIPOLYGON (((0 0 , 0 2, 2 2, 2 0)), ((2 2, 2 4, 4 4, 4 2)))",
        "POLYGON ((0 0, 0 3, 3 3, 3 0))",
        "MULTIPOLYGON (((2 0, 3 0, 3 2, 2 2, 2 0)), "
        "((0 2, 2 2, 2 3, 0 3, 0 2)), ((3 2, 4 2, 4 4, 2 4, 2 3, 3 3, 3 2)))",
    ),
]


@pytest.mark.parametrize("a,b,want", SYMDIFFERENCE_CASES)
def test_symdifference(a, b, want):
    same(_op(gk.symdifference, a, b), want)
    same(_op(gk.symdifference, b, a), want)


# --- union (testSTUnion) ---------------------------------------------------

SIMPLE_WKTS = [
    "POINT (1 2)",
    "MULTIPOINT ((1 2), (3 4))",
    "LINESTRING (0 0, 2 2, 4 4)",
    "MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9))",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "MULTIPOLYGON (((1 1, 3 1, 3 3, 1 3, 1 1)), ((2 4, 6 4, 6 6, 2 6, 2 4)))",
]


@pytest.mark.parametrize("w", SIMPLE_WKTS)
def test_union_empty_and_self(w):
    same(_op(gk.union, "POINT EMPTY", w), w)
    same(_op(gk.union, w, "GEOMETRYCOLLECTION EMPTY"), w)
    same(_op(gk.union, w, w), w)


UNION_CASES = [
    (
        "POINT (1 2)",
        "MULTIPOINT ((1 2), (3 4))",
        "MULTIPOINT ((1 2), (3 4))",
    ),
    (
        "LINESTRING (0 1, 1 2)",
        "LINESTRING (1 2, 3 4)",
        "LINESTRING (0 1, 1 2, 3 4)",
    ),
    (
        "MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9))",
        "MULTILINESTRING ((5 5, 7 7, 9 9), (11 11, 13 13, 15 15))",
        "MULTILINESTRING ((0 0, 2 2, 4 4), (5 5, 7 7, 9 9), "
        "(11 11, 13 13, 15 15))",
    ),
    (
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
        "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0))",
    ),
    (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), POINT (1 2))",
        "GEOMETRYCOLLECTION (POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0)), "
        "MULTIPOINT ((1 2), (3 4)))",
        "GEOMETRYCOLLECTION (MULTIPOINT ((1 2), (3 4)), "
        "POLYGON ((0 0, 1 0, 2 0, 2 1, 1 1, 0 1, 0 0)))",
    ),
]


@pytest.mark.parametrize("a,b,want", UNION_CASES)
def test_union(a, b, want):
    same(_op(gk.union, a, b), want)
    same(_op(gk.union, b, a), want)


def test_union_creates_hole():
    rects = [
        "POLYGON ((0 0, 10 0, 10 2, 0 2, 0 0))",
        "POLYGON ((0 8, 10 8, 10 10, 0 10, 0 8))",
        "POLYGON ((0 0, 2 0, 2 10, 0 10, 0 0))",
        "POLYGON ((8 0, 10 0, 10 10, 8 10, 8 0))",
    ]
    acc = gk.parse_wkt(rects[0])
    for r in rects[1:]:
        acc = gk.union(acc, gk.parse_wkt(r))
    assert len(acc.polys) == 1
    assert len(acc.polys[0]) == 2  # outer + hole
    assert area_of(gk.render(acc)) == pytest.approx(64.0)


def test_holed_polygon_boolean_ops():
    holed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    clip = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"
    assert area_of(_op(gk.intersection, holed, clip)) == pytest.approx(20.0)
    assert area_of(_op(gk.difference, holed, clip)) == pytest.approx(64.0)
    assert area_of(_op(gk.union, holed, clip)) == pytest.approx(100.0)
    assert area_of(_op(gk.symdifference, holed, clip)) == pytest.approx(80.0)


# --- simplify (TestGeoFunctions:333-340, TopologyPreservingSimplifier) -----

SIMPLIFY_CASES = [
    (
        "POLYGON ((1 0, 2 1, 3 1, 3 1, 4 1, 1 0))",
        1.5,
        "POLYGON ((1 0, 4 1, 2 1, 1 0))",
    ),
    (
        "POLYGON ((1 0, 1 1, 2 1, 2 3, 3 3, 3 1, 4 1, 4 0, 1 0))",
        1.0,
        "POLYGON ((1 0, 4 0, 3 3, 2 3, 1 0))",
    ),
    (
        "POLYGON ((1 0, 1 1, 2 1, 2 3, 3 3, 3 1, 4 1, 4 0, 1 0))",
        0.5,
        "POLYGON ((1 0, 4 0, 4 1, 3 1, 3 3, 2 3, 2 1, 1 1, 1 0))",
    ),
]


@pytest.mark.parametrize("w,tol,want", SIMPLIFY_CASES)
def test_simplify(w, tol, want):
    same(gk.render(gk.simplify_bag(gk.parse_wkt(w), tol)), want)


# --- relate (TestGeoFunctions:750-752) -------------------------------------

RELATE_CASES = [
    ("LINESTRING (0 0, 3 3)", "LINESTRING (1 1, 4 1)", "****T****", False),
    (
        "POLYGON ((2 0, 2 1, 3 1))",
        "POLYGON ((1 1, 1 4, 4 4, 4 1))",
        "****T****",
        True,
    ),
    (
        "POLYGON ((2 0, 2 1, 3 1))",
        "POLYGON ((1 1, 1 4, 4 4, 4 1))",
        "T********",
        False,
    ),
]


@pytest.mark.parametrize("a,b,pattern,want", RELATE_CASES)
def test_relate(a, b, pattern, want):
    m = gk.de9im(gk.parse_wkt(a), gk.parse_wkt(b))
    assert gk.relate_match(m, pattern) is want


DE9IM_CASES = [
    ("POINT (5 5)", "POLYGON ((0 0, 10 0, 10 10, 0 10))", "0FFFFF212"),
    (
        "POLYGON ((0 0, 2 0, 2 2, 0 2))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3))",
        "212101212",
    ),
    (
        "POLYGON ((0 0, 1 0, 1 1, 0 1))",
        "POLYGON ((1 0, 2 0, 2 1, 1 1))",
        "FF2F11212",
    ),
]


@pytest.mark.parametrize("a,b,want", DE9IM_CASES)
def test_de9im_matrix(a, b, want):
    assert gk.de9im(gk.parse_wkt(a), gk.parse_wkt(b)) == want


# --- buffer ----------------------------------------------------------------

def test_buffer_point_area_96gon():
    b = gk.buffer_bag(gk.parse_wkt("POINT (0 0)"), 0.5)
    got = sum(gk.signed_area(r) for poly in b.polys for r in poly)
    want = 96 * 0.5 * 0.25 * math.sin(2 * math.pi / 96)
    assert got == pytest.approx(want)
    # 96 vertices, like the Esri discretization (TestGeoFunctions:174)
    assert len(b.polys[0][0]) == 96


def test_buffer_line_and_polygon_areas():
    b = gk.buffer_bag(gk.parse_wkt("LINESTRING (0 0, 1 1, 2 0.5)"), 0.2)
    got = sum(gk.signed_area(r) for poly in b.polys for r in poly)
    want = (math.hypot(1, 1) + math.hypot(1, 0.5)) * 0.4 + math.pi * 0.04
    assert got == pytest.approx(want, rel=0.01)

    b = gk.buffer_bag(gk.parse_wkt("POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))"), 1.2)
    got = sum(gk.signed_area(r) for poly in b.polys for r in poly)
    want = 25 + 4 * 5 * 1.2 + math.pi * 1.44
    assert got == pytest.approx(want, rel=0.001)


def test_buffer_collection():
    coll = "GEOMETRYCOLLECTION (POINT (5 1), LINESTRING (3 4, 4 4))"
    b = gk.buffer_bag(gk.parse_wkt(coll), 0.2)
    assert len(b.polys) == 2
    got = sum(gk.signed_area(r) for poly in b.polys for r in poly)
    want = math.pi * 0.04 + (0.4 + math.pi * 0.04)
    assert got == pytest.approx(want, rel=0.01)


def test_buffer_contains_input():
    b = gk.buffer_bag(gk.parse_wkt("POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))"), 1.0)
    for p in [(0, 0), (5, 5), (2.5, 2.5), (-0.9, 2.5), (5.9, 2.5)]:
        assert gk.locate_in_polys(p, b.polys) != "out"
    assert gk.locate_in_polys((-1.5, -1.5), b.polys) == "out"


# --- WKT round-trip / rendering --------------------------------------------

RENDER_CASES = [
    "POINT (1 2)",
    "MULTIPOINT ((1 2), (3 4))",
    "LINESTRING (0 0, 2 2, 4 4)",
    "MULTILINESTRING ((0 0, 2 2), (5 5, 7 7))",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "MULTIPOLYGON (((1 1, 3 1, 3 3, 1 3, 1 1)), ((4 4, 6 4, 6 6, 4 6, 4 4)))",
]


@pytest.mark.parametrize("w", RENDER_CASES)
def test_wkt_roundtrip(w):
    assert gk.render(gk.parse_wkt(w)) == w


def test_empty_renders_as_multipolygon_empty():
    assert gk.render(gk.parse_wkt("POINT EMPTY")) == "MULTIPOLYGON EMPTY"
    assert gk.render(Bag := gk.Bag()) == "MULTIPOLYGON EMPTY"


# --- KdbTree spatial partitioning (TestGeoFunctions:55-109) ---------------

def _reference_tree():
    # makeKdbTreeJson (:90-99): 50 overlapping rectangles, extent
    # (0,0,9,4), max 10 items per node
    rects = [
        (float(x), float(y), x + 1.0, y + 2.0)
        for x in range(10)
        for y in range(5)
    ]
    return gk.build_kdb_tree(10, (0.0, 0.0, 9.0, 4.0), rects)


SPATIAL_PARTITION_CASES = [
    ("POINT EMPTY", None, None),
    ("POINT (0 0)", None, [0]),
    ("POINT (3 1)", None, [2]),
    ("POINT (1 2.5)", None, [1]),       # border between two partitions
    ("POINT (4.5 2.5)", None, [4]),     # corner of three partitions
    ("POINT (2 6)", None, []),
    ("POINT (3 -1)", None, []),
    ("POINT (10 3)", None, []),
    ("MULTIPOINT (5 0.1, 6 2)", None, [3]),
    ("MULTIPOINT (5 0.1, 5.5 3, 6 2)", None, [3, 4]),
    ("MULTIPOINT (3 2, 8 3)", None, [2, 3, 4, 5]),
    ("MULTIPOINT (2 6, 3 7)", None, []),
    ("POINT EMPTY", 1.2, None),
    ("POINT (1 1)", 1.2, [0]),
    ("POINT (1 1)", 2.3, [0, 1, 2]),
    ("MULTIPOINT (5 0.1, 6 2)", 0.2, [3]),
    ("MULTIPOINT (5 0.1, 6 2)", 1.2, [2, 3, 4]),
    ("MULTIPOINT (2 6, 3 7)", 1.2, []),
]


@pytest.mark.parametrize("wkt,dist,want", SPATIAL_PARTITION_CASES)
def test_spatial_partitions(wkt, dist, want):
    assert gk.spatial_partitions(_reference_tree(), wkt, dist) == want


def test_kdb_tree_json_roundtrip():
    tree = _reference_tree()
    js = gk.kdb_tree_to_json(tree)
    assert gk.kdb_tree_from_json(js) == tree
    # reference leaf topology: 6 preorder leaves
    leaves = []
    gk._kdb_leaves(tree["root"], None, leaves)
    assert [leaf_id for leaf_id, _ in leaves] == [0, 1, 2, 3, 4, 5]
    # accepts the Jackson getter capitalization too
    assert gk.kdb_tree_from_json(js.replace('"xmin"', '"xMin"')) == tree


def test_spatial_partitions_distance_validation():
    tree = _reference_tree()
    with pytest.raises(ValueError, match="distance is NaN"):
        gk.spatial_partitions(tree, "POINT (0 0)", float("nan"))
    with pytest.raises(ValueError, match="distance is infinite"):
        gk.spatial_partitions(tree, "POINT (0 0)", float("inf"))
    with pytest.raises(ValueError, match="distance is negative"):
        gk.spatial_partitions(tree, "POINT (0 0)", -1.0)


def test_build_spatial_partitioning_covers_all_points():
    # every input point must land in exactly one partition
    pts = [(i * 37 % 100, i * 59 % 100) for i in range(200)]
    wkts = [f"POINT ({x} {y})" for x, y in pts]
    js = gk.build_spatial_partitioning(wkts, 8)
    tree = gk.kdb_tree_from_json(js)
    seen = set()
    for w in wkts:
        parts = gk.spatial_partitions(tree, w)
        assert len(parts) == 1
        seen.add(parts[0])
    assert len(seen) >= 2  # the tree actually split


# --- property-based identities over random convex polygons -----------------
#
# Inclusion-exclusion holds EXACTLY for any pair of regions:
#   |A∪B| + |A∩B| = |A| + |B|,  |A−B| = |A| − |A∩B|,  |AΔB| = |A∪B| − |A∩B|
# so random inputs validate the boolean kernel without any reference
# values.  Integer coordinates keep the arithmetic exact.

from hypothesis import HealthCheck, given, settings, strategies as st


def _convex_wkt(pts):
    """Monotone-chain hull of integer points → CCW POLYGON WKT (None if
    degenerate)."""
    pts = sorted(set(pts))
    if len(pts) < 3:
        return None

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    ring = half(pts)[:-1] + half(pts[::-1])[:-1]
    if len(ring) < 3:
        return None
    body = ", ".join(f"{x} {y}" for x, y in ring + [ring[0]])
    return f"POLYGON (({body}))"


_pts = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=3, max_size=8,
)


def _areas(bag):
    return sum(gk.signed_area(r) for poly in bag.polys for r in poly)


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(p1=_pts, p2=_pts)
def test_boolean_op_inclusion_exclusion(p1, p2):
    w1, w2 = _convex_wkt(p1), _convex_wkt(p2)
    if w1 is None or w2 is None:
        return
    A, B = gk.parse_wkt(w1), gk.parse_wkt(w2)
    a, b = _areas(A), _areas(B)
    inter = _areas(gk.intersection(A, B))
    union = _areas(gk.union(A, B))
    diff = _areas(gk.difference(A, B))
    sym = _areas(gk.symdifference(A, B))
    assert union + inter == pytest.approx(a + b, abs=1e-6), (w1, w2)
    assert diff == pytest.approx(a - inter, abs=1e-6), (w1, w2)
    assert sym == pytest.approx(union - inter, abs=1e-6), (w1, w2)
    assert 0 <= inter <= min(a, b) + 1e-9
    assert union >= max(a, b) - 1e-9


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(p1=_pts, p2=_pts)
def test_relate_consistent_with_boolean_ops(p1, p2):
    w1, w2 = _convex_wkt(p1), _convex_wkt(p2)
    if w1 is None or w2 is None:
        return
    A, B = gk.parse_wkt(w1), gk.parse_wkt(w2)
    matrix = gk.de9im(A, B)
    inter_area = _areas(gk.intersection(A, B))
    # interiors intersect ⇔ the intersection has positive area
    assert (matrix[0] == "2") == (inter_area > 1e-9), (w1, w2, matrix)
    # symmetry of the interior/boundary block under transpose
    m_t = gk.de9im(B, A)
    assert matrix[0] == m_t[0] and matrix[4] == m_t[4]
    assert matrix[1] == m_t[3] and matrix[3] == m_t[1]


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(p1=_pts, d=st.sampled_from([0.5, 1.0, 2.0]))
def test_buffer_grows_and_contains(p1, d):
    w1 = _convex_wkt(p1)
    if w1 is None:
        return
    A = gk.parse_wkt(w1)
    buf = gk.buffer_bag(A, d)
    assert _areas(buf) > _areas(A)
    for ring in A.polys[0]:
        for p in ring:
            assert gk.locate_in_polys(p, buf.polys) != "out", (w1, d)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(p1=_pts)
def test_simplify_zero_tolerance_is_identity(p1):
    w1 = _convex_wkt(p1)
    if w1 is None:
        return
    bag = gk.parse_wkt(w1)
    assert gk.canonical(gk.render(gk.simplify_bag(bag, 0.0))) == gk.canonical(w1)
