"""Computational-geometry kernel for the overlay family.

Reference: presto-geospatial/src/main/java/com/facebook/presto/plugin/
geospatial/GeoFunctions.java — ST_Union (:619), geometry_union (:627),
ST_Intersection (:944), ST_Difference (:907), ST_SymDifference (:979),
ST_Buffer (:293), simplify_geometry (:800), ST_Relate (:1078).  The
reference delegates to the Esri geometry-api / JTS; this module is an
independent implementation of the same point-set operations:

- geometries parse from/serialize to WKT (the engine's carrier type);
  internally a geometry is a "bag" of three dimension layers:
  points (0), paths (1), polygons (2 — each a list of rings, outer ring
  CCW, holes CW, so the interior is always to the LEFT of every
  directed boundary edge).
- polygon boolean ops use edge-fragment classification: node every
  boundary edge of A at its intersections with B (and vice versa),
  classify each fragment against the other polygon (in / out /
  boundary-same-direction / boundary-opposite-direction) by its
  midpoint, select fragments per operation, then stitch the selected
  directed fragments back into rings (at multi-way junctions the walk
  takes the most-counterclockwise continuation, which traces the face
  keeping the interior on the left).  This is the classical overlay
  construction the Esri/JTS OverlayOp implements with a full
  topology graph; fragment classification is equivalent for valid
  inputs and is an independent spelling, not a port.
- line/point layers use direct membership + clipping machinery
  (segment noding against polygon boundaries and other lines).

Semantics mirrored from the reference's own TestGeoFunctions:
- empty results render as ``MULTIPOLYGON EMPTY``;
- mixed-dimension results render as ``GEOMETRYCOLLECTION`` with the
  layers in dimension order (points, lines, polygons);
- union operates per dimension and keeps every dimension present
  (GeoFunctions.java:629-636 documents the same per-dimension split);
- touching line union merges chains at shared endpoints
  (``LINESTRING (0 1, 1 2)`` ∪ ``(1 2, 3 4)`` → one path);
- ST_Buffer(g, 0) returns the (re-serialized) input, negative/NaN
  distances raise, infinite distance yields an empty result, and
  circles discretize at 96 segments like the Esri buffer;
- simplify_geometry is Douglas–Peucker with JTS's minimum-ring-size
  guard.

Documented divergences (COVERAGE.md "geo overlay"): multi-part inputs
are dissolved to their point set before polygon ops, so Esri's
artifacts from part-by-part processing (redundant lower-dimension
pieces such as the LINESTRING in TestGeoFunctions:627, undissolved
part decompositions) do not appear; vertex order/rotation of
constructed rings is canonical-equivalent but not byte-identical to
Esri's; ST_Buffer's non-circular vertex spelling differs (same 96-gon
discretization, different arc phase at joins).
"""

from __future__ import annotations

import math
import re

EPS = 1e-9


def _snap(v: float) -> float:
    r = round(v, 9)
    return 0.0 if r == 0 else r


def _key(p) -> tuple:
    return (_snap(p[0]), _snap(p[1]))


# --------------------------------------------------------------------------
# WKT parse / serialize
# --------------------------------------------------------------------------

_NUM = r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


class Bag:
    """A geometry as three dimension layers."""

    __slots__ = ("points", "paths", "polys")

    def __init__(self, points=None, paths=None, polys=None):
        self.points = points or []   # [(x, y)]
        self.paths = paths or []     # [[(x, y), ...]]  (open vertex lists)
        self.polys = polys or []     # [[ring, ...]]  ring = open vertex list

    def is_empty(self) -> bool:
        return not (self.points or self.paths or self.polys)

    def dims(self):
        out = []
        if self.points:
            out.append(0)
        if self.paths:
            out.append(1)
        if self.polys:
            out.append(2)
        return out


def _parse_ring_text(txt: str):
    pts = []
    for m in re.finditer(rf"({_NUM})\s+({_NUM})", txt):
        pts.append((float(m.group(1)), float(m.group(2))))
    return pts


def _split_top(body: str):
    """Split a WKT body on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def signed_area(ring) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _norm_ring(ring):
    """Drop the closing vertex and consecutive duplicates."""
    if len(ring) > 1 and _key(ring[0]) == _key(ring[-1]):
        ring = ring[:-1]
    out = []
    for p in ring:
        if not out or _key(p) != _key(out[-1]):
            out.append(p)
    return out


def _orient_polygon(rings):
    """Outer ring CCW, holes CW.  The outer ring is the one with the
    largest |area|; every other ring is a hole."""
    rings = [_norm_ring(r) for r in rings]
    rings = [r for r in rings if len(r) >= 3]
    if not rings:
        return None
    rings.sort(key=lambda r: -abs(signed_area(r)))
    out = []
    for i, r in enumerate(rings):
        a = signed_area(r)
        if i == 0:
            out.append(r if a >= 0 else [r[0]] + r[1:][::-1])
        else:
            out.append(r if a <= 0 else [r[0]] + r[1:][::-1])
    return out


def parse_wkt(wkt: str) -> Bag:
    wkt = wkt.strip()
    m = re.match(r"^\s*(\w+)\s*(.*)$", wkt, re.S)
    if not m:
        raise ValueError(f"Invalid WKT: {wkt!r}")
    tag = m.group(1).upper()
    rest = m.group(2).strip()
    bag = Bag()
    if rest.upper() == "EMPTY" or rest == "":
        return bag
    if not (rest.startswith("(") and rest.endswith(")")):
        raise ValueError(f"Invalid WKT: {wkt!r}")
    body = rest[1:-1].strip()
    if tag == "POINT":
        bag.points = _parse_ring_text(body)
    elif tag == "MULTIPOINT":
        bag.points = _parse_ring_text(body)
    elif tag == "LINESTRING":
        bag.paths = [_parse_ring_text(body)]
    elif tag == "MULTILINESTRING":
        bag.paths = [_parse_ring_text(p) for p in _split_top(body)]
    elif tag == "POLYGON":
        rings = [_parse_ring_text(p) for p in _split_top(body)]
        poly = _orient_polygon(rings)
        if poly:
            bag.polys = [poly]
    elif tag == "MULTIPOLYGON":
        for part in _split_top(body):
            rings = [_parse_ring_text(p) for p in _split_top(part.strip()[1:-1])]
            poly = _orient_polygon(rings)
            if poly:
                bag.polys.append(poly)
    elif tag == "GEOMETRYCOLLECTION":
        for part in _split_top(body):
            sub = parse_wkt(part)
            bag.points += sub.points
            bag.paths += sub.paths
            bag.polys += sub.polys
    else:
        raise ValueError(f"Unsupported WKT type: {tag}")
    return bag


def _fmt(v: float) -> str:
    v = _snap(v)
    if float(v).is_integer():
        return str(int(v))
    return repr(v)


def _fmt_pt(p) -> str:
    return f"{_fmt(p[0])} {_fmt(p[1])}"


def _render_points(points, force_multi=False) -> str:
    if len(points) == 1 and not force_multi:
        return f"POINT ({_fmt_pt(points[0])})"
    body = ", ".join(f"({_fmt_pt(p)})" for p in points)
    return f"MULTIPOINT ({body})"


def _render_paths(paths, force_multi=False) -> str:
    if len(paths) == 1 and not force_multi:
        return "LINESTRING (" + ", ".join(_fmt_pt(p) for p in paths[0]) + ")"
    body = ", ".join("(" + ", ".join(_fmt_pt(p) for p in path) + ")" for path in paths)
    return f"MULTILINESTRING ({body})"


def _render_ring(ring) -> str:
    closed = list(ring) + [ring[0]]
    return "(" + ", ".join(_fmt_pt(p) for p in closed) + ")"


def _render_polys(polys, force_multi=False) -> str:
    if len(polys) == 1 and not force_multi:
        return "POLYGON (" + ", ".join(_render_ring(r) for r in polys[0]) + ")"
    body = ", ".join(
        "(" + ", ".join(_render_ring(r) for r in poly) + ")" for poly in polys
    )
    return f"MULTIPOLYGON ({body})"


def render(bag: Bag) -> str:
    dims = bag.dims()
    if not dims:
        return "MULTIPOLYGON EMPTY"
    if dims == [0]:
        return _render_points(bag.points)
    if dims == [1]:
        return _render_paths(bag.paths)
    if dims == [2]:
        return _render_polys(bag.polys)
    parts = []
    if bag.points:
        parts.append(_render_points(bag.points))
    if bag.paths:
        parts.append(_render_paths(bag.paths))
    if bag.polys:
        parts.append(_render_polys(bag.polys))
    return "GEOMETRYCOLLECTION (" + ", ".join(parts) + ")"


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _on_segment(p, a, b) -> bool:
    if abs(_cross(a, b, p)) > EPS * (1 + abs(p[0]) + abs(p[1]) + abs(b[0]) + abs(b[1])):
        return False
    return (
        min(a[0], b[0]) - EPS <= p[0] <= max(a[0], b[0]) + EPS
        and min(a[1], b[1]) - EPS <= p[1] <= max(a[1], b[1]) + EPS
    )


def _seg_params(a, b, c, d):
    """Intersection of segment ab with cd.

    Returns a list of parameters ``t`` in [0, 1] along ab where ab
    meets cd (0-dim crossings and the endpoints of any collinear
    overlap run)."""
    r = (b[0] - a[0], b[1] - a[1])
    s = (d[0] - c[0], d[1] - c[1])
    denom = r[0] * s[1] - r[1] * s[0]
    scale = max(abs(r[0]), abs(r[1]), abs(s[0]), abs(s[1]), 1.0)
    if abs(denom) > EPS * scale * scale:
        t = ((c[0] - a[0]) * s[1] - (c[1] - a[1]) * s[0]) / denom
        u = ((c[0] - a[0]) * r[1] - (c[1] - a[1]) * r[0]) / denom
        if -EPS <= t <= 1 + EPS and -EPS <= u <= 1 + EPS:
            return [min(max(t, 0.0), 1.0)]
        return []
    # parallel: collinear?
    if abs(_cross(a, b, c)) > EPS * scale * scale:
        return []
    rr = r[0] * r[0] + r[1] * r[1]
    if rr < EPS * EPS:
        return []
    t0 = ((c[0] - a[0]) * r[0] + (c[1] - a[1]) * r[1]) / rr
    t1 = ((d[0] - a[0]) * r[0] + (d[1] - a[1]) * r[1]) / rr
    lo, hi = min(t0, t1), max(t0, t1)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    if lo > hi + EPS:
        return []
    return [lo, hi]


def _lerp(a, b, t):
    return (a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t)


def _seg_overlap(a, b, c, d):
    """Collinear overlap run of ab with cd as (t_lo, t_hi) along ab, or
    None."""
    ts = _seg_params(a, b, c, d)
    if len(ts) == 2 and ts[1] - ts[0] > EPS:
        return ts[0], ts[1]
    return None


# --------------------------------------------------------------------------
# point location
# --------------------------------------------------------------------------

def _poly_edges(poly):
    for ring in poly:
        n = len(ring)
        for i in range(n):
            yield ring[i], ring[(i + 1) % n]


def locate_in_polys(p, polys) -> str:
    """'in' | 'on' | 'out' of the union of the given polygons."""
    for poly in polys:
        for a, b in _poly_edges(poly):
            if _on_segment(p, a, b):
                return "on"
    inside = False
    for poly in polys:
        cnt = 0
        for a, b in _poly_edges(poly):
            if (a[1] > p[1]) != (b[1] > p[1]):
                xint = a[0] + (b[0] - a[0]) * (p[1] - a[1]) / (b[1] - a[1])
                if p[0] < xint:
                    cnt += 1
        if cnt % 2 == 1:
            inside = not inside
    return "in" if inside else "out"


def _point_on_paths(p, paths) -> bool:
    for path in paths:
        for i in range(len(path) - 1):
            if _on_segment(p, path[i], path[i + 1]):
                return True
    return False


# --------------------------------------------------------------------------
# polygon boolean ops (fragment classification)
# --------------------------------------------------------------------------

def _directed_edges(polys):
    for poly in polys:
        for a, b in _poly_edges(poly):
            if _key(a) != _key(b):
                yield a, b


def _param_on(a, b, p) -> float:
    dx, dy = b[0] - a[0], b[1] - a[1]
    ln2 = dx * dx + dy * dy
    if ln2 < EPS * EPS:
        return 0.0
    return ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / ln2


def _node_two_sets(edges_a, edges_b):
    """Split both directed edge sets at their mutual intersections.

    Every intersection POINT is computed once and shared by both sides
    (recomputing it from each edge's own parametrization can land the
    two copies on different sides of a snap-grid boundary, which breaks
    fragment adjacency during stitching).  Returns (frags_a, frags_b)."""
    edges_a = list(edges_a)
    edges_b = list(edges_b)
    cuts_a = [{0.0: e[0], 1.0: e[1]} for e in edges_a]
    cuts_b = [{0.0: e[0], 1.0: e[1]} for e in edges_b]
    for ia, (a0, a1) in enumerate(edges_a):
        for ib, (b0, b1) in enumerate(edges_b):
            for t in _seg_params(a0, a1, b0, b1):
                p = _lerp(a0, a1, min(max(t, 0.0), 1.0))
                cuts_a[ia][min(max(t, 0.0), 1.0)] = p
                tb = min(max(_param_on(b0, b1, p), 0.0), 1.0)
                cuts_b[ib][tb] = p

    def frags(cuts):
        out = []
        for cut in cuts:
            ts = sorted(cut)
            for i in range(len(ts) - 1):
                if ts[i + 1] - ts[i] > EPS:
                    p0, p1 = cut[ts[i]], cut[ts[i + 1]]
                    if _key(p0) != _key(p1):
                        out.append((p0, p1))
        return out

    return frags(cuts_a), frags(cuts_b)


def _classify_frag(frag, polys, edges):
    """Classify a directed fragment against a polygon set.

    Returns 'in' | 'out' | 'bnd_same' | 'bnd_opp'."""
    a, b = frag
    mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
    for c, d in edges:
        if _on_segment(mid, c, d):
            dx1, dy1 = b[0] - a[0], b[1] - a[1]
            dx2, dy2 = d[0] - c[0], d[1] - c[1]
            return "bnd_same" if dx1 * dx2 + dy1 * dy2 > 0 else "bnd_opp"
    return "in" if locate_in_polys(mid, polys) == "in" else "out"


def _stitch(frags):
    """Stitch directed fragments into rings.

    At a junction with several outgoing fragments, continue with the
    most-counterclockwise turn (max angle measured CCW from the
    reversed incoming direction), which traces each face keeping the
    interior on the left."""
    by_start = {}
    for f in frags:
        by_start.setdefault(_key(f[0]), []).append(f)
    used = set()
    dead_starts = set()
    rings = []
    for f0 in frags:
        if id(f0) in used or id(f0) in dead_starts:
            continue
        ring = [f0[0]]
        cur = f0
        trail = {id(cur)}
        guard = 0
        closed = False
        while guard < len(frags) + 1:
            guard += 1
            ring.append(cur[1])
            nxt_opts = [
                g
                for g in by_start.get(_key(cur[1]), [])
                if id(g) not in used and id(g) not in trail
            ]
            if not nxt_opts and _key(cur[1]) == _key(f0[0]):
                closed = True
                break
            if not nxt_opts:
                break
            if len(nxt_opts) == 1:
                nxt = nxt_opts[0]
            else:
                ix, iy = cur[0][0] - cur[1][0], cur[0][1] - cur[1][1]
                base = math.atan2(iy, ix)

                def turn(g):
                    ang = math.atan2(g[1][1] - g[0][1], g[1][0] - g[0][0])
                    d = ang - base
                    while d <= 0:
                        d += 2 * math.pi
                    while d > 2 * math.pi:
                        d -= 2 * math.pi
                    return d

                nxt = max(nxt_opts, key=turn)
            # if the walk returned to the start before consuming nxt, close
            if _key(cur[1]) == _key(f0[0]):
                closed = True
                break
            cur = nxt
            trail.add(id(cur))
        if closed:
            # commit: consume the walked fragments only on success, so
            # one broken junction (e.g. a gap left by degenerate input)
            # cannot cascade into losing unrelated rings
            used |= trail
            r = _norm_ring(ring)
            if len(r) >= 3 and abs(signed_area(r)) > EPS:
                rings.append(r)
        else:
            dead_starts.add(id(f0))
    return rings


def _assemble(rings):
    """Group stitched rings into polygons: CCW rings are outers, CW
    rings are holes assigned to the smallest containing outer."""
    outers = [r for r in rings if signed_area(r) > 0]
    holes = [r for r in rings if signed_area(r) < 0]
    polys = [[o] for o in outers]
    for h in holes:
        # representative interior point of the hole: midpoint of a point
        # slightly inside (use first vertex nudged along the normal)
        cands = []
        for i, o in enumerate(outers):
            if locate_in_polys(h[0], [[o]]) != "out" and all(
                locate_in_polys(p, [[o]]) != "out" for p in h[:3]
            ):
                cands.append((abs(signed_area(o)), i))
        if cands:
            cands.sort()
            polys[cands[0][1]].append(h)
    return polys


def poly_boolean(polys_a, polys_b, op: str):
    """op in {'union', 'intersection', 'difference', 'symdifference'}."""
    if op == "symdifference":
        d1 = poly_boolean(polys_a, polys_b, "difference")
        d2 = poly_boolean(polys_b, polys_a, "difference")
        return d1 + d2
    if not polys_a and not polys_b:
        return []
    if not polys_a:
        return [] if op in ("intersection", "difference") else [list(p) for p in polys_b]
    if not polys_b:
        return [] if op == "intersection" else [list(p) for p in polys_a]

    edges_a = list(_directed_edges(polys_a))
    edges_b = list(_directed_edges(polys_b))
    frags_a, frags_b = _node_two_sets(edges_a, edges_b)
    keep = []
    for f in frags_a:
        cls = _classify_frag(f, polys_b, edges_b)
        if op == "union" and cls in ("out", "bnd_same"):
            keep.append(f)
        elif op == "intersection" and cls in ("in", "bnd_same"):
            keep.append(f)
        elif op == "difference" and cls in ("out", "bnd_opp"):
            keep.append(f)
    for f in frags_b:
        cls = _classify_frag(f, polys_a, edges_a)
        if op == "union" and cls == "out":
            keep.append(f)
        elif op == "intersection" and cls == "in":
            keep.append(f)
        elif op == "difference" and cls == "in":
            keep.append((f[1], f[0]))
    rings = _stitch(keep)
    return _assemble(rings)


def dissolve(polys):
    """Union a polygon list into a minimal non-overlapping set."""
    if len(polys) <= 1:
        return [list(p) for p in polys]
    acc = [polys[0]]
    for p in polys[1:]:
        acc = poly_boolean(acc, [p], "union")
    return acc


# --------------------------------------------------------------------------
# line machinery
# --------------------------------------------------------------------------

def _path_segs(paths):
    for path in paths:
        for i in range(len(path) - 1):
            if _key(path[i]) != _key(path[i + 1]):
                yield path[i], path[i + 1]


def clip_paths_to_polys(paths, polys, keep: str):
    """Clip line paths against a polygon set.

    keep='in'  → pieces inside or on the boundary (ST_Intersection),
                 plus isolated boundary-touch points;
    keep='out' → pieces strictly outside (ST_Difference).
    Returns (paths, touch_points)."""
    edges = list(_directed_edges(polys))
    out_paths = []
    touch_pts = []
    kept_keys = set()
    for path in paths:
        cur = []
        for i in range(len(path) - 1):
            a, b = path[i], path[i + 1]
            if _key(a) == _key(b):
                continue
            ts = {0.0, 1.0}
            for c, d in edges:
                for t in _seg_params(a, b, c, d):
                    ts.add(min(max(t, 0.0), 1.0))
            ts = sorted(ts)
            for j in range(len(ts) - 1):
                if ts[j + 1] - ts[j] <= EPS:
                    continue
                p0, p1 = _lerp(a, b, ts[j]), _lerp(a, b, ts[j + 1])
                mid = ((p0[0] + p1[0]) / 2, (p0[1] + p1[1]) / 2)
                loc = locate_in_polys(mid, polys)
                ok = (loc != "out") if keep == "in" else (loc == "out")
                if ok:
                    if cur and _key(cur[-1]) == _key(p0):
                        cur.append(p1)
                    else:
                        if len(cur) >= 2:
                            out_paths.append(cur)
                        cur = [p0, p1]
                    kept_keys.add(_key(p0))
                    kept_keys.add(_key(p1))
                else:
                    if len(cur) >= 2:
                        out_paths.append(cur)
                    cur = []
        if len(cur) >= 2:
            out_paths.append(cur)
    if keep == "in":
        # isolated touch points: path meets the boundary at a point not
        # covered by any kept piece
        for path in paths:
            for i in range(len(path) - 1):
                a, b = path[i], path[i + 1]
                for c, d in edges:
                    for t in _seg_params(a, b, c, d):
                        p = _key(_lerp(a, b, t))
                        if p not in kept_keys and locate_in_polys(p, polys) != "in":
                            if p not in {_key(q) for q in touch_pts}:
                                touch_pts.append(p)
    return out_paths, touch_pts


def line_line_overlap_and_points(paths_a, paths_b):
    """Intersection of two line sets: (overlap_paths, isolated_points)."""
    overlaps = []
    pts = []
    segs_b = list(_path_segs(paths_b))
    for a, b in _path_segs(paths_a):
        for c, d in segs_b:
            ov = _seg_overlap(a, b, c, d)
            if ov:
                overlaps.append([_lerp(a, b, ov[0]), _lerp(a, b, ov[1])])
            else:
                for t in _seg_params(a, b, c, d):
                    pts.append(_lerp(a, b, t))
    # drop points covered by an overlap piece
    keep_pts = []
    seen = set()
    for p in pts:
        k = _key(p)
        if k in seen:
            continue
        seen.add(k)
        if not _point_on_paths(p, overlaps):
            keep_pts.append(p)
    return _merge_collinear_paths(overlaps), keep_pts


def subtract_lines(paths_a, paths_b):
    """paths_a minus the collinear overlap with paths_b (0-dim crossings
    do not remove measure, matching the reference's ST_Difference)."""
    segs_b = list(_path_segs(paths_b))
    out = []
    for path in paths_a:
        cur = []
        for i in range(len(path) - 1):
            a, b = path[i], path[i + 1]
            if _key(a) == _key(b):
                continue
            cuts = []
            for c, d in segs_b:
                ov = _seg_overlap(a, b, c, d)
                if ov:
                    cuts.append(ov)
            cuts.sort()
            pieces = []
            t = 0.0
            for lo, hi in cuts:
                if lo - t > EPS:
                    pieces.append((t, lo))
                t = max(t, hi)
            if 1.0 - t > EPS:
                pieces.append((t, 1.0))
            # walk pieces, stitching continuity
            covered_from_start = cuts and cuts[0][0] <= EPS
            for (lo, hi) in pieces:
                p0, p1 = _lerp(a, b, lo), _lerp(a, b, hi)
                if cur and _key(cur[-1]) == _key(p0):
                    cur.append(p1)
                else:
                    if len(cur) >= 2:
                        out.append(cur)
                    cur = [p0, p1]
            if cuts and cuts[-1][1] >= 1.0 - EPS:
                if len(cur) >= 2:
                    out.append(cur)
                cur = []
            _ = covered_from_start
        if len(cur) >= 2:
            out.append(cur)
    return out


def _merge_collinear_paths(paths):
    """Merge overlapping/adjacent collinear 2-point runs into maximal
    runs (used for overlap output)."""
    changed = True
    paths = [list(p) for p in paths]
    while changed:
        changed = False
        for i in range(len(paths)):
            for j in range(i + 1, len(paths)):
                a0, a1 = paths[i][0], paths[i][-1]
                b0, b1 = paths[j][0], paths[j][-1]
                if len(paths[i]) == 2 and len(paths[j]) == 2:
                    ov = _seg_overlap(a0, a1, b0, b1)
                    same_line = abs(_cross(a0, a1, b0)) <= EPS and abs(
                        _cross(a0, a1, b1)
                    ) <= EPS
                    touches = ov is not None or (
                        same_line
                        and (
                            _key(a0) in (_key(b0), _key(b1))
                            or _key(a1) in (_key(b0), _key(b1))
                        )
                    )
                    if same_line and touches:
                        rr = (a1[0] - a0[0], a1[1] - a0[1])
                        rrn = rr[0] * rr[0] + rr[1] * rr[1]
                        if rrn < EPS * EPS:
                            continue
                        ts = []
                        for p in (a0, a1, b0, b1):
                            ts.append(
                                (
                                    (p[0] - a0[0]) * rr[0]
                                    + (p[1] - a0[1]) * rr[1]
                                )
                                / rrn
                            )
                        lo, hi = min(ts), max(ts)
                        paths[i] = [_lerp(a0, a1, lo), _lerp(a0, a1, hi)]
                        paths.pop(j)
                        changed = True
                        break
            if changed:
                break
    return paths


def merge_paths_at_endpoints(paths):
    """Chain-merge paths that share endpoints where exactly two path
    ends meet (the reference's touching line union)."""
    paths = [list(p) for p in paths]
    # dedupe exact duplicates (either direction)
    seen = {}
    uniq = []
    for p in paths:
        k = tuple(_key(q) for q in p)
        rk = tuple(reversed(k))
        if k in seen or rk in seen:
            continue
        seen[k] = True
        uniq.append(p)
    paths = uniq
    changed = True
    while changed:
        changed = False
        # count endpoint degrees
        deg = {}
        for p in paths:
            for e in (_key(p[0]), _key(p[-1])):
                deg[e] = deg.get(e, 0) + 1
        for i in range(len(paths)):
            done = False
            for j in range(i + 1, len(paths)):
                a, b = paths[i], paths[j]
                for flip_a in (False, True):
                    for flip_b in (False, True):
                        pa = a[::-1] if flip_a else a
                        pb = b[::-1] if flip_b else b
                        if _key(pa[-1]) == _key(pb[0]) and deg.get(_key(pa[-1]), 0) == 2:
                            paths[i] = pa + pb[1:]
                            paths.pop(j)
                            changed = done = True
                            break
                    if done:
                        break
                if done:
                    break
            if done:
                break
    return paths


# --------------------------------------------------------------------------
# top-level ops on bags
# --------------------------------------------------------------------------

def _dedupe_points(points):
    out, seen = [], set()
    for p in points:
        k = _key(p)
        if k not in seen:
            seen.add(k)
            out.append(p)
    return out


def _point_in_bag(p, bag: Bag, closure=True) -> bool:
    if any(_key(p) == _key(q) for q in bag.points):
        return True
    if _point_on_paths(p, bag.paths):
        return True
    loc = locate_in_polys(p, bag.polys) if bag.polys else "out"
    return loc == "in" or (closure and loc == "on")


def union(a: Bag, b: Bag) -> Bag:
    out = Bag()
    out.points = _dedupe_points(a.points + b.points)
    out.paths = merge_paths_at_endpoints(a.paths + b.paths)
    out.polys = dissolve(a.polys + b.polys)
    return out


def intersection(a: Bag, b: Bag) -> Bag:
    out = Bag()
    # points of either side that lie on the other
    for p in a.points:
        if _point_in_bag(p, b):
            out.points.append(p)
    for p in b.points:
        if _point_in_bag(p, a):
            out.points.append(p)
    # line x line
    ov, pts = line_line_overlap_and_points(a.paths, b.paths)
    out.paths += ov
    out.points += pts
    # line x polygon (both directions)
    if a.paths and b.polys:
        kept, touch = clip_paths_to_polys(a.paths, b.polys, "in")
        out.paths += kept
        out.points += touch
    if b.paths and a.polys:
        kept, touch = clip_paths_to_polys(b.paths, a.polys, "in")
        out.paths += kept
        out.points += touch
    # polygon x polygon
    if a.polys and b.polys:
        da, db = dissolve(a.polys), dissolve(b.polys)
        out.polys = poly_boolean(da, db, "intersection")
        # Shared-boundary overlap the 2-D faces lose when the inputs
        # touch only along an edge or a corner
        # (TestGeoFunctions.java:636-638 pins LINESTRING (0 0, 0 1) /
        # LINESTRING (1 0, 2 0) / POINT (0 0) for touching envelopes):
        # collect boundary fragments of A lying on B's boundary, and
        # isolated boundary-touch points, then dedupe against the
        # higher-dimension output.
        edges_a = list(_directed_edges(da))
        edges_b = list(_directed_edges(db))
        frags_a, _unused = _node_two_sets(edges_a, edges_b)
        shared = []
        for f in frags_a:
            if _classify_frag(f, db, edges_b) in ("bnd_same", "bnd_opp"):
                mid = ((f[0][0] + f[1][0]) / 2, (f[0][1] + f[1][1]) / 2)
                if not out.polys or locate_in_polys(mid, out.polys) == "out":
                    # polygon boundaries carry no canonical direction;
                    # the reference emits these fragments smaller
                    # endpoint first (LINESTRING (0 0, 0 1), :636)
                    p0, p1 = sorted((f[0], f[1]))
                    shared.append([p0, p1])
        if shared:
            out.paths = merge_paths_at_endpoints(out.paths + shared)
        # corner/point contact: boundary-boundary intersection points
        for a0, a1 in edges_a:
            for b0, b1 in edges_b:
                for t in _seg_params(a0, a1, b0, b1):
                    p = _lerp(a0, a1, min(max(t, 0.0), 1.0))
                    if (
                        (not out.polys
                         or locate_in_polys(p, out.polys) == "out")
                        and not _point_on_paths(p, out.paths)
                    ):
                        out.points.append(p)
    out.points = _dedupe_points(
        [p for p in out.points if not _point_on_paths(p, out.paths)
         and (not out.polys or locate_in_polys(p, out.polys) == "out")]
    )
    return out


def difference(a: Bag, b: Bag) -> Bag:
    out = Bag()
    out.points = [p for p in a.points if not _point_in_bag(p, b)]
    paths = a.paths
    if paths and b.paths:
        paths = subtract_lines(paths, b.paths)
    if paths and b.polys:
        paths, _ = clip_paths_to_polys(paths, b.polys, "out")
    out.paths = paths
    if a.polys:
        out.polys = (
            poly_boolean(dissolve(a.polys), dissolve(b.polys), "difference")
            if b.polys
            else [list(p) for p in a.polys]
        )
    return out


def symdifference(a: Bag, b: Bag) -> Bag:
    out = Bag()
    out.points = _dedupe_points(
        [p for p in a.points if not _point_in_bag(p, b)]
        + [p for p in b.points if not _point_in_bag(p, a)]
    )
    pa = subtract_lines(a.paths, b.paths) if b.paths else a.paths
    if pa and b.polys:
        pa, _ = clip_paths_to_polys(pa, b.polys, "out")
    pb = subtract_lines(b.paths, a.paths) if a.paths else b.paths
    if pb and a.polys:
        pb, _ = clip_paths_to_polys(pb, a.polys, "out")
    out.paths = pa + pb
    if a.polys or b.polys:
        out.polys = poly_boolean(
            dissolve(a.polys), dissolve(b.polys), "symdifference"
        )
    return out


# --------------------------------------------------------------------------
# simplify (JTS TopologyPreservingSimplifier semantics — the reference
# statically imports org.locationtech.jts.simplify.
# TopologyPreservingSimplifier.simplify, GeoFunctions.java:113,817)
# --------------------------------------------------------------------------

def _seg_distance(p, a, b) -> float:
    """Distance from p to the closed segment ab (JTS LineSegment.distance)."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    ln2 = dx * dx + dy * dy
    if ln2 < EPS * EPS:
        return math.hypot(p[0] - a[0], p[1] - a[1])
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / ln2
    t = min(max(t, 0.0), 1.0)
    q = (a[0] + t * dx, a[1] + t * dy)
    return math.hypot(p[0] - q[0], p[1] - q[1])


def _interior_intersects(a, b, c, d) -> bool:
    """True if segments ab, cd intersect at a point interior to either
    segment (shared endpoints are allowed) — JTS isInteriorIntersection."""
    ts = _seg_params(a, b, c, d)
    ends_ab = (_key(a), _key(b))
    ends_cd = (_key(c), _key(d))
    for t in ts:
        p = _key(_lerp(a, b, t))
        if p not in ends_ab or p not in ends_cd:
            return True
    return False


def _tps_line(closed_pts, tol, min_size, other_segs):
    """JTS TaggedLineStringSimplifier over one coordinate sequence
    (first == last for rings).  ``min_size`` is the minimum result
    coordinate count (4 for rings, 2 for lines); ``other_segs`` are the
    input segments of the geometry's other components, checked (along
    with this line's own out-of-section segments) for interior
    intersections before a section may flatten."""
    pts = closed_pts
    n = len(pts)
    own_segs = [(pts[k], pts[k + 1]) for k in range(n - 1)]
    result = []  # list of (i, j) flattened sections in order

    def result_size():
        return len(result) + 1 if result else 0

    def bad_intersection(i, j):
        a, b = pts[i], pts[j]
        for k, (c, d) in enumerate(own_segs):
            if i <= k < j:
                continue
            if _interior_intersects(a, b, c, d):
                return True
        for c, d in other_segs:
            if _interior_intersects(a, b, c, d):
                return True
        return False

    def rec(i, j, depth):
        depth += 1
        if i + 1 == j:
            result.append((i, j))
            return
        valid = True
        if result_size() < min_size and depth + 1 < min_size:
            valid = False
        dmax, fi = -1.0, i + 1
        for k in range(i + 1, j):
            d = _seg_distance(pts[k], pts[i], pts[j])
            if d > dmax:
                dmax, fi = d, k
        if dmax > tol:
            valid = False
        if valid and bad_intersection(i, j):
            valid = False
        if valid:
            result.append((i, j))
            return
        rec(i, fi, depth)
        rec(fi, j, depth)

    rec(0, n - 1, 0)
    out = [pts[result[0][0]]]
    for (_i, j) in result:
        out.append(pts[j])
    return out


def simplify_bag(bag: Bag, tol: float) -> Bag:
    out = Bag(points=list(bag.points))
    out.paths = [
        _tps_line(list(p), tol, 2, []) for p in bag.paths if len(p) >= 2
    ]
    for poly in bag.polys:
        all_rings = [list(r) + [r[0]] for r in poly]
        rings = []
        for ri, ring in enumerate(all_rings):
            other = []
            for rj, other_ring in enumerate(all_rings):
                if rj != ri:
                    other += [
                        (other_ring[k], other_ring[k + 1])
                        for k in range(len(other_ring) - 1)
                    ]
            simp = _norm_ring(_tps_line(ring, tol, 4, other))
            if len(simp) >= 3 and abs(signed_area(simp)) > EPS:
                rings.append(simp)
        if rings:
            out.polys.append(_orient_polygon(rings))
    return out


# --------------------------------------------------------------------------
# buffer
# --------------------------------------------------------------------------

_BUFFER_SEGS = 96  # the Esri buffer's circle discretization


def _circle(c, r, segs=_BUFFER_SEGS):
    ring = []
    for k in range(segs):
        th = 2 * math.pi * k / segs
        ring.append((c[0] + r * math.cos(th), c[1] + r * math.sin(th)))
    return [ring]  # CCW


def _stadium(a, b, r, segs=_BUFFER_SEGS):
    """Buffer of segment ab: rectangle + semicircular caps, as one CCW
    ring (start on the right side of a→b, cap at b sweeping CCW through
    the outward direction, back along the left side, cap at a)."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    ln = math.hypot(dx, dy)
    if ln < EPS:
        return _circle(a, r, segs)
    ux, uy = dx / ln, dy / ln
    nx, ny = -uy, ux  # left normal
    th_n = math.atan2(ny, nx)
    half = segs // 2
    ring = [(a[0] - r * nx, a[1] - r * ny), (b[0] - r * nx, b[1] - r * ny)]
    for k in range(1, half):
        th = th_n - math.pi + math.pi * k / half
        ring.append((b[0] + r * math.cos(th), b[1] + r * math.sin(th)))
    ring.append((b[0] + r * nx, b[1] + r * ny))
    ring.append((a[0] + r * nx, a[1] + r * ny))
    for k in range(1, half):
        th = th_n + math.pi * k / half
        ring.append((a[0] + r * math.cos(th), a[1] + r * math.sin(th)))
    return [ring]


def _is_convex_ccw(ring) -> bool:
    n = len(ring)
    for i in range(n):
        if _cross(ring[i], ring[(i + 1) % n], ring[(i + 2) % n]) < -EPS:
            return False
    return True


def _buffer_convex_ring(ring, r, segs=_BUFFER_SEGS):
    """Direct buffer boundary of a convex CCW ring: offset sides joined
    by vertex arcs (exact start/end angles + the absolute angular grid
    in between).  No union needed — adjacent stadiums' caps overlap on
    the SAME circle, which makes union-of-parts numerically fragile
    (near-coincident chords defeat on-boundary classification; caught
    by the hypothesis inclusion-exclusion suite)."""
    n = len(ring)
    out = []
    step = 2 * math.pi / segs
    for i in range(n):
        prev_a, v, nxt = ring[i - 1], ring[i], ring[(i + 1) % n]
        d1x, d1y = v[0] - prev_a[0], v[1] - prev_a[1]
        d2x, d2y = nxt[0] - v[0], nxt[1] - v[1]
        # outward offset for a CCW ring is the RIGHT normal (dy, -dx)
        a1 = math.atan2(-d1x, d1y)  # right-normal angle of incoming edge
        a2 = math.atan2(-d2x, d2y)  # right-normal angle of outgoing edge
        # convex CCW turn: the outward normal rotates CCW → sweep UP
        while a2 < a1 - EPS:
            a2 += 2 * math.pi
        # exact start, absolute-grid interior (ascending), exact end
        out.append((v[0] + r * math.cos(a1), v[1] + r * math.sin(a1)))
        ang = (math.floor(a1 / step) + 1) * step
        if ang <= a1 + EPS:
            ang += step
        while ang < a2 - EPS:
            out.append((v[0] + r * math.cos(ang), v[1] + r * math.sin(ang)))
            ang += step
        out.append((v[0] + r * math.cos(a2), v[1] + r * math.sin(a2)))
        # straight side along the outgoing edge's offset
        out.append((nxt[0] + r * math.cos(a2), nxt[1] + r * math.sin(a2)))
    return _norm_ring(out)


def buffer_bag(bag: Bag, dist: float) -> Bag:
    parts = []
    direct = []
    for p in bag.points:
        parts.append(_circle(p, dist))
    for path in bag.paths:
        for i in range(len(path) - 1):
            if _key(path[i]) != _key(path[i + 1]):
                parts.append(_stadium(path[i], path[i + 1], dist))
        if len(path) == 1:
            parts.append(_circle(path[0], dist))
    for poly in bag.polys:
        if len(poly) == 1 and _is_convex_ccw(poly[0]):
            direct.append([_buffer_convex_ring(poly[0], dist)])
        else:
            parts.append([list(r) for r in poly])
            for a, b in _poly_edges(poly):
                if _key(a) != _key(b):
                    parts.append(_stadium(a, b, dist))
    if parts:
        direct += parts
        return Bag(polys=dissolve(direct))
    if len(direct) > 1:
        return Bag(polys=dissolve(direct))
    return Bag(polys=direct)


# --------------------------------------------------------------------------
# DE-9IM / ST_Relate
# --------------------------------------------------------------------------

def _boundary_of(bag: Bag) -> Bag:
    """Topological boundary: polygon rings as lines; non-closed path
    endpoints as points (mod-2 rule); points have empty boundary."""
    out = Bag()
    for poly in bag.polys:
        for ring in poly:
            out.paths.append(list(ring) + [ring[0]])
    cnt = {}
    for path in bag.paths:
        for e in (path[0], path[-1]):
            k = _key(e)
            cnt[k] = cnt.get(k, 0) + 1
    out.points = [k for k, v in cnt.items() if v % 2 == 1]
    return out


def _max_dim(bag: Bag) -> int:
    if bag.polys:
        return 2
    if bag.paths:
        return 1
    if bag.points:
        return 0
    return -1


def _interior_bag(bag: Bag) -> tuple:
    """(polys, paths, points) representing the interior layers."""
    return bag.polys, bag.paths, bag.points


def _dim_intersection(a: Bag, b: Bag, a_open: bool, b_open: bool) -> int:
    """Dimension of the intersection of two bags, where 'open' means
    the polygons contribute their interiors only (boundary excluded)
    and paths exclude their endpoints."""
    # 2-dim
    if a.polys and b.polys:
        inter = poly_boolean(dissolve(a.polys), dissolve(b.polys), "intersection")
        if inter:
            return 2
    best = -1
    # 1-dim candidates
    if a.paths and b.paths:
        ov, pts = line_line_overlap_and_points(a.paths, b.paths)
        if ov:
            best = max(best, 1)
        else:
            for p in pts:
                if a_open and _is_path_endpoint(p, a.paths):
                    continue
                if b_open and _is_path_endpoint(p, b.paths):
                    continue
                best = max(best, 0)
    if a.paths and b.polys:
        best = max(best, _line_poly_dim(a.paths, b.polys, b_open, a_open))
    if b.paths and a.polys:
        best = max(best, _line_poly_dim(b.paths, a.polys, a_open, b_open))
    for p in a.points:
        if _pt_in_layers(p, b, b_open):
            best = max(best, 0)
    for p in b.points:
        if _pt_in_layers(p, a, a_open):
            best = max(best, 0)
    return best


def _is_path_endpoint(p, paths) -> bool:
    k = _key(p)
    return any(k in (_key(path[0]), _key(path[-1])) for path in paths)


def _line_poly_dim(paths, polys, poly_open: bool, path_open: bool) -> int:
    kept, touch = clip_paths_to_polys(paths, polys, "in")
    if poly_open:
        strict = []
        for piece in kept:
            mid = (
                (piece[0][0] + piece[1][0]) / 2,
                (piece[0][1] + piece[1][1]) / 2,
            )
            if locate_in_polys(mid, polys) == "in":
                strict.append(piece)
        if strict:
            return 1
        return -1
    if kept:
        return 1
    if touch:
        return 0
    return -1


def _pt_in_layers(p, bag: Bag, open_: bool) -> bool:
    if any(_key(p) == _key(q) for q in bag.points):
        return True
    if bag.paths:
        on = _point_on_paths(p, bag.paths)
        if on and not (open_ and _is_path_endpoint(p, bag.paths)):
            return True
        if on and not open_:
            return True
    if bag.polys:
        loc = locate_in_polys(p, bag.polys)
        if loc == "in":
            return True
        if loc == "on" and not open_:
            return True
    return False


def de9im(a: Bag, b: Bag) -> str:
    """Compute the DE-9IM matrix as a 9-char string (row-major
    II IB IE / BI BB BE / EI EB EE), entries in {F, 0, 1, 2}."""
    ba, bb = _boundary_of(a), _boundary_of(b)
    # interiors: for polygons the open set; for lines the path minus
    # endpoints; for points the points themselves
    entries = []

    def dim_char(d):
        return "F" if d < 0 else str(d)

    # I(A) ∩ I(B)
    entries.append(_dim_intersection(a, b, True, True))
    # I(A) ∩ B(B)
    entries.append(_dim_intersection(a, bb, True, False))
    # I(A) ∩ E(B)
    entries.append(_dim_exterior(a, b, True))
    # B(A) ∩ I(B)
    entries.append(_dim_intersection(ba, b, False, True))
    # B(A) ∩ B(B)
    entries.append(_dim_intersection(ba, bb, False, False))
    # B(A) ∩ E(B)
    entries.append(_dim_exterior(ba, b, False))
    # E(A) ∩ I(B)
    entries.append(_dim_exterior(b, a, True))
    # E(A) ∩ B(B)
    entries.append(_dim_exterior(bb, a, False))
    # E(A) ∩ E(B)
    entries.append(2)
    return "".join(dim_char(d) for d in entries)


def _dim_exterior(a: Bag, b: Bag, a_open: bool) -> int:
    """Dimension of (interior-or-boundary layers of a) ∩ exterior(b)."""
    best = -1
    if a.polys:
        rem = (
            poly_boolean(dissolve(a.polys), dissolve(b.polys), "difference")
            if b.polys
            else [list(p) for p in a.polys]
        )
        if rem:
            return 2
    if a.paths:
        paths = a.paths
        if b.polys:
            paths, _ = clip_paths_to_polys(paths, b.polys, "out")
        else:
            paths = [list(p) for p in paths]
        if paths and b.paths:
            paths = subtract_lines(paths, b.paths)
        if paths:
            best = max(best, 1)
    for p in a.points:
        if not _point_in_bag(p, b):
            best = max(best, 0)
    return best


def relate_match(matrix: str, pattern: str) -> bool:
    if len(pattern) != 9:
        raise ValueError(f"Invalid DE-9IM pattern: {pattern!r}")
    for mc, pc in zip(matrix, pattern.upper()):
        if pc == "*":
            continue
        if pc == "T":
            if mc == "F":
                return False
        elif pc != mc:
            return False
    return True


# --------------------------------------------------------------------------
# KdbTree spatial partitioning
#
# Reference: presto-geospatial-toolkit/.../KdbTree.java (buildKdbTree
# :270 — median split over the longer side, duplicate-value skip,
# midpoint between middle and next distinct value, preorder leaf ids),
# Rectangle.java (:85 inclusive intersects), KdbTreeUtils.java (JSON
# codec), GeoFunctions.java spatialPartitions (:1130-1199, half-open
# single-partition rule for points).  This is the 2-D K-D-B tree of
# Robinson (SIGMOD '81); the build below follows the reference's
# documented splitting rules so leaf ids and extents line up with the
# reference's own TestGeoFunctions partition-id expectations.
# --------------------------------------------------------------------------


def _rect_intersects(a, b) -> bool:
    return (
        a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]
    )


_KDB_MAX_LEVELS = 10_000


def build_kdb_tree(max_items: int, extent, items):
    """Build the K-D-B tree over item envelopes (xmin, ymin, xmax, ymax).

    Returns the root node as a dict mirroring the reference's Jackson
    layout: leaves ``{"extent": {...}, "leafId": n}``, internals
    ``{"extent": {...}, "left": ..., "right": ...}``."""
    if max_items <= 0:
        raise ValueError("maxItemsPerNode must be > 0")
    next_id = [0]

    def rect_json(r):
        return {"xmin": r[0], "ymin": r[1], "xmax": r[2], "ymax": r[3]}

    def leaf(ext):
        node = {"extent": rect_json(ext), "leafId": next_id[0]}
        next_id[0] += 1
        return node

    def try_split(by_x, ext, its):
        if by_x:
            key = lambda r: (r[0], r[1])  # noqa: E731
            val = lambda r: r[0]  # noqa: E731
        else:
            key = lambda r: (r[1], r[0])  # noqa: E731
            val = lambda r: r[1]  # noqa: E731
        s = sorted(its, key=key)
        middle = (len(s) - 1) // 2
        split_value = val(s[middle])
        split_index = middle
        while split_index < len(s) and val(s[split_index]) == split_value:
            split_index += 1
        if split_index == len(s):
            return None
        split_value = (split_value + val(s[split_index])) / 2
        lo = ext[0] if by_x else ext[1]
        hi = ext[2] if by_x else ext[3]
        if not (lo < split_value < hi):
            return None
        if by_x:
            left_ext = (ext[0], ext[1], split_value, ext[3])
            right_ext = (split_value, ext[1], ext[2], ext[3])
        else:
            left_ext = (ext[0], ext[1], ext[2], split_value)
            right_ext = (ext[0], split_value, ext[2], ext[3])
        return left_ext, s[:split_index], right_ext, s[split_index:]

    def build(level, ext, its):
        if len(its) <= max_items or level == _KDB_MAX_LEVELS:
            return leaf(ext)
        by_x_first = (ext[2] - ext[0]) >= (ext[3] - ext[1])
        split = try_split(by_x_first, ext, its) or try_split(
            not by_x_first, ext, its
        )
        if split is None:
            return leaf(ext)
        le, li, re_, ri = split
        return {
            "extent": rect_json(ext),
            "left": build(level + 1, le, li),
            "right": build(level + 1, re_, ri),
        }

    return {"root": build(0, tuple(extent), list(items))}


def kdb_tree_to_json(tree) -> str:
    import json as _json

    return _json.dumps(tree, separators=(",", ":"))


def kdb_tree_from_json(s: str):
    import json as _json

    tree = _json.loads(s)

    def norm_rect(r):
        low = {k.lower(): v for k, v in r.items()}
        return {
            "xmin": low["xmin"], "ymin": low["ymin"],
            "xmax": low["xmax"], "ymax": low["ymax"],
        }

    def norm(node):
        out = {"extent": norm_rect(node["extent"])}
        if node.get("leafId") is not None:
            out["leafId"] = node["leafId"]
        if node.get("left"):
            out["left"] = norm(node["left"])
        if node.get("right"):
            out["right"] = norm(node["right"])
        return out

    return {"root": norm(tree["root"])}


def _kdb_leaves(node, env, out):
    ext = node["extent"]
    r = (ext["xmin"], ext["ymin"], ext["xmax"], ext["ymax"])
    if env is not None and not _rect_intersects(r, env):
        return
    if "leafId" in node:
        out.append((node["leafId"], r))
    else:
        _kdb_leaves(node["left"], env, out)
        _kdb_leaves(node["right"], env, out)


def envelope_of(bag: Bag):
    """(xmin, ymin, xmax, ymax) over every layer, or None if empty."""
    xs, ys = [], []
    for p in bag.points:
        xs.append(p[0])
        ys.append(p[1])
    for path in bag.paths:
        for p in path:
            xs.append(p[0])
            ys.append(p[1])
    for poly in bag.polys:
        for ring in poly:
            for p in ring:
                xs.append(p[0])
                ys.append(p[1])
    if not xs:
        return None
    return (min(xs), min(ys), max(xs), max(ys))


def spatial_partitions(tree, wkt: str, distance=None):
    """GeoFunctions.spatialPartitions (:1130): partition ids whose leaf
    extent intersects the geometry envelope (expanded by ``distance``
    when given); NULL for empty geometries; a zero-size envelope maps
    to at most ONE partition via the half-open (exclude right/upper
    edge) rule."""
    if distance is not None:
        d = float(distance)
        if math.isnan(d):
            raise ValueError("distance is NaN")
        if math.isinf(d):
            raise ValueError("distance is infinite")
        if d < 0:
            raise ValueError("distance is negative")
    env = envelope_of(parse_wkt(wkt))
    if env is None:
        return None
    if distance is not None:
        d = float(distance)
        env = (env[0] - d, env[1] - d, env[2] + d, env[3] + d)
    leaves = []
    _kdb_leaves(tree["root"], env, leaves)
    if not leaves:
        return []
    if env[2] - env[0] == 0 and env[3] - env[1] == 0:
        for leaf_id, r in leaves:
            if env[0] < r[2] and env[1] < r[3]:
                return [leaf_id]
        raise ValueError(
            f"Cannot find half-open partition extent for a point: "
            f"({env[0]}, {env[1]})"
        )
    return [leaf_id for leaf_id, _ in leaves]


def build_spatial_partitioning(wkts, partition_count: int) -> str:
    """SpatialPartitioningInternalAggregateFunction.output (:88-104):
    merged extent padded by one ulp on the right/upper sides, max items
    per node = ceil(samples / partitionCount), KdbTree over the item
    envelopes, serialized as JSON."""
    items = []
    extent = None
    for w in wkts:
        env = envelope_of(parse_wkt(w))
        if env is None:
            continue
        items.append(env)
        if extent is None:
            extent = env
        else:
            extent = (
                min(extent[0], env[0]), min(extent[1], env[1]),
                max(extent[2], env[2]), max(extent[3], env[3]),
            )
    if not items:
        return None
    padded = (
        extent[0], extent[1],
        math.nextafter(extent[2], math.inf),
        math.nextafter(extent[3], math.inf),
    )
    max_items = (len(items) + partition_count - 1) // partition_count
    return kdb_tree_to_json(build_kdb_tree(max_items, padded, items))


# --------------------------------------------------------------------------
# canonical comparison helpers (used by tests)
# --------------------------------------------------------------------------

def _strip_collinear(ring):
    out = list(ring)
    changed = True
    while changed and len(out) > 3:
        changed = False
        for i in range(len(out)):
            a = out[i - 1]
            b = out[i]
            c = out[(i + 1) % len(out)]
            if abs(_cross(a, c, b)) <= EPS and _on_segment(b, a, c):
                out.pop(i)
                changed = True
                break
    return out


def canonical(wkt: str) -> tuple:
    """Canonical, spelling-insensitive form of a geometry for equality
    tests: points as a sorted set; lines as a noded, merged segment
    set; polygons as collinear-free, lex-rotated, orientation-
    normalized sorted rings."""
    bag = parse_wkt(wkt)
    pts = tuple(sorted({_key(p) for p in bag.points}))
    segs = set()
    allsegs = list(_path_segs(bag.paths))
    for a, b in allsegs:
        ts = {0.0, 1.0}
        for c, d in allsegs:
            for t in _seg_params(a, b, c, d):
                ts.add(min(max(t, 0.0), 1.0))
        ts = sorted(ts)
        for i in range(len(ts) - 1):
            if ts[i + 1] - ts[i] > EPS:
                p0, p1 = _key(_lerp(a, b, ts[i])), _key(_lerp(a, b, ts[i + 1]))
                segs.add(tuple(sorted((p0, p1))))
    # merge collinear adjacent noded segments into maximal runs
    merged = _merge_collinear_paths([[s[0], s[1]] for s in sorted(segs)])
    lines = tuple(
        sorted(tuple(sorted((_key(p[0]), _key(p[-1])))) for p in merged)
    )
    polys = []
    for poly in bag.polys:
        rings = []
        for ring in poly:
            r = _strip_collinear(_norm_ring(ring))
            if signed_area(r) < 0:
                r = [r[0]] + r[1:][::-1]
            k = min(range(len(r)), key=lambda i: _key(r[i]))
            r = r[k:] + r[:k]
            rings.append(tuple(_key(p) for p in r))
        polys.append(tuple(sorted(rings)))
    return (pts, lines, tuple(sorted(polys)))


# --------------------------------------------------------------------------
# relation predicates + ST_Distance (round 8)
#
# Reference: GeoFunctions.java stContains (:993), stWithin (:1118),
# stIntersects (:1050), stDisjoint (:653), stTouches (:1094), stCrosses
# (:665), stOverlaps (:1106), stEquals (:680), stDistance (:698).  The
# reference delegates to Esri OperatorSimpleRelation subclasses; here
# every predicate reads off the DE-9IM matrix computed by de9im() above
# (the standard OGC SFS pattern definitions), with direct fast paths
# for the two shapes that dominate spatial joins — point↔point distance
# and polygon↔point containment — so the join refine stays O(ring
# vertices) per pair instead of paying the full matrix construction.
# --------------------------------------------------------------------------

_DISJOINT_PAT = "FF*FF****"
_TOUCH_PATS = ("FT*******", "F**T*****", "F***T****")


def relation(op: str, wa: str, wb: str) -> bool:
    """Evaluate an OGC relation predicate (by lowercase name) on two
    WKT strings.  ``within`` swaps to ``contains``; EMPTY operands
    follow the reference: disjoint → true, equals → both-empty,
    everything else → false."""
    if op == "within":
        wa, wb, op = wb, wa, "contains"
    a, b = parse_wkt(wa), parse_wkt(wb)
    ea, eb = a.is_empty(), b.is_empty()
    if ea or eb:
        if op == "disjoint":
            return True
        if op == "equals":
            return ea and eb
        return False
    # fast path: polygon-only vs point-only (the contains-join shape).
    # OGC semantics: every point in the closure, at least one interior.
    if not a.paths and not b.paths and not b.polys:
        if a.polys and not a.points:
            locs = [locate_in_polys(p, a.polys) for p in b.points]
            if op == "contains":
                return all(s != "out" for s in locs) and "in" in locs
            if op == "intersects":
                return any(s != "out" for s in locs)
            if op == "disjoint":
                return all(s == "out" for s in locs)
    da, db = _max_dim(a), _max_dim(b)
    m = de9im(a, b)
    if op == "intersects":
        return not relate_match(m, _DISJOINT_PAT)
    if op == "disjoint":
        return relate_match(m, _DISJOINT_PAT)
    if op == "contains":
        return relate_match(m, "T*****FF*")
    if op == "touches":
        return any(relate_match(m, p) for p in _TOUCH_PATS)
    if op == "equals":
        return relate_match(m, "T*F**FFF*")
    if op == "crosses":
        if da < db:
            return relate_match(m, "T*T******")
        if da > db:
            return relate_match(m, "T*****T**")
        if da == 1:
            return m[0] == "0"
        return False
    if op == "overlaps":
        if da != db:
            return False
        if da == 1:
            return relate_match(m, "1*T***T**")
        return relate_match(m, "T*T***T**")
    raise ValueError(f"Unknown relation predicate: {op}")


def _metric_parts(wkt: str):
    """(points, chains) carrying the FULL vertex set for distance —
    unlike parse_wkt, degenerate rings (< 3 distinct vertices, e.g. the
    reference's 2-point ``POLYGON ((10 100, 30 10))`` distance fixture,
    TestGeoFunctions:597) are kept as closed chains, since stDistance
    measures to the boundary point set regardless of polygon validity."""
    wkt = wkt.strip()
    m = re.match(r"^\s*(\w+)\s*(.*)$", wkt, re.S)
    if not m:
        raise ValueError(f"Invalid WKT: {wkt!r}")
    tag, rest = m.group(1).upper(), m.group(2).strip()
    if rest.upper() == "EMPTY" or rest == "":
        return [], []
    body = rest[1:-1].strip()
    pts, chains = [], []

    def ring_chain(txt):
        r = _parse_ring_text(txt)
        if len(r) > 1 and _key(r[0]) != _key(r[-1]):
            r = r + [r[0]]
        return r

    if tag in ("POINT", "MULTIPOINT"):
        pts = _parse_ring_text(body)
    elif tag == "LINESTRING":
        chains = [_parse_ring_text(body)]
    elif tag == "MULTILINESTRING":
        chains = [_parse_ring_text(p) for p in _split_top(body)]
    elif tag == "POLYGON":
        chains = [ring_chain(p) for p in _split_top(body)]
    elif tag == "MULTIPOLYGON":
        for part in _split_top(body):
            chains += [ring_chain(p) for p in _split_top(part.strip()[1:-1])]
    elif tag == "GEOMETRYCOLLECTION":
        for part in _split_top(body):
            sp, sc = _metric_parts(part)
            pts += sp
            chains += sc
    else:
        raise ValueError(f"Unsupported WKT type: {tag}")
    return pts, chains


def _dist_pt_seg(p, a, b) -> float:
    """Point-to-segment distance spelled sqrt(dx*dx + dy*dy) — the same
    IEEE op sequence as the Catalyst/DuckDB oracle spelling, so results
    hash-match (math.hypot can differ in the last ulp)."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    ln2 = dx * dx + dy * dy
    if ln2 == 0.0:
        ex, ey = p[0] - a[0], p[1] - a[1]
        return math.sqrt(ex * ex + ey * ey)
    t = ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / ln2
    t = min(max(t, 0.0), 1.0)
    ex, ey = p[0] - (a[0] + t * dx), p[1] - (a[1] + t * dy)
    return math.sqrt(ex * ex + ey * ey)


def _proper_cross(a, b, c, d) -> bool:
    """Segments ab and cd cross at a point interior to both (the one
    configuration endpoint-to-segment distance minima cannot see)."""
    d1 = _cross(c, d, a)
    d2 = _cross(c, d, b)
    d3 = _cross(a, b, c)
    d4 = _cross(a, b, d)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
        and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0


def geom_distance(wa: str, wb: str):
    """stDistance (:698): None for EMPTY operands, 0 when the
    geometries intersect, else the minimum vertex-to-segment /
    point-to-point distance over every part pair — exact for
    point/line/polygon inputs, where the minimum between disjoint
    geometries is attained at a vertex projection."""
    apts, achains = _metric_parts(wa)
    bpts, bchains = _metric_parts(wb)
    if not (apts or achains) or not (bpts or bchains):
        return None
    avs = apts + [v for c in achains for v in c]
    bvs = bpts + [v for c in bchains for v in c]
    asegs = [(c[i], c[i + 1]) for c in achains for i in range(len(c) - 1)]
    bsegs = [(c[i], c[i + 1]) for c in bchains for i in range(len(c) - 1)]
    best = math.inf
    for p in avs:
        for s in bsegs:
            d = _dist_pt_seg(p, s[0], s[1])
            if d < best:
                best = d
    for p in bvs:
        for s in asegs:
            d = _dist_pt_seg(p, s[0], s[1])
            if d < best:
                best = d
    if not asegs or not bsegs:
        for p in avs:
            for q in bvs:
                ex, ey = p[0] - q[0], p[1] - q[1]
                d = math.sqrt(ex * ex + ey * ey)
                if d < best:
                    best = d
    if best > 0.0:
        for sa in asegs:
            for sb in bsegs:
                if _proper_cross(sa[0], sa[1], sb[0], sb[1]):
                    return 0.0
        pa, pb = parse_wkt(wa).polys, parse_wkt(wb).polys
        if pa and any(locate_in_polys(p, pa) == "in" for p in bvs):
            return 0.0
        if pb and any(locate_in_polys(p, pb) == "in" for p in avs):
            return 0.0
    return best
