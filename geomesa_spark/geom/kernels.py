"""DE-9IM relate engine + vectorized point-in-polygon kernels.

Pure-numpy replacement for the JTS relate operations used by the reference
predicate surface (geomesa-spark-jts udf/SpatialRelationFunctions.scala:29-39).
Supports points, linestrings, polygons (with holes) and their multis.

Two tiers:

- ``relate(a, b)`` — exact DE-9IM matrix for a single geometry pair. Used by
  the scalar st_* functions and as the general join-refine fallback.
- ``points_in_polygon(px, py, polygon)`` — fully vectorized location test
  (inside / boundary / outside) for the hot join-refine path: one numpy
  broadcast per (candidate-point-batch × polygon), zero per-row Python.

Predicate → matrix patterns follow the OGC SFS definitions (same as JTS).
"""

from __future__ import annotations

import numpy as np

from .wkb import (
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)

# matrix order: II IB IE BI BB BE EI EB EE
F = -1  # empty


# --------------------------------------------------------------------------
# decomposition helpers
# --------------------------------------------------------------------------

def _dim(geom: Geometry) -> int:
    if isinstance(geom, (Point, MultiPoint)):
        return 0
    if isinstance(geom, (LineString, MultiLineString)):
        return 1
    if isinstance(geom, (Polygon, MultiPolygon)):
        return 2
    if isinstance(geom, GeometryCollection):
        return max((_dim(g) for g in geom.geoms), default=0)
    raise ValueError(geom)


def _points_of(geom) -> np.ndarray:
    """dim-0 decomposition: (n,2) array."""
    if isinstance(geom, Point):
        return np.array([[geom.x, geom.y]])
    return np.array([[g.x, g.y] for g in geom.geoms]).reshape(-1, 2)


def _paths_of(geom) -> list[np.ndarray]:
    """dim-1 decomposition: list of (n,2) paths."""
    if isinstance(geom, LineString):
        return [geom.coords]
    return [g.coords for g in geom.geoms]


def _polys_of(geom) -> list[Polygon]:
    if isinstance(geom, Polygon):
        return [geom]
    return list(geom.geoms)


def _paths_of_any(geom) -> list[np.ndarray]:
    """All 1-D paths of any geometry (line paths + polygon rings)."""
    if isinstance(geom, Point):
        return [np.array([[geom.x, geom.y], [geom.x, geom.y]])]
    if isinstance(geom, LineString):
        return [geom.coords]
    if isinstance(geom, Polygon):
        return list(geom.rings)
    return [p for g in geom.geoms for p in _paths_of_any(g)]


def _line_boundary(paths: list[np.ndarray]) -> np.ndarray:
    """Mod-2 boundary rule: endpoints occurring an odd number of times."""
    pts: dict[tuple, int] = {}
    for p in paths:
        if len(p) == 0:
            continue
        if np.all(p[0] == p[-1]):
            continue  # closed ring: no boundary
        for q in (tuple(p[0]), tuple(p[-1])):
            pts[q] = pts.get(q, 0) + 1
    odd = [k for k, v in pts.items() if v % 2 == 1]
    return np.array(odd, dtype=np.float64).reshape(-1, 2)


# --------------------------------------------------------------------------
# primitive geometry ops
# --------------------------------------------------------------------------

def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _on_segment(px, py, ax, ay, bx, by) -> bool:
    if _cross(ax, ay, bx, by, px, py) != 0.0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _point_on_paths(px, py, paths) -> bool:
    for p in paths:
        for i in range(len(p) - 1):
            if _on_segment(px, py, p[i, 0], p[i, 1], p[i + 1, 0], p[i + 1, 1]):
                return True
    return False


def _seg_intersections(a1, a2, b1, b2):
    """Intersection of segment a and b.

    Returns (kind, points): kind in {'none','point','overlap'};
    for 'point' points=[(x,y)]; for 'overlap' points=[(x,y),(x,y)] overlap ends.
    """
    ax1, ay1 = a1
    ax2, ay2 = a2
    bx1, by1 = b1
    bx2, by2 = b2
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)

    if d1 == 0 and d2 == 0 and d3 == 0 and d4 == 0:
        # collinear: project onto dominant axis
        if abs(ax2 - ax1) >= abs(ay2 - ay1):
            key = 0
        else:
            key = 1
        pts = sorted([tuple(a1), tuple(a2)], key=lambda p: p[key])
        qts = sorted([tuple(b1), tuple(b2)], key=lambda p: p[key])
        lo = max(pts[0][key], qts[0][key])
        hi = min(pts[1][key], qts[1][key])
        if lo > hi:
            return "none", []
        def interp(p0, p1, v):
            if p1[key] == p0[key]:
                return p0
            t = (v - p0[key]) / (p1[key] - p0[key])
            return (p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1]))
        plo = interp(pts[0], pts[1], lo)
        phi = interp(pts[0], pts[1], hi)
        if lo == hi:
            return "point", [plo]
        return "overlap", [plo, phi]

    if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and ((d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0):
        # bounding checks for touch cases
        if d1 == 0 and not _on_segment(ax1, ay1, bx1, by1, bx2, by2):
            if d2 == 0 and not _on_segment(ax2, ay2, bx1, by1, bx2, by2):
                return "none", []
        # compute intersection point
        denom = (ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1)
        if denom == 0:
            # parallel but not collinear
            return "none", []
        t = ((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1)) / denom
        u = ((bx1 - ax1) * (ay2 - ay1) - (by1 - ay1) * (ax2 - ax1)) / denom
        if -0.0 <= t <= 1.0 and -0.0 <= u <= 1.0:
            # endpoint touches must return the EXACT endpoint: the
            # interpolated value can differ by an ulp and then miss the
            # boundary-membership sets in _relate_11/_relate_12
            if d1 == 0:
                return "point", [(ax1, ay1)]
            if d2 == 0:
                return "point", [(ax2, ay2)]
            if d3 == 0:
                return "point", [(bx1, by1)]
            if d4 == 0:
                return "point", [(bx2, by2)]
            x = ax1 + t * (ax2 - ax1)
            y = ay1 + t * (ay2 - ay1)
            return "point", [(x, y)]
        return "none", []
    return "none", []


def _path_segments(paths: list[np.ndarray]):
    for p in paths:
        for i in range(len(p) - 1):
            yield p[i], p[i + 1]


def _all_intersections(paths_a, paths_b):
    """All intersection points and overlap flags between two path sets."""
    points = []
    overlap = False
    for a1, a2 in _path_segments(paths_a):
        for b1, b2 in _path_segments(paths_b):
            kind, pts = _seg_intersections(a1, a2, b1, b2)
            if kind == "point":
                points.extend(pts)
            elif kind == "overlap":
                points.extend(pts)
                overlap = True
    return points, overlap


def _split_paths_at(paths: list[np.ndarray], cut_points) -> list[tuple]:
    """Split each segment at the cut points lying on it.

    Returns list of (midx, midy) midpoints of the resulting subsegments.
    """
    mids = []
    for a1, a2 in _path_segments(paths):
        ax, ay = a1
        bx, by = a2
        ts = [0.0, 1.0]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        if L2 == 0:
            mids.append((ax, ay))
            continue
        for (px, py) in cut_points:
            if _on_segment(px, py, ax, ay, bx, by):
                t = ((px - ax) * dx + (py - ay) * dy) / L2
                ts.append(min(max(t, 0.0), 1.0))
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            tm = (t0 + t1) / 2
            mids.append((ax + tm * dx, ay + tm * dy))
    return mids


# --------------------------------------------------------------------------
# vectorized point-in-polygon (hot path)
# --------------------------------------------------------------------------

def pip_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Locate points relative to a polygon given as rings (shell + holes).

    Returns int8 array: 1 = strictly inside, 0 = on boundary, -1 = outside.
    Even-odd ray casting, fully vectorized over points × segments.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    # edge-outer loop with scalar edge coords: 1-D scalar-vs-array ops only
    # (no n_points x n_edges temporaries), and a division-free crossing test
    # ((Y-y1)*dx - (X-x1)*dy compared by the sign of dy) — exact, and ~4x
    # faster than the matrix form on Arrow-sized batches.
    for ring in rings:
        xs = ring[:, 0]
        ys = ring[:, 1]
        for k in range(len(xs) - 1):
            x1, y1, x2, y2 = xs[k], ys[k], xs[k + 1], ys[k + 1]
            dx = x2 - x1
            dy = y2 - y1
            # boundary: collinear + within the segment bbox
            cross = dx * (py - y1) - dy * (px - x1)
            lo_x, hi_x = (x1, x2) if x1 <= x2 else (x2, x1)
            lo_y, hi_y = (y1, y2) if y1 <= y2 else (y2, y1)
            on_edge |= ((cross == 0.0)
                        & (lo_x <= px) & (px <= hi_x)
                        & (lo_y <= py) & (py <= hi_y))
            if dy == 0.0:
                continue
            # ray casting, half-open rule avoids double-counting vertices
            cond = (y1 > py) != (y2 > py)
            pos = (py - y1) * dx - (px - x1) * dy
            inside ^= cond & ((pos > 0.0) if dy > 0.0 else (pos < 0.0))
    out = np.where(on_edge, np.int8(0), np.where(inside, np.int8(1), np.int8(-1)))
    return out


def points_in_polygon(px, py, poly: Polygon) -> np.ndarray:
    return pip_rings(px, py, poly.rings)


def _locate_point_in_polys(px, py, polys: list[Polygon]) -> int:
    """1 inside, 0 boundary, -1 outside (union of polygons)."""
    res = -1
    for poly in polys:
        loc = int(pip_rings(np.array([px]), np.array([py]), poly.rings)[0])
        if loc == 1:
            return 1
        if loc == 0:
            res = 0
    return res


def _interior_point(poly: Polygon) -> tuple[float, float]:
    """A representative point strictly inside the polygon (point-on-surface)."""
    shell = poly.shell
    ys = np.unique(shell[:, 1])
    ymid = (ys.min() + ys.max()) / 2
    # avoid scanning exactly through a vertex
    tries = [ymid] + [(ys[i] + ys[i + 1]) / 2 for i in range(len(ys) - 1)]
    for y0 in tries:
        if np.any(shell[:, 1] == y0):
            continue
        xs = []
        for ring in poly.rings:
            x1, y1 = ring[:-1, 0], ring[:-1, 1]
            x2, y2 = ring[1:, 0], ring[1:, 1]
            cond = (y1 > y0) != (y2 > y0)
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = x1 + (y0 - y1) * (x2 - x1) / (y2 - y1)
            xs.extend(xi[cond].tolist())
        if len(xs) >= 2:
            xs = sorted(xs)
            return ((xs[0] + xs[1]) / 2, y0)
    # fallback: centroid of first three shell points
    c = shell[:3].mean(axis=0)
    return (float(c[0]), float(c[1]))


# --------------------------------------------------------------------------
# DE-9IM relate
# --------------------------------------------------------------------------

def _matrix_str(m: list[int]) -> str:
    return "".join("F" if v == F else str(v) for v in m)


def _transpose(m: list[int]) -> list[int]:
    # swap rows/cols: indices II IB IE BI BB BE EI EB EE
    return [m[0], m[3], m[6], m[1], m[4], m[7], m[2], m[5], m[8]]


def relate(a: Geometry, b: Geometry) -> str:
    """DE-9IM matrix string of a vs b.

    GeometryCollection operands are rejected, matching JTS
    (Geometry.relate throws IllegalArgumentException for GCs) — the
    dim-based decomposition below would silently mis-handle mixed
    members otherwise.
    """
    if isinstance(a, GeometryCollection) or isinstance(b, GeometryCollection):
        raise ValueError("relate does not support GeometryCollection operands "
                         "(JTS semantics)")
    da, db = _dim(a), _dim(b)
    if da <= db:
        m = _relate_dims(a, b, da, db)
    else:
        m = _transpose(_relate_dims(b, a, db, da))
    return _matrix_str(m)


def _relate_dims(a, b, da, db) -> list[int]:
    if da == 0 and db == 0:
        return _relate_00(_points_of(a), _points_of(b))
    if da == 0 and db == 1:
        return _relate_01(_points_of(a), _paths_of(b))
    if da == 0 and db == 2:
        return _relate_02(_points_of(a), _polys_of(b))
    if da == 1 and db == 1:
        return _relate_11(_paths_of(a), _paths_of(b))
    if da == 1 and db == 2:
        return _relate_12(_paths_of(a), _polys_of(b))
    return _relate_22(_polys_of(a), _polys_of(b))


def _relate_00(pa: np.ndarray, pb: np.ndarray) -> list[int]:
    sa = {tuple(p) for p in pa}
    sb = {tuple(p) for p in pb}
    ii = 0 if sa & sb else F
    ie = 0 if sa - sb else F
    ei = 0 if sb - sa else F
    return [ii, F, ie, F, F, F, ei, F, 2]


def _relate_01(pa: np.ndarray, paths_b) -> list[int]:
    bnd_b = {tuple(p) for p in _line_boundary(paths_b)}
    ii = ib = ie = F
    covered_bnd = set()
    for p in pa:
        t = tuple(p)
        if t in bnd_b:
            ib = max(ib, 0)
            covered_bnd.add(t)
        elif _point_on_paths(p[0], p[1], paths_b):
            ii = max(ii, 0)
        else:
            ie = max(ie, 0)
    ei = 1  # a finite point set never covers a 1-D line
    eb = 0 if (bnd_b - covered_bnd) else F
    return [ii, ib, ie, F, F, F, ei, eb, 2]


def _relate_02(pa: np.ndarray, polys_b) -> list[int]:
    ii = ib = ie = F
    for p in pa:
        loc = _locate_point_in_polys(p[0], p[1], polys_b)
        if loc == 1:
            ii = max(ii, 0)
        elif loc == 0:
            ib = max(ib, 0)
        else:
            ie = max(ie, 0)
    return [ii, ib, ie, F, F, F, 2, 1, 2]


def _covered_by_paths(paths_a, paths_b, cuts) -> bool:
    """Is every subsegment midpoint of A (split at cuts) on B?"""
    for (mx, my) in _split_paths_at(paths_a, cuts):
        if not _point_on_paths(mx, my, paths_b):
            return False
    return True


def _relate_11(paths_a, paths_b) -> list[int]:
    bnd_a = _line_boundary(paths_a)
    bnd_b = _line_boundary(paths_b)
    set_a = {tuple(p) for p in bnd_a}
    set_b = {tuple(p) for p in bnd_b}

    cuts, overlap = _all_intersections(paths_a, paths_b)

    ii = F
    if overlap:
        ii = 1
    else:
        for (x, y) in cuts:
            if (x, y) not in set_a and (x, y) not in set_b:
                ii = 0
                break

    ib = F
    for p in bnd_b:
        t = tuple(p)
        if t not in set_a and _point_on_paths(p[0], p[1], paths_a):
            ib = 0
            break

    all_cuts = cuts + [tuple(p) for p in bnd_a] + [tuple(p) for p in bnd_b]
    ie = F if _covered_by_paths(paths_a, paths_b, all_cuts) else 1
    ei = F if _covered_by_paths(paths_b, paths_a, all_cuts) else 1

    bi = F
    for p in bnd_a:
        t = tuple(p)
        if t not in set_b and _point_on_paths(p[0], p[1], paths_b):
            bi = 0
            break
    bb = 0 if set_a & set_b else F
    be = F
    for p in bnd_a:
        if not _point_on_paths(p[0], p[1], paths_b):
            be = 0
            break
    eb = F
    for p in bnd_b:
        if not _point_on_paths(p[0], p[1], paths_a):
            eb = 0
            break
    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _relate_12(paths_a, polys_b) -> list[int]:
    rings_b = [r for poly in polys_b for r in poly.rings]
    bnd_a = _line_boundary(paths_a)

    cuts, overlap = _all_intersections(paths_a, rings_b)
    all_cuts = cuts + [tuple(p) for p in bnd_a]
    mids = _split_paths_at(paths_a, all_cuts)

    ii = ib = ie = F
    for (mx, my) in mids:
        loc = _locate_point_in_polys(mx, my, polys_b)
        if loc == 1:
            ii = 1
        elif loc == 0:
            ib = 1
        else:
            ie = 1
    if ib == F:
        # touch points that are interior to the line
        set_a = {tuple(p) for p in bnd_a}
        for (x, y) in cuts:
            if (x, y) not in set_a:
                ib = 0
                break

    bi = bb = be = F
    for p in bnd_a:
        loc = _locate_point_in_polys(p[0], p[1], polys_b)
        if loc == 1:
            bi = 0
        elif loc == 0:
            bb = 0
        else:
            be = 0

    # EB: part of B's boundary not covered by the line A
    ring_mids = _split_paths_at(rings_b, cuts)
    eb = F
    for (mx, my) in ring_mids:
        if not _point_on_paths(mx, my, paths_a):
            eb = 1
            break
    return [ii, ib, ie, bi, bb, be, 2, eb, 2]


def _relate_22(polys_a, polys_b) -> list[int]:
    rings_a = [r for poly in polys_a for r in poly.rings]
    rings_b = [r for poly in polys_b for r in poly.rings]

    cuts, overlap = _all_intersections(rings_a, rings_b)

    mids_a = _split_paths_at(rings_a, cuts)
    mids_b = _split_paths_at(rings_b, cuts)

    bi = be = F  # A-boundary vs B interior/exterior
    for (mx, my) in mids_a:
        loc = _locate_point_in_polys(mx, my, polys_b)
        if loc == 1:
            bi = 1
        elif loc == -1:
            be = 1
    ib = eb = F  # B-boundary vs A interior/exterior
    for (mx, my) in mids_b:
        loc = _locate_point_in_polys(mx, my, polys_a)
        if loc == 1:
            ib = 1
        elif loc == -1:
            eb = 1

    bb = F
    if overlap:
        bb = 1
    elif cuts:
        bb = 0

    # interiors
    ii = F
    if bi == 1 or ib == 1:
        ii = 2
    else:
        for poly in polys_a:
            x, y = _interior_point(poly)
            if _locate_point_in_polys(x, y, polys_b) == 1:
                ii = 2
                break
        if ii == F:
            for poly in polys_b:
                x, y = _interior_point(poly)
                if _locate_point_in_polys(x, y, polys_a) == 1:
                    ii = 2
                    break

    # IE: A-interior outside B  <=>  not (A subset of closed B)
    ie = F
    if be == 1:
        ie = 2  # part of A's boundary (hence interior neighborhoods) outside B
    elif ib == 1:
        ie = 2  # B's boundary passes through A's interior => some of A outside B
    elif ii == F and not _polys_equalish(mids_a, polys_b):
        ie = 2  # disjoint closures
    # EI symmetric
    ei = F
    if eb == 1:
        ei = 2
    elif bi == 1:
        ei = 2
    elif ii == F and not _polys_equalish(mids_b, polys_a):
        ei = 2

    return [ii, ib, ie, bi, bb, be, ei, eb, 2]


def _polys_equalish(mids, polys_other) -> bool:
    """All boundary midpoints on the other's boundary (shared-boundary test)."""
    for (mx, my) in mids:
        if _locate_point_in_polys(mx, my, polys_other) != 0:
            return False
    return True


# --------------------------------------------------------------------------
# named predicates (OGC SFS patterns over the matrix)
# --------------------------------------------------------------------------

def _matches(matrix: str, pattern: str) -> bool:
    for m, p in zip(matrix, pattern):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif p == "F":
            if m != "F":
                return False
        elif m != p:
            return False
    return True


def intersects(a, b) -> bool:
    return not disjoint(a, b)


def disjoint(a, b) -> bool:
    return _matches(relate(a, b), "FF*FF****")


def contains(a, b) -> bool:
    return _matches(relate(a, b), "T*****FF*")


def within(a, b) -> bool:
    return contains(b, a)


def covers(a, b) -> bool:
    m = relate(a, b)
    return any(_matches(m, p) for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*"))


def covered_by(a, b) -> bool:
    return covers(b, a)


def touches(a, b) -> bool:
    m = relate(a, b)
    return any(_matches(m, p) for p in ("FT*******", "F**T*****", "F***T****"))


def crosses(a, b) -> bool:
    m = relate(a, b)
    da, db = _dim(a), _dim(b)
    if da < db:
        return _matches(m, "T*T******")
    if da > db:
        return _matches(m, "T*****T**")
    if da == 1 and db == 1:
        return _matches(m, "0********")
    return False


def overlaps(a, b) -> bool:
    m = relate(a, b)
    da, db = _dim(a), _dim(b)
    if da != db:
        return False
    if da == 1:
        return _matches(m, "1*T***T**")
    return _matches(m, "T*T***T**")


def equals(a, b) -> bool:
    return _dim(a) == _dim(b) and _matches(relate(a, b), "T*F**FFF*")


def relate_bool(a, b, pattern: str) -> bool:
    return _matches(relate(a, b), pattern)
