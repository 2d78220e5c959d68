"""The st_* SQL function surface (reference parity), as Arrow-batched pandas UDFs.

Mirrors the reference registration surface (geomesa-spark-jts
udf/*.scala + geomesa-spark-sql GeometricDistanceFunctions.scala; docs
docs/user/spark/sparksql_functions.rst). Geometry columns are BinaryType WKB.

Null contract: every function is null-safe — any null argument yields a null
result (reference util/SQLFunctionHelper.nullableUDF).

Vectorized fast paths: all-point batches (the dominant case for a web-pages
corpus geoparsed to points) run as pure numpy — predicates against a constant
polygon literal use the vectorized even-odd PIP kernel, distances use
hypot/haversine/Vincenty arrays. Mixed batches fall back to the exact DE-9IM
engine per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
)

from ..curves.geohash import geohash_decode_bbox, geohash_decode_point, geohash_encode
from ..geom import kernels as K
from ..geom import measures as M
from ..geom.wkb import (
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    geojson_write,
    wkb_read,
    wkb_write,
    wkt_read,
    wkt_write,
)
from .codec import decode_geoms, encode_geoms, encode_points, single_geom, try_decode_points


# --------------------------------------------------------------------------
# UDF factories
# --------------------------------------------------------------------------

def _geom_unary(fn, ret_type):
    """fn: Geometry -> value|Geometry|None. Returns a pandas UDF."""
    returns_geom = isinstance(ret_type, BinaryType)

    @pandas_udf(ret_type)
    def udf(s: pd.Series) -> pd.Series:
        geoms = decode_geoms(s)
        out = []
        for g in geoms:
            if g is None:
                out.append(None)
                continue
            r = fn(g)
            if returns_geom and r is not None:
                r = wkb_write(r)
            out.append(r)
        return pd.Series(out, dtype=object if (returns_geom or isinstance(ret_type, StringType)) else None)

    return udf


def _geom_binary(fn, ret_type, fast=None):
    """fn: (Geometry, Geometry) -> value. fast: optional vectorized batch fn."""
    returns_geom = isinstance(ret_type, BinaryType)

    @pandas_udf(ret_type)
    def udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        if fast is not None:
            r = fast(s1, s2)
            if r is not None:
                return r
        g1 = decode_geoms(s1)
        g2 = decode_geoms(s2)
        out = []
        for a, b in zip(g1, g2):
            if a is None or b is None:
                out.append(None)
                continue
            r = fn(a, b)
            if returns_geom and r is not None:
                r = wkb_write(r)
            out.append(r)
        return pd.Series(out, dtype=object if (returns_geom or isinstance(ret_type, StringType)) else None)

    return udf


def _predicate_fast(loc_accept, swapped_ok=True):
    """Build a vectorized fast path for point-vs-constant-polygon predicates.

    loc_accept: function mapping pip location array (1/0/-1) -> bool array,
    evaluated as pred(poly, points). Returns None for unsupported batches.
    """

    def fast(s1: pd.Series, s2: pd.Series):
        # case A: s1 constant polygon, s2 points  -> pred(poly, pts)
        for (sa, sb, swap) in ((s1, s2, False), (s2, s1, True)):
            if swap and not swapped_ok:
                continue
            const = single_geom(sa)
            if const is None or not isinstance(const, Polygon):
                continue
            pts = try_decode_points(sb)
            if pts is None:
                continue
            x, y, isnull = pts
            loc = K.pip_rings(x, y, const.rings)
            vals = loc_accept(loc, swap)
            if vals is None:
                return None
            out = pd.Series(list(vals), dtype=object)
            out[isnull | sa.isna().to_numpy()] = None
            return out
        return None

    return fast


# pred(poly, point) by location; swap=True means pred(point, poly)
def _fast_contains(loc, swap):
    if swap:
        return np.zeros(len(loc), dtype=bool)  # point never contains a polygon
    return loc == 1


def _fast_within(loc, swap):
    if swap:
        return loc == 1  # within(point, poly)
    return np.zeros(len(loc), dtype=bool)


def _fast_covers(loc, swap):
    if swap:
        return np.zeros(len(loc), dtype=bool)
    return loc >= 0


def _fast_coveredby(loc, swap):
    if swap:
        return loc >= 0
    return np.zeros(len(loc), dtype=bool)


def _fast_intersects(loc, swap):
    return loc >= 0


def _fast_disjoint(loc, swap):
    return loc == -1


def _fast_touches(loc, swap):
    return loc == 0


def _fast_crosses(loc, swap):
    return np.zeros(len(loc), dtype=bool)


def _fast_overlaps(loc, swap):
    return np.zeros(len(loc), dtype=bool)


def _fast_equals(loc, swap):
    return np.zeros(len(loc), dtype=bool)


def _points_only_distance(metric):
    def fast(s1: pd.Series, s2: pd.Series):
        p1 = try_decode_points(s1)
        p2 = try_decode_points(s2)
        if p1 is None or p2 is None:
            return None
        x1, y1, n1 = p1
        x2, y2, n2 = p2
        d = metric(x1, y1, x2, y2)
        out = pd.Series(np.asarray(d, dtype=np.float64))
        out[n1 | n2] = None
        return out

    return fast


# --------------------------------------------------------------------------
# scalar implementations
# --------------------------------------------------------------------------

def _geometry_n(g, n):
    """1-based; JTS getGeometryN on simple geoms returns self for n=1."""
    if isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)):
        return g.geoms[n - 1] if 1 <= n <= len(g.geoms) else None
    return g if n == 1 else None


def _point_n(g, n):
    if not isinstance(g, LineString):
        return None
    m = len(g.coords)
    if n < 0:
        n = m + n + 1
    if not (1 <= n <= m):
        return None
    return Point(g.coords[n - 1, 0], g.coords[n - 1, 1])


def _num_points(g):
    if isinstance(g, Point):
        return 1
    if isinstance(g, LineString):
        return len(g.coords)
    if isinstance(g, Polygon):
        return sum(len(r) for r in g.rings)
    return sum(_num_points(x) for x in g.geoms)


def _is_simple(g) -> bool:
    if isinstance(g, (Point, Polygon, MultiPolygon)):
        return True
    if isinstance(g, MultiPoint):
        pts = {(p.x, p.y) for p in g.geoms}
        return len(pts) == len(g.geoms)
    paths = [g.coords] if isinstance(g, LineString) else [x.coords for x in g.geoms]
    # self-intersection check: any intersection that is not a shared endpoint
    segs = [(p[i], p[i + 1], pi, i) for pi, p in enumerate(paths) for i in range(len(p) - 1)]
    for a in range(len(segs)):
        for b in range(a + 1, len(segs)):
            a1, a2, pa, ia = segs[a]
            b1, b2, pb, ib = segs[b]
            kind, pts = K._seg_intersections(a1, a2, b1, b2)
            if kind == "none":
                continue
            if kind == "overlap":
                return False
            (x, y) = pts[0]
            adjacent = pa == pb and abs(ia - ib) == 1
            closing = pa == pb and {ia, ib} == {0, len(paths[pa]) - 2} and \
                np.all(paths[pa][0] == paths[pa][-1])

            def _endpoint_of(pi):
                # SFS/JTS: elements of a MultiLineString may touch at
                # mutual BOUNDARY points; a closed element has an empty
                # boundary (mod-2 rule), so its endpoints don't count
                p = paths[pi]
                if np.all(p[0] == p[-1]):
                    return False
                return ((x == p[0][0] and y == p[0][1])
                        or (x == p[-1][0] and y == p[-1][1]))

            boundary_touch = pa != pb and _endpoint_of(pa) and _endpoint_of(pb)
            if adjacent or closing or boundary_touch:
                continue
            return False
    return True


def _is_valid(g) -> bool:
    if isinstance(g, (Point, MultiPoint, LineString, MultiLineString)):
        return True
    polys = [g] if isinstance(g, Polygon) else list(getattr(g, "geoms", []))
    for p in polys:
        if isinstance(p, Polygon):
            for r in p.rings:
                if len(r) < 4 or not np.all(r[0] == r[-1]):
                    return False
                if not _is_simple(LineString(r)):
                    return False
    return True


def _boundary(g):
    if isinstance(g, Point) or isinstance(g, MultiPoint):
        return GeometryCollection([])
    if isinstance(g, (LineString, MultiLineString)):
        paths = [g.coords] if isinstance(g, LineString) else [x.coords for x in g.geoms]
        b = K._line_boundary(paths)
        if len(b) == 0:
            return MultiPoint([])
        if len(b) == 1:
            return Point(b[0, 0], b[0, 1])
        return MultiPoint([Point(p[0], p[1]) for p in b])
    if isinstance(g, Polygon):
        if len(g.holes) == 0:
            return LineString(g.shell)
        return MultiLineString([LineString(r) for r in g.rings])
    if isinstance(g, MultiPolygon):
        lines = [LineString(r) for p in g.geoms for r in p.rings]
        return MultiLineString(lines)
    return None


def _antimeridian_safe(g):
    """Translate x into [-180,180]; split bbox-like polygons crossing the IDL.

    Port of st_antimeridianSafeGeom semantics
    (GeometricProcessingFunctions.scala:41-57).
    """
    xmin, ymin, xmax, ymax = g.envelope()
    if xmin >= -180 and xmax <= 180:
        return g
    # translate whole geometry into range first
    shift = 0.0
    if xmin > 180:
        shift = -360.0 * np.ceil((xmin - 180) / 360)
    elif xmax < -180:
        shift = 360.0 * np.ceil((-180 - xmax) / 360)
    if shift:
        g = M.translate(g, shift, 0.0)
        xmin, ymin, xmax, ymax = g.envelope()
    if xmax > 180:
        # split the ACTUAL geometry at the antimeridian (the reference
        # intersects with each hemisphere; an envelope-rectangle stand-in
        # would discard the shape): piece A = clip to the world window,
        # piece B = clip of the -360-translated copy
        if isinstance(g, Polygon):
            if g.holes:
                raise NotImplementedError(
                    "st_antimeridianSafeGeom: IDL-crossing polygon with holes")
            parts = []
            for cand in (g, M.translate(g, -360.0, 0.0)):
                ring = _clip_ring_world(cand.shell)
                if ring is not None:
                    parts.append(Polygon(ring))
            if len(parts) == 1:
                return parts[0]
            return MultiPolygon(parts)
        if isinstance(g, LineString):
            pieces = (_clip_path_world(g.coords)
                      + _clip_path_world(g.coords - np.array([360.0, 0.0])))
            if len(pieces) == 1:
                return LineString(pieces[0])
            return MultiLineString([LineString(p) for p in pieces])
        raise NotImplementedError(
            f"st_antimeridianSafeGeom: IDL-crossing {type(g).__name__}")
    return g


class _WorldRect:
    xmin, xmax, ymin, ymax = -180.0, 180.0, -90.0, 90.0


def _clip_ring_world(shell: np.ndarray):
    """Sutherland-Hodgman clip of a closed shell ring to the world
    window; None when the clipped area is empty."""
    from ..operators.tiling import _clip_ring_to_envelope

    from ..geom.measures import ring_area

    out = _clip_ring_to_envelope(np.asarray(shell, dtype=np.float64),
                                 _WorldRect)
    if len(out) < 4 or ring_area(out) == 0.0:
        return None
    return out


def _clip_path_world(coords: np.ndarray) -> list:
    """Liang-Barsky clip of a line path to the world window, merging
    consecutive surviving subsegments into maximal pieces."""
    from ..operators.tiling import _clip_segment

    pieces: list[list] = []
    cur: list = []
    c = np.asarray(coords, dtype=np.float64)
    for i in range(len(c) - 1):
        seg = _clip_segment(c[i, 0], c[i, 1], c[i + 1, 0], c[i + 1, 1],
                            _WorldRect)
        if seg is None:
            if len(cur) >= 2:
                pieces.append(cur)
            cur = []
            continue
        x0, y0, x1, y1 = seg
        if (x0, y0) == (x1, y1):
            continue
        if cur and cur[-1] == (x0, y0):
            cur.append((x1, y1))
        else:
            if len(cur) >= 2:
                pieces.append(cur)
            cur = [(x0, y0), (x1, y1)]
    if len(cur) >= 2:
        pieces.append(cur)
    return [np.asarray(p, dtype=np.float64) for p in pieces]


_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563


def _tm_coeffs():
    """Krueger series coefficients, order n^3 (~mm accuracy in a UTM zone).

    Public formulas (Karney, "Transverse Mercator with an accuracy of a
    few nanometers", J. Geod. 2011; the standard UTM flattening series).
    """
    n = _WGS84_F / (2.0 - _WGS84_F)
    A = _WGS84_A / (1 + n) * (1 + n * n / 4 + n ** 4 / 64)
    alpha = (n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16,
             13 * n ** 2 / 48 - 3 * n ** 3 / 5,
             61 * n ** 3 / 240)
    beta = (n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96,
            n ** 2 / 48 + n ** 3 / 15,
            17 * n ** 3 / 480)
    delta = (2 * n - 2 * n ** 2 / 3 - 2 * n ** 3,
             7 * n ** 2 / 3 - 8 * n ** 3 / 5,
             56 * n ** 3 / 15)
    e = np.sqrt(_WGS84_F * (2.0 - _WGS84_F))
    return A, alpha, beta, delta, e


def _utm_forward(c, zone: int, south: bool):
    """(lon, lat) -> UTM (easting, northing), k0=0.9996."""
    A, alpha, _, _, e = _tm_coeffs()
    k0 = 0.9996
    lam0 = np.radians(zone * 6.0 - 183.0)
    phi = np.radians(c[:, 1])
    lam = np.radians(c[:, 0]) - lam0
    sp = np.sin(phi)
    t = np.sinh(np.arctanh(sp) - e * np.arctanh(e * sp))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(alpha, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    E = 500_000.0 + k0 * A * x
    N = (10_000_000.0 if south else 0.0) + k0 * A * y
    return np.column_stack([E, N])


def _utm_inverse(c, zone: int, south: bool):
    """UTM (easting, northing) -> (lon, lat)."""
    A, _, beta, delta, e = _tm_coeffs()
    k0 = 0.9996
    lam0 = np.radians(zone * 6.0 - 183.0)
    x = (c[:, 0] - 500_000.0) / (k0 * A)
    y = (c[:, 1] - (10_000_000.0 if south else 0.0)) / (k0 * A)
    xi, eta = y.copy(), x.copy()
    for j, b in enumerate(beta, start=1):
        xi -= b * np.sin(2 * j * y) * np.cosh(2 * j * x)
        eta -= b * np.cos(2 * j * y) * np.sinh(2 * j * x)
    chi = np.arcsin(np.sin(xi) / np.cosh(eta))
    phi = chi.copy()
    for j, d in enumerate(delta, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta), np.cos(xi))
    return np.column_stack([np.degrees(lam0 + lam), np.degrees(phi)])


def _parse_crs(crs: str):
    """'EPSG:4326' / 'EPSG:3857' / UTM 'EPSG:326xx'/'327xx' / 'utm:33n' /
    polar stereographic 'EPSG:5041/5042/32661/32761/3413/3976' / LAEA
    'EPSG:3035'."""
    from ..geom import crs as C

    s = crs.lower().strip()
    if s.startswith("epsg:"):
        s = s[5:]
    if s in ("4326", "3857"):
        return (s, None, None)
    if s in C.PS_CRS:
        return ("ps", s, None)
    if s in C.LAEA_CRS:
        return ("laea", s, None)
    if s.startswith("utm:") and s[-1] in "ns":
        try:
            zone = int(s[4:-1])
        except ValueError:
            return (None, None, None)
        if 1 <= zone <= 60:
            return ("utm", zone, s[-1] == "s")
        return (None, None, None)
    if len(s) == 5 and s[:3] in ("326", "327"):
        try:
            zone = int(s[3:])
        except ValueError:
            return (None, None, None)
        if 1 <= zone <= 60:
            return ("utm", zone, s[:3] == "327")
    return (None, None, None)


def _crs_ops(kind, p1, p2):
    """(from4326, to4326) coordinate-array ops for one parsed CRS."""
    from ..geom import crs as C

    R = 6378137.0
    if kind == "4326":
        return None, None  # identity
    if kind == "3857":
        def fwd(c):
            x = np.radians(c[:, 0]) * R
            y = np.log(np.tan(np.pi / 4 + np.radians(c[:, 1]) / 2)) * R
            return np.column_stack([x, y])

        def inv(c):
            lon = np.degrees(c[:, 0] / R)
            lat = np.degrees(2 * np.arctan(np.exp(c[:, 1] / R)) - np.pi / 2)
            return np.column_stack([lon, lat])

        return fwd, inv
    if kind == "utm":
        return (lambda c: _utm_forward(c, p1, p2),
                lambda c: _utm_inverse(c, p1, p2))
    if kind == "ps":
        kw = C.PS_CRS[p1]
        return (lambda c: C.ps_forward(c, **kw),
                lambda c: C.ps_inverse(c, **kw))
    if kind == "laea":
        kw = C.LAEA_CRS[p1]
        return (lambda c: C.laea_forward(c, **kw),
                lambda c: C.laea_inverse(c, **kw))
    raise AssertionError(kind)


def _transform(g, from_crs: str, to_crs: str):
    """Reproject between any two supported CRS: EPSG:4326, 3857 (web
    mercator), UTM (326xx/327xx, Krueger order-n^3), polar stereographic
    (UPS 5041/5042/32661/32761; NSIDC 3413/3976) and LAEA Europe (3035).
    Pairs where neither side is 4326 compose inverse -> forward through
    4326."""
    f, fz, fs = _parse_crs(from_crs)
    t, tz, ts = _parse_crs(to_crs)
    if f is None or t is None:
        raise ValueError(
            f"st_transform supports EPSG:4326, 3857, UTM (326xx/327xx), "
            f"polar stereographic (5041/5042/32661/32761/3413/3976) and "
            f"LAEA (3035), got {from_crs}->{to_crs}")
    if (f, fz, fs) == (t, tz, ts):
        return g
    _, f_to4326 = _crs_ops(f, fz, fs)
    t_from4326, _ = _crs_ops(t, tz, ts)
    if f_to4326 is None:
        op = t_from4326
    elif t_from4326 is None:
        op = f_to4326
    else:
        op = lambda c: t_from4326(f_to4326(c))  # noqa: E731

    def apply(geom):
        if isinstance(geom, Point):
            c = op(np.array([[geom.x, geom.y]]))
            return Point(float(c[0, 0]), float(c[0, 1]))
        if isinstance(geom, LineString):
            return LineString(op(geom.coords))
        if isinstance(geom, Polygon):
            return Polygon(op(geom.shell), [op(h) for h in geom.holes])
        return type(geom)([apply(x) for x in geom.geoms])

    return apply(g)


def _intersection(a, b):
    """Geometric intersection for the supported combos (see module doc)."""
    da, db = K._dim(a), K._dim(b)
    if da > db:
        return _intersection(b, a)
    if da == 0:
        pts = [p for p in (K._points_of(a)) if _pt_in(p, b)]
        if not pts:
            return GeometryCollection([])
        if len(pts) == 1:
            return Point(pts[0][0], pts[0][1])
        return MultiPoint([Point(p[0], p[1]) for p in pts])
    if da == 1 and db == 2:
        paths = K._paths_of(a)
        rings = [r for poly in K._polys_of(b) for r in poly.rings]
        cuts, _ = K._all_intersections(paths, rings)
        pieces = _clip_paths(paths, cuts, b, keep_inside=True)
        if not pieces:
            return GeometryCollection([])
        if len(pieces) == 1:
            return LineString(pieces[0])
        return MultiLineString([LineString(p) for p in pieces])
    if da == 2 and db == 2:
        pa = K._polys_of(a)
        pb = K._polys_of(b)
        if len(pa) == 1 and len(pb) == 1 and not pa[0].holes and not pb[0].holes:
            out = _sutherland_hodgman(pa[0].shell, pb[0].shell)
            if out is None:
                # non-convex clip: general simple-polygon overlay
                from ..geom.overlay import poly_poly_intersection
                rings = poly_poly_intersection(pa[0], pb[0])
                if not rings:
                    return GeometryCollection([])
                if len(rings) == 1:
                    return Polygon(rings[0])
                return MultiPolygon([Polygon(r) for r in rings])
            if len(out) < 3:
                return GeometryCollection([])
            ring = np.vstack([out, out[:1]])
            return Polygon(ring)
    raise NotImplementedError(f"st_intersection unsupported for dims {da},{db}")


def _pt_in(p, b) -> bool:
    db = K._dim(b)
    if db == 0:
        return any(tuple(p) == tuple(q) for q in K._points_of(b))
    if db == 1:
        return K._point_on_paths(p[0], p[1], K._paths_of(b))
    return K._locate_point_in_polys(p[0], p[1], K._polys_of(b)) >= 0


def _clip_paths(paths, cuts, poly_geom, keep_inside: bool):
    """Return coordinate paths of subsegments inside (or outside) polygons."""
    polys = K._polys_of(poly_geom)
    pieces = []
    for p in paths:
        for i in range(len(p) - 1):
            a1, a2 = p[i], p[i + 1]
            ax, ay = a1
            dx, dy = a2[0] - ax, a2[1] - ay
            L2 = dx * dx + dy * dy
            ts = [0.0, 1.0]
            if L2 > 0:
                for (qx, qy) in cuts:
                    if K._on_segment(qx, qy, ax, ay, a2[0], a2[1]):
                        ts.append(((qx - ax) * dx + (qy - ay) * dy) / L2)
            ts = sorted(set(min(max(t, 0.0), 1.0) for t in ts))
            for t0, t1 in zip(ts[:-1], ts[1:]):
                if t1 - t0 <= 0:
                    continue
                tm = (t0 + t1) / 2
                mx, my = ax + tm * dx, ay + tm * dy
                loc = K._locate_point_in_polys(mx, my, polys)
                keep = loc >= 0 if keep_inside else loc == -1
                if keep:
                    pieces.append(np.array([[ax + t0 * dx, ay + t0 * dy],
                                            [ax + t1 * dx, ay + t1 * dy]]))
    # merge consecutive pieces sharing endpoints
    merged = []
    for seg in pieces:
        if merged and np.all(merged[-1][-1] == seg[0]):
            merged[-1] = np.vstack([merged[-1], seg[1:]])
        else:
            merged.append(seg)
    return merged


def _is_convex(ring: np.ndarray) -> bool:
    c = ring[:-1]
    n = len(c)
    sign = 0
    for i in range(n):
        o, a, b = c[i], c[(i + 1) % n], c[(i + 2) % n]
        cr = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def _sutherland_hodgman(subject_ring: np.ndarray, clip_ring: np.ndarray):
    """Clip subject polygon by a convex clip polygon. Returns open coords."""
    if not _is_convex(clip_ring):
        return None
    clip = clip_ring[:-1]
    # ensure CCW clip
    if M.ring_area(clip_ring) < 0:
        clip = clip[::-1]
    output = list(subject_ring[:-1])
    n = len(clip)
    for i in range(n):
        cp1 = clip[i]
        cp2 = clip[(i + 1) % n]
        input_list = output
        output = []
        if not input_list:
            break

        def inside(p):
            return (cp2[0] - cp1[0]) * (p[1] - cp1[1]) - (cp2[1] - cp1[1]) * (p[0] - cp1[0]) >= 0

        def isect(p1, p2):
            dc = (cp1[0] - cp2[0], cp1[1] - cp2[1])
            dp = (p1[0] - p2[0], p1[1] - p2[1])
            n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
            n2 = p1[0] * p2[1] - p1[1] * p2[0]
            den = dc[0] * dp[1] - dc[1] * dp[0]
            return np.array([(n1 * dp[0] - n2 * dc[0]) / den, (n1 * dp[1] - n2 * dc[1]) / den])

        s = input_list[-1]
        for e in input_list:
            if inside(e):
                if not inside(s):
                    output.append(isect(s, e))
                output.append(e)
            elif inside(s):
                output.append(isect(s, e))
            s = e
    if not output:
        return np.zeros((0, 2))
    out = np.array(output)
    # drop consecutive duplicates
    keep = np.ones(len(out), dtype=bool)
    keep[1:] = np.any(out[1:] != out[:-1], axis=1)
    return out[keep]


def _difference(a, b):
    if K.disjoint(a, b):
        return a
    if K.covered_by(a, b):
        return GeometryCollection([])
    da, db = K._dim(a), K._dim(b)
    if da == 1 and db == 2:
        paths = K._paths_of(a)
        rings = [r for poly in K._polys_of(b) for r in poly.rings]
        cuts, _ = K._all_intersections(paths, rings)
        pieces = _clip_paths(paths, cuts, b, keep_inside=False)
        if not pieces:
            return GeometryCollection([])
        if len(pieces) == 1:
            return LineString(pieces[0])
        return MultiLineString([LineString(p) for p in pieces])
    if da == 2 and db == 2:
        pa = K._polys_of(a)
        pb = K._polys_of(b)
        if len(pa) == 1 and len(pb) == 1 and not pa[0].holes and not pb[0].holes:
            from ..geom.overlay import poly_poly_difference
            polys = poly_poly_difference(pa[0], pb[0])
            if not polys:
                return GeometryCollection([])
            if len(polys) == 1:
                return polys[0]
            return MultiPolygon(polys)
    raise NotImplementedError(f"st_difference unsupported for dims {da},{db}")


def _dms(v: float, pos: str, neg: str) -> str:
    h = pos if v >= 0 else neg
    v = abs(v)
    d = int(v)
    mfull = (v - d) * 60
    m = int(mfull)
    s = (mfull - m) * 60
    return f"{d}°{m:02d}'{s:06.3f}\"{h}"


# --------------------------------------------------------------------------
# registration
# --------------------------------------------------------------------------

def register_functions(spark):
    """Register the full st_* surface on a SparkSession."""
    B, S, D, I, BO = BinaryType(), StringType(), DoubleType(), IntegerType(), BooleanType()

    def reg(name, udf):
        spark.udf.register(name, udf)

    # ---- constructors ----
    @pandas_udf(B)
    def st_geomFromWKT(s: pd.Series) -> pd.Series:
        return pd.Series([None if v is None else wkb_write(wkt_read(v)) for v in s], dtype=object)

    for name in ("st_geomFromWKT", "st_geomFromText", "st_geometryFromText",
                 "st_lineFromText", "st_mLineFromText", "st_mPointFromText",
                 "st_mPolyFromText", "st_pointFromText", "st_polygonFromText"):
        reg(name, st_geomFromWKT)

    @pandas_udf(B)
    def st_geomFromWKB(s: pd.Series) -> pd.Series:
        # normalize any WKB (incl. big-endian) to our LE convention
        return pd.Series([None if v is None else wkb_write(wkb_read(bytes(v))) for v in s], dtype=object)

    reg("st_geomFromWKB", st_geomFromWKB)
    reg("st_pointFromWKB", st_geomFromWKB)

    @pandas_udf(B)
    def st_geomFromGeoJSON(s: pd.Series) -> pd.Series:
        import json

        def parse(js):
            o = json.loads(js)
            t = o["type"]
            c = o.get("coordinates")
            if t == "Point":
                return Point(c[0], c[1])
            if t == "LineString":
                return LineString(np.array(c))
            if t == "Polygon":
                return Polygon(np.array(c[0]), [np.array(h) for h in c[1:]])
            if t == "MultiPoint":
                return MultiPoint([Point(p[0], p[1]) for p in c])
            if t == "MultiLineString":
                return MultiLineString([LineString(np.array(p)) for p in c])
            if t == "MultiPolygon":
                return MultiPolygon([Polygon(np.array(p[0]), [np.array(h) for h in p[1:]]) for p in c])
            raise ValueError(t)

        return pd.Series([None if v is None else wkb_write(parse(v)) for v in s], dtype=object)

    reg("st_geomFromGeoJSON", st_geomFromGeoJSON)

    @pandas_udf(B)
    def st_makePoint(x: pd.Series, y: pd.Series) -> pd.Series:
        return encode_points(x.astype(np.float64).fillna(np.nan).to_numpy(),
                             y.astype(np.float64).fillna(np.nan).to_numpy())

    reg("st_makePoint", st_makePoint)
    reg("st_point", st_makePoint)

    @pandas_udf(B)
    def st_makePointM(x: pd.Series, y: pd.Series, m: pd.Series) -> pd.Series:
        return encode_points(x.astype(np.float64).to_numpy(), y.astype(np.float64).to_numpy())

    reg("st_makePointM", st_makePointM)

    @pandas_udf(B)
    def st_makeBBOX(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        out = []
        for a, b_, c, d in zip(xmin, ymin, xmax, ymax):
            if any(v is None or (isinstance(v, float) and np.isnan(v)) for v in (a, b_, c, d)):
                out.append(None)
                continue
            ring = np.array([[a, b_], [a, d], [c, d], [c, b_], [a, b_]], dtype=float)
            out.append(wkb_write(Polygon(ring)))
        return pd.Series(out, dtype=object)

    reg("st_makeBBOX", st_makeBBOX)
    reg("st_makeBox2D_coords", st_makeBBOX)

    @pandas_udf(B)
    def st_makeBox2D(p1: pd.Series, p2: pd.Series) -> pd.Series:
        g1 = decode_geoms(p1)
        g2 = decode_geoms(p2)
        out = []
        for a, b_ in zip(g1, g2):
            if a is None or b_ is None:
                out.append(None)
                continue
            ring = np.array([[a.x, a.y], [a.x, b_.y], [b_.x, b_.y], [b_.x, a.y], [a.x, a.y]])
            out.append(wkb_write(Polygon(ring)))
        return pd.Series(out, dtype=object)

    reg("st_makeBox2D", st_makeBox2D)

    @pandas_udf(B)
    def st_makeLine(pts: pd.Series) -> pd.Series:
        out = []
        for arr in pts:
            if arr is None:
                out.append(None)
                continue
            geoms = [wkb_read(bytes(p)) for p in arr]
            coords = np.array([[p.x, p.y] for p in geoms])
            out.append(wkb_write(LineString(coords)))
        return pd.Series(out, dtype=object)

    reg("st_makeLine", st_makeLine)

    @pandas_udf(B)
    def st_makePolygon(line: pd.Series) -> pd.Series:
        out = []
        for g in decode_geoms(line):
            if g is None:
                out.append(None)
            else:
                out.append(wkb_write(Polygon(g.coords)))
        return pd.Series(out, dtype=object)

    reg("st_makePolygon", st_makePolygon)
    reg("st_polygon", st_makePolygon)

    @pandas_udf(B)
    def st_geomFromGeoHash(s: pd.Series, prec: pd.Series) -> pd.Series:
        out = []
        for gh, p in zip(s, prec):
            if gh is None or p is None:
                out.append(None)
                continue
            # precision is in BITS (reference GeoHash API): truncate the
            # decode at p bits, not at whole base-32 chars only
            xmin, ymin, xmax, ymax = geohash_decode_bbox(gh, int(p))
            ring = np.array([[xmin, ymin], [xmin, ymax], [xmax, ymax], [xmax, ymin], [xmin, ymin]])
            out.append(wkb_write(Polygon(ring)))
        return pd.Series(out, dtype=object)

    reg("st_geomFromGeoHash", st_geomFromGeoHash)
    reg("st_box2DFromGeoHash", st_geomFromGeoHash)

    @pandas_udf(B)
    def st_pointFromGeoHash(s: pd.Series, prec: pd.Series) -> pd.Series:
        out = []
        for gh, p in zip(s, prec):
            if gh is None or p is None:
                out.append(None)
                continue
            x, y = geohash_decode_point(gh)
            out.append(wkb_write(Point(x, y)))
        return pd.Series(out, dtype=object)

    reg("st_pointFromGeoHash", st_pointFromGeoHash)

    # ---- accessors ----
    reg("st_boundary", _geom_unary(_boundary, B))
    reg("st_coordDim", _geom_unary(lambda g: 2, I))
    reg("st_dimension", _geom_unary(lambda g: K._dim(g), I))
    reg("st_envelope", _geom_unary(M.envelope_geom, B))
    reg("st_exteriorRing", _geom_unary(
        lambda g: LineString(g.shell) if isinstance(g, Polygon) else None, B))
    reg("st_interiorRingN", _geom_binary_int(
        lambda g, n: LineString(g.holes[n - 1]) if isinstance(g, Polygon) and 1 <= n <= len(g.holes) else None, B))
    reg("st_geometryN", _geom_binary_int(_geometry_n, B))
    reg("st_geometryType", _geom_unary(lambda g: {
        "Point": "Point", "LineString": "LineString", "Polygon": "Polygon",
        "MultiPoint": "MultiPoint", "MultiLineString": "MultiLineString",
        "MultiPolygon": "MultiPolygon", "GeometryCollection": "GeometryCollection",
    }[g.geom_type], S))
    reg("st_isClosed", _geom_unary(
        lambda g: g.is_closed if isinstance(g, LineString)
        else (all(x.is_closed for x in g.geoms) if isinstance(g, MultiLineString) else True), BO))
    reg("st_isCollection", _geom_unary(
        lambda g: isinstance(g, (MultiPoint, MultiLineString, MultiPolygon, GeometryCollection)), BO))
    reg("st_isEmpty", _geom_unary(lambda g: g.is_empty(), BO))
    reg("st_isRing", _geom_unary(
        lambda g: (g.is_closed and _is_simple(g)) if isinstance(g, LineString) else True, BO))
    reg("st_isSimple", _geom_unary(_is_simple, BO))
    reg("st_isValid", _geom_unary(_is_valid, BO))
    reg("st_numGeometries", _geom_unary(
        lambda g: len(g.geoms) if hasattr(g, "geoms") else 1, I))
    reg("st_numPoints", _geom_unary(_num_points, I))
    reg("st_pointN", _geom_binary_int(_point_n, B))

    @pandas_udf(D)
    def st_x(s: pd.Series) -> pd.Series:
        pts = try_decode_points(s)
        if pts is not None:
            x, _, isnull = pts
            out = pd.Series(x.astype(np.float64))
            out[isnull] = None
            return out
        return pd.Series([g.x if isinstance(g, Point) else None for g in decode_geoms(s)],
                         dtype=np.float64)

    @pandas_udf(D)
    def st_y(s: pd.Series) -> pd.Series:
        pts = try_decode_points(s)
        if pts is not None:
            _, y, isnull = pts
            out = pd.Series(y.astype(np.float64))
            out[isnull] = None
            return out
        return pd.Series([g.y if isinstance(g, Point) else None for g in decode_geoms(s)],
                         dtype=np.float64)

    reg("st_x", st_x)
    reg("st_y", st_y)

    # ---- casts ----
    reg("st_castToPoint", _geom_unary(lambda g: g if isinstance(g, Point) else None, B))
    reg("st_castToPolygon", _geom_unary(lambda g: g if isinstance(g, Polygon) else None, B))
    reg("st_castToLineString", _geom_unary(lambda g: g if isinstance(g, LineString) else None, B))
    @pandas_udf(B)
    def _cast_to_geometry(s: pd.Series) -> pd.Series:
        # identity on the engine's LE-WKB convention (see st_asBinary)
        return pd.Series(
            [None if v is None
             else (bytes(v) if len(v) > 0 and v[0] == 1
                   else wkb_write(wkb_read(bytes(v)))) for v in s],
            dtype=object)

    reg("st_castToGeometry", _cast_to_geometry)

    @pandas_udf(B)
    def st_byteArray(s: pd.Series) -> pd.Series:
        return pd.Series([None if v is None else v.encode("utf-8") for v in s], dtype=object)

    reg("st_byteArray", st_byteArray)

    # ---- outputs ----
    @pandas_udf(B)
    def st_asBinary(s: pd.Series) -> pd.Series:
        # identity on the engine's own little-endian WKB convention
        # (wkb.py): pass bytes through instead of a per-row decode +
        # re-encode; big-endian input still normalizes through the codec
        out = []
        for v in s:
            if v is None:
                out.append(None)
            elif len(v) > 0 and v[0] == 1:
                out.append(bytes(v))
            else:
                out.append(wkb_write(wkb_read(bytes(v))))
        return pd.Series(out, dtype=object)

    reg("st_asBinary", st_asBinary)
    reg("st_asText", _geom_unary(wkt_write, S))
    reg("st_asGeoJSON", _geom_unary(geojson_write, S))
    reg("st_asLatLonText", _geom_unary(
        lambda g: f"{_dms(g.y, 'N', 'S')} {_dms(g.x, 'E', 'W')}" if isinstance(g, Point) else None, S))

    @pandas_udf(S)
    def st_geoHash(s: pd.Series, prec: pd.Series) -> pd.Series:
        pts = try_decode_points(s)
        if pts is not None and prec.nunique() == 1:
            x, y, isnull = pts
            p = int(prec.dropna().iloc[0]) if prec.notna().any() else None
            if p is not None:
                gh = geohash_encode(np.nan_to_num(x), np.nan_to_num(y), p)
                out = pd.Series(gh, dtype=object)
                out[isnull | prec.isna().to_numpy()] = None
                return out
        out = []
        for g, p in zip(decode_geoms(s), prec):
            if g is None or p is None:
                out.append(None)
            else:
                c = M.centroid(g)
                out.append(geohash_encode([c.x], [c.y], int(p))[0])
        return pd.Series(out, dtype=object)

    reg("st_geoHash", st_geoHash)

    # ---- processing ----
    reg("st_antimeridianSafeGeom", _geom_unary(_antimeridian_safe, B))
    reg("st_idlSafeGeom", _geom_unary(_antimeridian_safe, B))
    reg("st_makeValid", _geom_unary(lambda g: g if _is_valid(g) else _make_valid(g), B))
    reg("st_convexHull", _geom_unary(M.convex_hull, B))

    @pandas_udf(B)
    def st_bufferPoint(s: pd.Series, meters: pd.Series) -> pd.Series:
        out = []
        for g, m_ in zip(decode_geoms(s), meters):
            if g is None or m_ is None or not isinstance(g, Point):
                out.append(None)
            else:
                out.append(wkb_write(M.buffer_point_geodesic(g.x, g.y, float(m_))))
        return pd.Series(out, dtype=object)

    reg("st_bufferPoint", st_bufferPoint)

    @pandas_udf(B)
    def st_translate(s: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
        out = []
        for g, a, b_ in zip(decode_geoms(s), dx, dy):
            if g is None or a is None or b_ is None:
                out.append(None)
            else:
                out.append(wkb_write(M.translate(g, float(a), float(b_))))
        return pd.Series(out, dtype=object)

    reg("st_translate", st_translate)

    @pandas_udf(B)
    def st_transform(s: pd.Series, f: pd.Series, t: pd.Series) -> pd.Series:
        out = []
        for g, a, b_ in zip(decode_geoms(s), f, t):
            if g is None or a is None or b_ is None:
                out.append(None)
            else:
                out.append(wkb_write(_transform(g, a, b_)))
        return pd.Series(out, dtype=object)

    reg("st_transform", st_transform)

    # ---- DE-9IM relations ----
    preds = {
        "st_contains": (K.contains, _fast_contains),
        "st_covers": (K.covers, _fast_covers),
        "st_coveredBy": (K.covered_by, _fast_coveredby),
        "st_crosses": (K.crosses, _fast_crosses),
        "st_disjoint": (K.disjoint, _fast_disjoint),
        "st_equals": (K.equals, _fast_equals),
        "st_intersects": (K.intersects, _fast_intersects),
        "st_overlaps": (K.overlaps, _fast_overlaps),
        "st_touches": (K.touches, _fast_touches),
        "st_within": (K.within, _fast_within),
    }
    for name, (fn, fast_loc) in preds.items():
        reg(name, _geom_binary(fn, BO, fast=_predicate_fast(fast_loc)))

    reg("st_relate", _geom_binary(K.relate, S))

    @pandas_udf(BO)
    def st_relateBool(s1: pd.Series, s2: pd.Series, pat: pd.Series) -> pd.Series:
        g1 = decode_geoms(s1)
        g2 = decode_geoms(s2)
        out = []
        for a, b_, p in zip(g1, g2, pat):
            if a is None or b_ is None or p is None:
                out.append(None)
            else:
                out.append(K.relate_bool(a, b_, p))
        return pd.Series(out, dtype=object)

    reg("st_relateBool", st_relateBool)

    # ---- measures ----
    reg("st_area", _geom_unary(M.area, D))
    reg("st_length", _geom_unary(M.length, D))
    reg("st_centroid", _geom_unary(M.centroid, B))
    reg("st_closestPoint", _geom_binary(M.closest_point, B))
    reg("st_distance", _geom_binary(
        M.distance, D, fast=_points_only_distance(lambda x1, y1, x2, y2: np.hypot(x2 - x1, y2 - y1))))
    reg("st_distanceSphere", _geom_binary(
        M.distance_sphere, D, fast=_points_only_distance(M.haversine_m)))
    reg("st_distanceSpheroid", _geom_binary(
        M.distance_spheroid, D, fast=_points_only_distance(lambda a, b_, c, d: M.vincenty_m(a, b_, c, d))))
    reg("st_lengthSphere", _geom_unary(
        lambda g: M.length_sphere(g) if isinstance(g, LineString) else None, D))
    reg("st_lengthSpheroid", _geom_unary(
        lambda g: M.length_spheroid(g) if isinstance(g, LineString) else None, D))

    @pandas_udf(D)
    def st_aggregateDistanceSphere(arr: pd.Series) -> pd.Series:
        out = []
        for pts in arr:
            if pts is None or len(pts) < 2:
                out.append(None)
                continue
            geoms = [wkb_read(bytes(p)) for p in pts]
            c = np.array([[p.x, p.y] for p in geoms])
            out.append(float(np.sum(M.haversine_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1]))))
        return pd.Series(out, dtype=np.float64)

    reg("st_aggregateDistanceSphere", st_aggregateDistanceSphere)

    @pandas_udf(D)
    def st_aggregateDistanceSpheroid(arr: pd.Series) -> pd.Series:
        out = []
        for pts in arr:
            if pts is None or len(pts) < 2:
                out.append(None)
                continue
            geoms = [wkb_read(bytes(p)) for p in pts]
            c = np.array([[p.x, p.y] for p in geoms])
            out.append(float(np.sum(M.vincenty_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1]))))
        return pd.Series(out, dtype=np.float64)

    reg("st_aggregateDistanceSpheroid", st_aggregateDistanceSpheroid)

    # ---- set-op scalars ----
    reg("st_intersection", _geom_binary(_intersection, B))
    reg("st_difference", _geom_binary(_difference, B))

    # ---- dwithin (engine extension mirroring CQL DWITHIN semantics) ----
    @pandas_udf(BO)
    def st_dwithin(s1: pd.Series, s2: pd.Series, meters: pd.Series) -> pd.Series:
        p1 = try_decode_points(s1)
        p2 = try_decode_points(s2)
        if (p1 is not None and p2 is not None
                and meters.notna().all() and meters.nunique() == 1):
            # fast path requires ALL meters non-null: a null distance must
            # propagate null (module null contract), not borrow the
            # batch's shared value
            x1, y1, n1 = p1
            x2, y2, n2 = p2
            m_ = float(meters.dropna().iloc[0])
            ok = dwithin_points(x1, y1, x2, y2, m_)
            out = pd.Series(list(ok), dtype=object)
            out[n1 | n2] = None
            return out
        g1 = decode_geoms(s1)
        g2 = decode_geoms(s2)
        out = []
        for a, b_, m_ in zip(g1, g2, meters):
            if a is None or b_ is None or m_ is None or pd.isna(m_):
                out.append(None)   # NaN: pandas hands nullable doubles
                # over as NaN, never None
            else:
                out.append(dwithin_geoms(a, b_, float(m_)))
        return pd.Series(out, dtype=object)

    reg("st_dwithin", st_dwithin)

    return spark


def _geom_binary_int(fn, ret_type):
    """(Geometry, int) -> Geometry|value UDF."""
    returns_geom = isinstance(ret_type, BinaryType)

    @pandas_udf(ret_type)
    def udf(s: pd.Series, n: pd.Series) -> pd.Series:
        out = []
        for g, k in zip(decode_geoms(s), n):
            if g is None or k is None:
                out.append(None)
                continue
            r = fn(g, int(k))
            if returns_geom and r is not None:
                r = wkb_write(r)
            out.append(r)
        return pd.Series(out, dtype=object)

    return udf


def _make_valid(g):
    # light-weight makeValid: close unclosed rings
    if isinstance(g, Polygon):
        rings = []
        for r in g.rings:
            if len(r) and not np.all(r[0] == r[-1]):
                r = np.vstack([r, r[:1]])
            rings.append(r)
        return Polygon(rings[0], rings[1:])
    return g


# --------------------------------------------------------------------------
# DWITHIN two-stage accept rule
# --------------------------------------------------------------------------

def dwithin_points(x1, y1, x2, y2, meters: float):
    """Vectorized two-stage DWITHIN for points.

    Port of the FastDWithin accept rule (geomesa-filter
    expression/FastDWithin.scala:42-54): accept when cartesian degree distance
    <= minDegrees; reject when > maxDegrees; otherwise exact geodesic
    (orthodromic/Vincenty) distance <= meters.
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    d_deg = np.hypot(x2 - x1, y2 - y1)
    out = np.zeros(d_deg.shape, dtype=bool)
    # per-row degree thresholds depend on location; compute on the undecided band
    # cheap global bounds first: degrees are between meters/111320 (lat) and huge
    min_possible = meters / 111_320.0 * 0.99
    sure_yes = d_deg <= min_possible
    out[sure_yes] = True
    undecided = ~sure_yes
    if np.any(undecided):
        exact = M.vincenty_m(x1[undecided], y1[undecided], x2[undecided], y2[undecided])
        out[undecided] = exact <= meters
    return out


def dwithin_geoms(a, b, meters: float) -> bool:
    from ..geom.measures import distance_degrees_geom, nearest_points, vincenty_m

    min_deg, max_deg = distance_degrees_geom(a, meters)
    pa, pb, d = nearest_points(a, b)
    if d > max_deg:
        return False
    if d <= min_deg:
        return True
    return float(vincenty_m(pa[0], pa[1], pb[0], pb[1])[0]) <= meters
