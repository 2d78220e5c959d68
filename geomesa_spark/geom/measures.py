"""Measures and geometric ops: area, length, centroid, distances, hulls.

Mirrors the reference scalar surface (geomesa-spark-jts
udf/SpatialRelationFunctions.scala:24-59, GeometricProcessingFunctions.scala:41-67,
geomesa-spark-sql GeometricDistanceFunctions.scala:21-51):

- st_area: planar shoelace area in deg^2 (JTS semantics).
- st_length: length for lines, perimeter for polygons (JTS getLength).
- st_distance: cartesian degrees (JTS DistanceOp).
- st_distanceSphere: haversine central angle x spatial4j mean earth radius
  6371.0087714 km (DistanceUtils.DEG_TO_KM * calc.distance * 1000).
- st_distanceSpheroid: Vincenty inverse on WGS84 (GeodeticCalculator
  orthodromic distance).
- st_bufferPoint: geodesic circle approximated by a 100-point polygon.

Vectorized variants (suffix ``_arr``) operate on coordinate arrays for the
hot paths (dwithin joins, kNN, track legs).
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

EARTH_MEAN_RADIUS_M = 6371008.7714  # spatial4j DistanceUtils.EARTH_MEAN_RADIUS_KM * 1000
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1 - WGS84_F)


def haversine_col(lon1, lat1, lon2, lat2):
    """The engine-exact haversine Column chain (meters on the spatial4j
    mean sphere) — ONE spelling shared by the dwithin sphere join, kNN
    sphere metric, geo_search and speed_outliers, so the single DuckDB
    mirror spelling (``radians(x)`` — probe-verified bit-equal to
    Spark's F.radians; ``(la2-la1)/2`` half-angles,
    ``2R * asin(sqrt(a))``) can never drift from any caller. Args are
    pyspark Columns (lon/lat degrees).
    """
    from pyspark.sql import functions as F

    la1, la2 = F.radians(lat1), F.radians(lat2)
    sd = F.sin((la2 - la1) / 2)
    sl = F.sin((F.radians(lon2) - F.radians(lon1)) / 2)
    a = sd * sd + F.cos(la1) * F.cos(la2) * sl * sl
    return F.lit(2.0 * EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(a))


# --------------------------------------------------------------------------
# planar measures
# --------------------------------------------------------------------------

def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(geom: Geometry) -> float:
    if isinstance(geom, Polygon):
        a = abs(ring_area(geom.shell))
        for h in geom.holes:
            a -= abs(ring_area(h))
        return a
    if isinstance(geom, (MultiPolygon, GeometryCollection)):
        return sum(area(g) for g in geom.geoms)
    return 0.0


def path_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def length(geom: Geometry) -> float:
    """JTS getLength: line length; polygon perimeter (all rings)."""
    if isinstance(geom, LineString):
        return path_length(geom.coords)
    if isinstance(geom, Polygon):
        return sum(path_length(r) for r in geom.rings)
    if isinstance(geom, (MultiLineString, MultiPolygon, GeometryCollection)):
        return sum(length(g) for g in geom.geoms)
    return 0.0


def centroid(geom: Geometry) -> Point:
    """JTS centroid: area-weighted (dim 2), length-weighted (dim 1), mean (dim 0)."""
    if isinstance(geom, Point):
        return Point(geom.x, geom.y)
    if isinstance(geom, MultiPoint):
        c = np.array([[g.x, g.y] for g in geom.geoms]).mean(axis=0)
        return Point(float(c[0]), float(c[1]))
    if isinstance(geom, (LineString, MultiLineString)):
        paths = [geom.coords] if isinstance(geom, LineString) else [g.coords for g in geom.geoms]
        sx = sy = total = 0.0
        for p in paths:
            d = np.diff(p, axis=0)
            seg_len = np.hypot(d[:, 0], d[:, 1])
            mids = (p[:-1] + p[1:]) / 2
            sx += float(np.sum(mids[:, 0] * seg_len))
            sy += float(np.sum(mids[:, 1] * seg_len))
            total += float(np.sum(seg_len))
        if total == 0:
            return Point(float(paths[0][0, 0]), float(paths[0][0, 1]))
        return Point(sx / total, sy / total)
    if isinstance(geom, (Polygon, MultiPolygon)):
        polys = [geom] if isinstance(geom, Polygon) else geom.geoms
        sx = sy = total = 0.0
        for poly in polys:
            for i, ring in enumerate(poly.rings):
                sign = 1.0 if i == 0 else -1.0
                x = ring[:-1, 0]
                y = ring[:-1, 1]
                x1 = ring[1:, 0]
                y1 = ring[1:, 1]
                cross = x * y1 - x1 * y
                a = float(np.sum(cross)) / 2.0
                # keep orientation-independent weights
                w = sign * abs(a) / (a if a != 0 else 1.0)
                sx += w * float(np.sum((x + x1) * cross)) / 6.0
                sy += w * float(np.sum((y + y1) * cross)) / 6.0
                total += sign * abs(a)
        if total == 0:
            return centroid(LineString(polys[0].shell))
        return Point(sx / total, sy / total)
    if isinstance(geom, GeometryCollection):
        # use highest dimension present (JTS rule); flatten Multi*/nested
        # GC members first so the Multi wrappers below hold simple parts
        def atoms(g):
            if isinstance(g, (GeometryCollection, MultiPolygon,
                              MultiLineString, MultiPoint)):
                out = []
                for m in g.geoms:
                    out.extend(atoms(m))
                return out
            return [g]

        parts = atoms(geom)
        polys = [g for g in parts if isinstance(g, Polygon)]
        if polys:
            return centroid(MultiPolygon(polys))
        lines = [g for g in parts if isinstance(g, LineString)]
        if lines:
            return centroid(MultiLineString(lines))
        pts = [g for g in parts if isinstance(g, Point)]
        if pts:
            return centroid(MultiPoint(pts))
    raise ValueError(geom)


def envelope_geom(geom: Geometry) -> Geometry:
    xmin, ymin, xmax, ymax = geom.envelope()
    if xmin == xmax and ymin == ymax:
        return Point(xmin, ymin)
    if xmin == xmax or ymin == ymax:
        # JTS GeometryFactory.toGeometry: degenerate envelope -> LineString
        return LineString(np.array([[xmin, ymin], [xmax, ymax]]))
    ring = np.array([[xmin, ymin], [xmin, ymax], [xmax, ymax], [xmax, ymin], [xmin, ymin]])
    return Polygon(ring)


# --------------------------------------------------------------------------
# cartesian distance (JTS DistanceOp semantics, degrees)
# --------------------------------------------------------------------------

def _segments_of(geom: Geometry) -> np.ndarray:
    """All line segments of the geometry as (n, 4) [x1 y1 x2 y2]."""
    segs = []
    def add_path(p):
        if len(p) >= 2:
            segs.append(np.hstack([p[:-1], p[1:]]))
    if isinstance(geom, LineString):
        add_path(geom.coords)
    elif isinstance(geom, Polygon):
        for r in geom.rings:
            add_path(r)
    elif isinstance(geom, (MultiLineString, MultiPolygon, GeometryCollection, MultiPoint)):
        for g in geom.geoms:
            s = _segments_of(g)
            if len(s):
                segs.append(s)
    if not segs:
        return np.zeros((0, 4))
    return np.vstack(segs)


def _vertices_of(geom: Geometry) -> np.ndarray:
    if isinstance(geom, Point):
        return np.array([[geom.x, geom.y]])
    if isinstance(geom, LineString):
        return geom.coords
    if isinstance(geom, Polygon):
        return np.vstack(geom.rings)
    return np.vstack([_vertices_of(g) for g in geom.geoms])


def point_segment_distance_arr(px, py, segs: np.ndarray):
    """Min distance from points to each segment + nearest point; vectorized.

    px, py: (n,) points; segs: (m,4). Returns (n,m) distances and
    (n,m,2) nearest points on segments.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1, y1, x2, y2 = segs[:, 0][None, :], segs[:, 1][None, :], segs[:, 2][None, :], segs[:, 3][None, :]
    dx = x2 - x1
    dy = y2 - y1
    L2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / L2
    t = np.where(L2 == 0, 0.0, np.clip(t, 0.0, 1.0))
    nx = x1 + t * dx
    ny = y1 + t * dy
    d = np.hypot(px - nx, py - ny)
    return d, np.stack([nx, ny], axis=-1)


def nearest_points(a: Geometry, b: Geometry):
    """(point-on-a, point-on-b, distance) — JTS DistanceOp.nearestPoints."""
    from .kernels import intersects as _intersects

    va = _vertices_of(a)
    vb = _vertices_of(b)
    sa = _segments_of(a)
    sb = _segments_of(b)

    best = (np.inf, None, None)
    # a-vertices vs b-segments
    if len(sb):
        d, np_on_b = point_segment_distance_arr(va[:, 0], va[:, 1], sb)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        if d[i, j] < best[0]:
            best = (float(d[i, j]), tuple(va[i]), tuple(np_on_b[i, j]))
    # b-vertices vs a-segments
    if len(sa):
        d, np_on_a = point_segment_distance_arr(vb[:, 0], vb[:, 1], sa)
        i, j = np.unravel_index(np.argmin(d), d.shape)
        if d[i, j] < best[0]:
            best = (float(d[i, j]), tuple(np_on_a[i, j]), tuple(vb[i]))
    # vertex-vertex (covers point-point)
    d2 = np.hypot(va[:, 0][:, None] - vb[:, 0][None, :], va[:, 1][:, None] - vb[:, 1][None, :])
    i, j = np.unravel_index(np.argmin(d2), d2.shape)
    if d2[i, j] < best[0]:
        best = (float(d2[i, j]), tuple(va[i]), tuple(vb[j]))

    dist, pa, pb = best
    if dist > 0 and _intersects(a, b):
        # overlapping interiors: distance 0 (proper crossing without close vertices)
        from .kernels import _all_intersections, _paths_of_any
        pts, _ = _all_intersections(_paths_of_any(a), _paths_of_any(b))
        if pts:
            return (pts[0], pts[0], 0.0)
        return (pa, pb, 0.0)
    return (pa, pb, dist)


def distance(a: Geometry, b: Geometry) -> float:
    return nearest_points(a, b)[2]


def closest_point(a: Geometry, b: Geometry) -> Point:
    pa, _, _ = nearest_points(a, b)
    return Point(pa[0], pa[1])


# --------------------------------------------------------------------------
# geodetic distances
# --------------------------------------------------------------------------

def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance on the mean sphere, meters. Vectorized."""
    lon1, lat1, lon2, lat2 = (np.asarray(v, dtype=np.float64) for v in (lon1, lat1, lon2, lat2))
    p1 = np.radians(lat1)
    p2 = np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2 - lon1)
    h = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def vincenty_m(lon1, lat1, lon2, lat2, iterations: int = 200, tol: float = 1e-12):
    """Vincenty inverse on WGS84, meters. Vectorized (fixed-point iteration)."""
    lon1, lat1, lon2, lat2 = (np.atleast_1d(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    U1 = np.arctan((1 - WGS84_F) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1 - WGS84_F) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    for _ in range(iterations):
        sinl, cosl = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt((cosU2 * sinl) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma != 0, cosU1 * cosU2 * sinl / np.where(sin_sigma == 0, 1, sin_sigma), 0.0)
        cos2_alpha = 1 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos2sm = np.where(cos2_alpha != 0, cos_sigma - 2 * sinU1 * sinU2 / np.where(cos2_alpha == 0, 1, cos2_alpha), 0.0)
        C = WGS84_F / 16 * cos2_alpha * (4 + WGS84_F * (4 - 3 * cos2_alpha))
        lam_new = L + (1 - C) * WGS84_F * sin_alpha * (
            sigma + C * sin_sigma * (cos2sm + C * cos_sigma * (-1 + 2 * cos2sm**2))
        )
        if np.all(np.abs(lam_new - lam) < tol):
            lam = lam_new
            break
        lam = lam_new

    sinl, cosl = np.sin(lam), np.cos(lam)
    sin_sigma = np.sqrt((cosU2 * sinl) ** 2 + (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
    cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
    sigma = np.arctan2(sin_sigma, cos_sigma)
    with np.errstate(divide="ignore", invalid="ignore"):
        sin_alpha = np.where(sin_sigma != 0, cosU1 * cosU2 * sinl / np.where(sin_sigma == 0, 1, sin_sigma), 0.0)
    cos2_alpha = 1 - sin_alpha**2
    with np.errstate(divide="ignore", invalid="ignore"):
        cos2sm = np.where(cos2_alpha != 0, cos_sigma - 2 * sinU1 * sinU2 / np.where(cos2_alpha == 0, 1, cos2_alpha), 0.0)
    u2 = cos2_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    dsig = B * sin_sigma * (cos2sm + B / 4 * (
        cos_sigma * (-1 + 2 * cos2sm**2)
        - B / 6 * cos2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2sm**2)
    ))
    out = WGS84_B * A * (sigma - dsig)
    # coincident points
    out = np.where(sin_sigma == 0, 0.0, out)
    return out


def vincenty_direct(lon, lat, azimuth_deg, dist_m):
    """Vincenty direct problem on WGS84: destination point. Vectorized."""
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    alpha1 = np.radians(np.atleast_1d(np.asarray(azimuth_deg, dtype=np.float64)))
    s = np.atleast_1d(np.asarray(dist_m, dtype=np.float64))

    sin_a1, cos_a1 = np.sin(alpha1), np.cos(alpha1)
    tanU1 = (1 - WGS84_F) * np.tan(np.radians(lat))
    cosU1 = 1 / np.sqrt(1 + tanU1**2)
    sinU1 = tanU1 * cosU1
    sigma1 = np.arctan2(tanU1, cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos2_alpha = 1 - sin_alpha**2
    u2 = cos2_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))

    sigma = s / (WGS84_B * A)
    for _ in range(100):
        cos2sm = np.cos(2 * sigma1 + sigma)
        sin_s, cos_s = np.sin(sigma), np.cos(sigma)
        dsig = B * sin_s * (cos2sm + B / 4 * (
            cos_s * (-1 + 2 * cos2sm**2)
            - B / 6 * cos2sm * (-3 + 4 * sin_s**2) * (-3 + 4 * cos2sm**2)
        ))
        sigma_new = s / (WGS84_B * A) + dsig
        if np.all(np.abs(sigma_new - sigma) < 1e-12):
            sigma = sigma_new
            break
        sigma = sigma_new

    sin_s, cos_s = np.sin(sigma), np.cos(sigma)
    cos2sm = np.cos(2 * sigma1 + sigma)
    tmp = sinU1 * sin_s - cosU1 * cos_s * cos_a1
    lat2 = np.arctan2(
        sinU1 * cos_s + cosU1 * sin_s * cos_a1,
        (1 - WGS84_F) * np.sqrt(sin_alpha**2 + tmp**2),
    )
    lam = np.arctan2(sin_s * sin_a1, cosU1 * cos_s - sinU1 * sin_s * cos_a1)
    C = WGS84_F / 16 * cos2_alpha * (4 + WGS84_F * (4 - 3 * cos2_alpha))
    L = lam - (1 - C) * WGS84_F * sin_alpha * (
        sigma + C * sin_s * (cos2sm + C * cos_s * (-1 + 2 * cos2sm**2))
    )
    lon2 = np.degrees(np.radians(lon) + L)
    return lon2, np.degrees(lat2)


def distance_sphere(a: Geometry, b: Geometry) -> float:
    """Reference fastDistance: haversine between representative coords."""
    pa, pb, _ = nearest_points(a, b)
    return float(haversine_m(pa[0], pa[1], pb[0], pb[1]))


def distance_spheroid(a: Geometry, b: Geometry) -> float:
    pa, pb, _ = nearest_points(a, b)
    return float(vincenty_m(pa[0], pa[1], pb[0], pb[1])[0])


def length_sphere(line: LineString) -> float:
    c = line.coords
    return float(np.sum(haversine_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1])))


def length_spheroid(line: LineString) -> float:
    c = line.coords
    return float(np.sum(vincenty_m(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1])))


def buffer_point_geodesic(lon: float, lat: float, meters: float, n_points: int = 100) -> Polygon:
    """Geodesic circle: n-point polygon (st_bufferPoint semantics)."""
    az = np.linspace(0, 360, n_points, endpoint=False)
    lon2, lat2 = vincenty_direct(np.full(n_points, lon), np.full(n_points, lat),
                                 az, np.full(n_points, meters))
    ring = np.column_stack([lon2, lat2])
    ring = np.vstack([ring, ring[:1]])
    return Polygon(ring)


def distance_degrees_point(lon: float, lat: float, meters: float):
    """(min_deg, max_deg) conversion of meters at a location.

    Port of GeometryUtils.directionalDegrees (GeometryUtils.scala:92-110):
    cartesian degree distance to geodesic destinations at az 90/-90 and 0/180;
    min over each pair guards AM/pole crossing.
    """
    lons = np.full(4, lon)
    lats = np.full(4, lat)
    az = np.array([90.0, -90.0, 0.0, 180.0])
    dlon, dlat = vincenty_direct(lons, lats, az, np.full(4, meters))
    deg = np.hypot(dlon - lon, dlat - lat)
    east = min(deg[0], deg[1])
    north = min(deg[2], deg[3])
    return (min(east, north), max(east, north))


def distance_degrees_geom(geom: Geometry, meters: float):
    """Envelope-corner version for non-points (GeometryUtils.scala:66-88)."""
    if isinstance(geom, Point):
        return distance_degrees_point(geom.x, geom.y, meters)
    xmin, ymin, xmax, ymax = geom.envelope()
    corners = [(xmax, ymax), (xmax, ymin), (xmin, ymin), (xmin, ymax)]
    ds = [distance_degrees_point(x, y, meters) for x, y in corners]
    return (min(d[0] for d in ds), max(d[1] for d in ds))


# --------------------------------------------------------------------------
# convex hull (Andrew monotone chain)
# --------------------------------------------------------------------------

def convex_hull_coords(coords: np.ndarray) -> Geometry:
    pts = np.unique(coords, axis=0)
    if len(pts) == 0:
        return GeometryCollection([])
    if len(pts) == 1:
        return Point(pts[0, 0], pts[0, 1])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) == 2:
        return LineString(hull)
    ring = np.vstack([hull, hull[:1]])
    return Polygon(ring)


def convex_hull(geom: Geometry) -> Geometry:
    return convex_hull_coords(_vertices_of(geom))


def translate(geom: Geometry, dx: float, dy: float) -> Geometry:
    if isinstance(geom, Point):
        return Point(geom.x + dx, geom.y + dy)
    if isinstance(geom, LineString):
        return LineString(geom.coords + np.array([dx, dy]))
    if isinstance(geom, Polygon):
        return Polygon(geom.shell + np.array([dx, dy]),
                       [h + np.array([dx, dy]) for h in geom.holes])
    return type(geom)([translate(g, dx, dy) for g in geom.geoms])
