"""Raster<->vector tiling: density grids with deterministic tile assignment.

Ports the reference density/heatmap surface as DataFrame ops:

- ``GridSnap``: snap coordinates to grid indices — exact semantics of
  geomesa-utils .../geotools/GridSnap.scala:60-82 (out-of-envelope -> -1,
  upper edge clamps to size-1, floor((x-min)/d) otherwise).
- ``bresenham_cells``: GridSnap.bresenhamLine:94-126 exact port (first cell
  included, ``take(delta)`` semantics — the segment's end cell is produced
  by the NEXT segment, matching RenderingGrid's line walker).
- ``render_*``: RenderingGrid.scala:43-221 — point/line/polygon rendering
  into a sparse (i, j) -> weight map, including the last-pixel dedup for
  line strings and the snapped-vertex polygon fill (AWT fillPolygon
  equivalent: even-odd rule over pixel centers of the vertex-snapped
  integer polygon) and >360-degree envelope x-translation (:299-330).
- ``density(df, ...)``: the distributed operator — rasterize each geometry
  in an Arrow-batched pandas UDF, explode, ``groupBy(i, j).sum(weight)``.
  This is exactly the reference's partial+final DensityScan shape
  (geomesa-index-api .../iterators/DensityScan.scala:94-105: per-scan
  partial grids, client-side merge): Spark's partial aggregation does the
  per-partition combine map-side, the shuffle moves only (i, j, partial)
  triples, never rows.
- ``density_points(df, xcol, ycol, ...)``: zero-Python fast path for point
  layers — tile indices via built-in floor/when expressions, stays inside
  whole-stage codegen. At 10^12 rows this is the hot path; the output is
  at most w*h rows regardless of input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StructField, StructType,
)

from ..geom.wkb import Geometry, Point, Polygon, wkb_read

__all__ = [
    "GridSnap", "bresenham_cells", "render_geometry",
    "density", "density_points", "density_pyramid", "vectorize_grid",
    "hex_cell_cols", "hex_center_cols", "hex_density", "zonal_stats",
    "decayed_density",
]

# sqrt(3)/3 and 2/3 as fixed double literals so every engine (Spark,
# DuckDB, a reimplementation) evaluates the IDENTICAL expression tree —
# cell assignment is then bit-reproducible across engines
_SQRT3_3 = 0.5773502691896257
_TWO_3 = 0.6666666666666666
_SQRT3 = 1.7320508075688772


def hex_cell_cols(lon, lat, size_deg: float) -> tuple[F.Column, F.Column]:
    """Axial (q, r) cell of a pointy-top hexagonal grid with circumradius
    ``size_deg`` degrees — the hex-binning analog of H3 cell assignment
    (true H3 is an icosahedral aperture-7 grid requiring its own cell
    database; the planar axial grid delivers the same hex-tiling
    semantics over lon/lat with closed-form math that any engine
    reproduces bit-for-bit).

    Fractional axial coords (Red Blob Games' canonical formulation):
    qf = (sqrt(3)/3 * x - y/3) / s, rf = (2/3 * y) / s; then cube
    rounding (round each of x=q, z=r, y=-q-r with floor(t + 0.5),
    re-derive the axis with the largest residual from the other two so
    q + r + s == 0 holds). floor(t + 0.5) is spelled literally — not
    round() — so engines with different half-rounding modes agree.
    """
    lon = F.col(lon) if isinstance(lon, str) else lon
    lat = F.col(lat) if isinstance(lat, str) else lat
    s = float(size_deg)
    qf = (F.lit(_SQRT3_3) * lon - lat / F.lit(3.0)) / F.lit(s)
    rf = (lat * F.lit(_TWO_3)) / F.lit(s)
    yf = -qf - rf
    rx, ry, rz = (F.floor(t + F.lit(0.5)) for t in (qf, yf, rf))
    dx = F.abs(rx.cast("double") - qf)
    dy = F.abs(ry.cast("double") - yf)
    dz = F.abs(rz.cast("double") - rf)
    c1 = (dx > dy) & (dx > dz)
    q = F.when(c1, -ry - rz).otherwise(rx).cast("long")
    r = F.when(~c1 & ~(dy > dz), -rx - ry).otherwise(rz).cast("long")
    return q, r


def hex_center_cols(q, r, size_deg: float) -> tuple[F.Column, F.Column]:
    """Center (lon, lat) of axial hex cell (q, r) — the inverse of
    :func:`hex_cell_cols` for rendering/vector export."""
    q = F.col(q) if isinstance(q, str) else q
    r = F.col(r) if isinstance(r, str) else r
    s = F.lit(float(size_deg))
    lon = s * (F.lit(_SQRT3) * q.cast("double")
               + F.lit(_SQRT3) / F.lit(2.0) * r.cast("double"))
    lat = s * (F.lit(1.5) * r.cast("double"))
    return lon, lat


def hex_density(df: DataFrame, xcol: str, ycol: str, size_deg: float,
                weight_col: str | None = None) -> DataFrame:
    """Hex-binned density: (hq, hr, weight) per occupied hex cell.

    The hexagonal twin of :func:`density_points` — pure-JVM whole-stage
    expressions (no Python), ONE map-side-combining aggregation whose
    shuffle carries only occupied (q, r, partial-sum) rows. Hot urban
    cells are single post-combine rows, so skew is absorbed before the
    exchange — the same argument as the rectangular density scan.
    """
    q, r = hex_cell_cols(xcol, ycol, size_deg)
    weight = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    return (df.select(q.alias("hq"), r.alias("hr"), weight.alias("__w__"))
              .groupBy("hq", "hr").agg(F.sum("__w__").alias("weight")))


def zonal_stats(grid: DataFrame, zones: DataFrame, zone_id_col: str,
                geom_col: str, xmin: float, ymin: float, xmax: float,
                ymax: float, w: int, h: int, weight_col: str = "weight",
                icol: str = "i", jcol: str = "j",
                predicate: str = "st_intersects") -> DataFrame:
    """Zonal statistics: per-zone count/sum/mean/min/max of raster-grid
    cell weights whose cell CENTER falls in the zone — the raster→vector
    aggregation twin of :func:`vectorize_grid` (the center rule, matching
    ``render_geometry``'s cell assignment). ``grid`` is a density-style
    frame (i, j, weight) over the given envelope; ``zones`` carries
    polygon WKB. Returns (zone_id, n_cells, total, mean_w, min_w, max_w).

    Scale shape: cell rows carry (center, weight) only — 24 bytes —
    into the broadcast cell-cover PIP join (zones are the small side by
    construction), then ONE combining aggregation on the zone id. With
    integer-valued weights (density counts) the per-zone double sums are
    exact, so results are summation-order independent.
    """
    from .spatial_join import pip_join
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    pts = grid.select(
        (F.lit(float(xmin)) + (F.col(icol).cast("double") + F.lit(0.5))
         * F.lit(float(dx))).alias("__cx__"),
        (F.lit(float(ymin)) + (F.col(jcol).cast("double") + F.lit(0.5))
         * F.lit(float(dy))).alias("__cy__"),
        F.col(weight_col).alias("__w__"))
    zs = zones.select(F.col(zone_id_col), F.col(geom_col))
    hits = pip_join(pts, zs, "__cx__", "__cy__", geom_col,
                    predicate=predicate, broadcast_polys=True)
    return (hits.groupBy(zone_id_col)
                .agg(F.count("*").alias("n_cells"),
                     F.sum("__w__").alias("total"),
                     (F.sum("__w__") / F.count("*")).alias("mean_w"),
                     F.min("__w__").alias("min_w"),
                     F.max("__w__").alias("max_w")))


class GridSnap:
    """Exact port of the reference GridSnap (GridSnap.scala:23-82)."""

    def __init__(self, xmin: float, ymin: float, xmax: float, ymax: float,
                 x_size: int, y_size: int):
        self.xmin, self.ymin, self.xmax, self.ymax = (
            float(xmin), float(ymin), float(xmax), float(ymax))
        self.x_size, self.y_size = int(x_size), int(y_size)
        self.dx = (self.xmax - self.xmin) / self.x_size
        self.dy = (self.ymax - self.ymin) / self.y_size
        self.x_offset = self.xmin + self.dx / 2
        self.y_offset = self.ymin + self.dy / 2
        # wide envelopes (>360 deg) replicate x pixels every 360 deg
        self.wide = (self.xmax - self.xmin) > 360.0

    def x(self, i): return self.x_offset + self.dx * i
    def y(self, j): return self.y_offset + self.dy * j

    def i(self, x) -> np.ndarray:
        """Vectorized column index; -1 outside the envelope."""
        x = np.asarray(x, dtype=np.float64)
        idx = np.floor((x - self.xmin) / self.dx).astype(np.int64)
        idx = np.minimum(idx, self.x_size - 1)
        return np.where((x < self.xmin) | (x > self.xmax), -1, idx)

    def j(self, y) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        idx = np.floor((y - self.ymin) / self.dy).astype(np.int64)
        idx = np.minimum(idx, self.y_size - 1)
        return np.where((y < self.ymin) | (y > self.ymax), -1, idx)

    def translate(self, x: float) -> list[int]:
        """All i-indices for x, replicated across 360-deg copies when the
        envelope spans more than the world (RenderingGrid.scala:299-330)."""
        if not self.wide:
            i = int(self.i(x))
            return [] if i == -1 else [i]
        out = []
        # shift x into [xmin, xmin+360) then step by 360
        t = x
        while t > self.xmin + 360.0:
            t -= 360.0
        while t < self.xmin:
            t += 360.0
        while t <= self.xmax:
            i = int(self.i(t))
            if i != -1:
                out.append(i)
            t += 360.0
        return out


def bresenham_cells(i0: int, j0: int, i1: int, j1: int) -> list[tuple[int, int]]:
    """GridSnap.bresenhamLine:94-126 exact port (take(delta) semantics)."""
    dx_, dy_ = abs(i1 - i0), abs(j1 - j0)
    if dx_ == 0 and dy_ == 0:
        return [(i0, j0)]
    sx = 1 if i0 < i1 else -1
    sy = 1 if j0 < j1 else -1
    out = []
    x, y = i0, j0
    if dx_ > dy_:
        derr = dy_ / dx_
        err = 0.0
        for _ in range(dx_):
            out.append((x, y))
            err += derr
            if err >= 0.5:
                err -= 1.0
                x, y = x + sx, y + sy
            else:
                x = x + sx
    else:
        derr = dx_ / dy_
        err = 0.0
        for _ in range(dy_):
            out.append((x, y))
            err += derr
            if err >= 0.5:
                err -= 1.0
                x, y = x + sx, y + sy
            else:
                y = y + sy
    return out


def _clip_segment(x0, y0, x1, y1, grid: "GridSnap"):
    """Liang-Barsky clip of a segment to the envelope; None if outside.

    The reference renders geometry INTERSECTED with the envelope
    (RenderingGrid.scala:93-103) — dropping straddling segments would
    silently undercount every trajectory crossing the viewport edge.
    """
    t0, t1 = 0.0, 1.0
    dx, dy = x1 - x0, y1 - y0
    for p, q in ((-dx, x0 - grid.xmin), (dx, grid.xmax - x0),
                 (-dy, y0 - grid.ymin), (dy, grid.ymax - y0)):
        if p == 0:
            if q < 0:
                return None
        else:
            r = q / p
            if p < 0:
                if r > t1:
                    return None
                if r > t0:
                    t0 = r
            else:
                if r < t0:
                    return None
                if r < t1:
                    t1 = r
    return (x0 + t0 * dx, y0 + t0 * dy, x0 + t1 * dx, y0 + t1 * dy)


def _clip_ring_to_envelope(ring: np.ndarray, grid: "GridSnap") -> np.ndarray:
    """Sutherland-Hodgman clip of a polygon ring to the envelope rect.

    Returns the clipped CLOSED ring ((n,2), first==last) or an empty
    array when the polygon lies outside. Exact for simple rings — the
    reference's polygon-with-envelope intersection before fillPolygon.
    """
    pts = [tuple(p) for p in ring[:-1]]

    def clip(points, inside, intersect):
        out = []
        n = len(points)
        for idx in range(n):
            cur, prv = points[idx], points[idx - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        return out

    def x_cut(bound):
        def f(a, b):
            t = (bound - a[0]) / (b[0] - a[0])
            return (bound, a[1] + t * (b[1] - a[1]))
        return f

    def y_cut(bound):
        def f(a, b):
            t = (bound - a[1]) / (b[1] - a[1])
            return (a[0] + t * (b[0] - a[0]), bound)
        return f

    for inside, cut in (
        (lambda p: p[0] >= grid.xmin, x_cut(grid.xmin)),
        (lambda p: p[0] <= grid.xmax, x_cut(grid.xmax)),
        (lambda p: p[1] >= grid.ymin, y_cut(grid.ymin)),
        (lambda p: p[1] <= grid.ymax, y_cut(grid.ymax)),
    ):
        pts = clip(pts, inside, cut)
        if not pts:
            return np.empty((0, 2))
    return np.array(pts + [pts[0]], dtype=np.float64)


def _fill_snapped_polygon(ii: np.ndarray, jj: np.ndarray) -> list[tuple[int, int]]:
    """Even-odd fill of the vertex-snapped integer polygon over pixel centers.

    Equivalent of RenderingGrid.scala:190-206's AWT
    ``graphics.fillPolygon(xPoints, yPoints, n)`` on a binary raster: the
    ring vertices are first snapped to grid indices, a pixel (i, j) is lit
    iff its center (i+0.5, j+0.5) is inside the snapped polygon under the
    even-odd rule.
    """
    if len(ii) < 3:
        return []
    imin, imax = int(ii.min()), int(ii.max())
    jmin, jmax = int(jj.min()), int(jj.max())
    xs = ii.astype(np.float64)
    ys = jj.astype(np.float64)
    out = []
    x0, x1 = xs, np.roll(xs, -1)
    y0, y1 = ys, np.roll(ys, -1)
    for j in range(jmin, jmax + 1):
        cy = j + 0.5
        crossing = (y0 <= cy) != (y1 <= cy)
        if not np.any(crossing):
            continue
        xc = x0[crossing] + (cy - y0[crossing]) * (x1[crossing] - x0[crossing]) / (y1[crossing] - y0[crossing])
        centers = np.arange(imin, imax + 1) + 0.5
        inside = (xc[None, :] > centers[:, None]).sum(axis=1) % 2 == 1
        for k in np.where(inside)[0]:
            out.append((imin + int(k), j))
    return out


def render_geometry(geom: Geometry, grid: GridSnap,
                    last: tuple[int, int] | None = None) -> list[tuple[int, int]]:
    """Cells touched by a geometry — RenderingGrid.render semantics.

    Returns cell list WITH multiplicity (a cell crossed twice by a line
    counts twice, matching the reference's ``pixels(i, j) += weight``).
    """
    from ..geom.wkb import LineString, MultiLineString, MultiPoint, MultiPolygon, GeometryCollection

    cells: list[tuple[int, int]] = []
    if isinstance(geom, Point):
        j = int(grid.j(geom.y))
        if j != -1:
            for i in grid.translate(geom.x):
                cells.append((i, j))
    elif isinstance(geom, MultiPoint):
        for p in geom.geoms:
            cells.extend(render_geometry(p, grid))
    elif isinstance(geom, LineString):
        pts = geom.coords
        i_n, j_n = (-1, -1) if last is None else last
        for n in range(1, len(pts)):
            p0, p1 = pts[n - 1], pts[n]
            clipped = _clip_segment(p0[0], p0[1], p1[0], p1[1], grid)
            if clipped is None:
                i_n, j_n = -1, -1   # discontinuity: reset last-pixel dedup
                continue
            cx0, cy0, cx1, cy1 = clipped
            i0s, j0 = grid.translate(cx0), int(grid.j(cy0))
            i1s, j1 = grid.translate(cx1), int(grid.j(cy1))
            if not i0s or j0 == -1 or not i1s or j1 == -1:
                i_n, j_n = -1, -1
                continue
            line = bresenham_cells(i0s[0], j0, i1s[0], j1)
            iF, jF = line[0]
            if (iF, jF) != (i_n, j_n):
                for i0n in i0s:
                    cells.append((iF - i0s[0] + i0n, jF))
            for (ci, cj) in line[1:]:
                for i0n in i0s:
                    cells.append((ci - i0s[0] + i0n, cj))
            i_n, j_n = line[-1]
        # reference's walker leaves the final vertex cell to the next
        # segment; the line's true last vertex cell is line[-1] already
    elif isinstance(geom, MultiLineString):
        for g in geom.geoms:
            cells.extend(render_geometry(g, grid))
    elif isinstance(geom, Polygon):
        # clip polygon ∩ envelope first (the reference's pre-render
        # intersection), then snap + fill; replicate across 360-degree
        # copies for wide envelopes like the point/line branches
        ring = _clip_ring_to_envelope(geom.rings[0], grid)
        if len(ring) >= 4:
            copies = grid.translate(float(ring[0, 0]))
            base_i = copies[0] if copies else -1
            ii = np.array([grid.translate(x)[0] if grid.translate(x) else -1
                           for x in ring[:, 0]])
            jj = grid.j(ring[:, 1])
            if base_i != -1 and not np.any(ii == -1) and not np.any(jj == -1):
                fill = _fill_snapped_polygon(np.asarray(ii[:-1]), np.asarray(jj[:-1]))
                for c in copies:
                    off = int(c) - int(base_i)
                    cells.extend((i + off, j) for (i, j) in fill)
    elif isinstance(geom, (MultiPolygon, GeometryCollection)):
        for g in geom.geoms:
            cells.extend(render_geometry(g, grid))
    return cells


_CELL_TYPE = ArrayType(StructType([
    StructField("i", IntegerType()), StructField("j", IntegerType()),
]))


def rasterize_udf(xmin: float, ymin: float, xmax: float, ymax: float,
                  w: int, h: int):
    """pandas UDF: WKB -> array<struct<i,j>> of touched cells."""
    grid = GridSnap(xmin, ymin, xmax, ymax, w, h)

    @F.pandas_udf(_CELL_TYPE)
    def rasterize(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(None)
            else:
                out.append([{"i": int(i), "j": int(j)}
                            for (i, j) in render_geometry(wkb_read(bytes(v)), grid)])
        return pd.Series(out, dtype=object)

    return rasterize


def density(df: DataFrame, geom_col: str,
            xmin: float, ymin: float, xmax: float, ymax: float,
            w: int, h: int, weight_col: str | None = None) -> DataFrame:
    """Density grid over WKB geometries -> (i, j, weight)."""
    weight = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    cells = rasterize_udf(xmin, ymin, xmax, ymax, w, h)
    exploded = (
        df.withColumn("__w__", weight)
          .withColumn("__c__", F.explode(cells(F.col(geom_col))))
          .select(F.col("__c__.i").alias("i"), F.col("__c__.j").alias("j"), "__w__")
    )
    return (exploded.groupBy("i", "j")
            .agg(F.sum("__w__").alias("weight"))
            .filter((F.col("i") >= 0) & (F.col("j") >= 0)))


def heatmap(grid_df: DataFrame, w: int, h: int, radius_px: int = 10) -> np.ndarray:
    """Gaussian-smoothed surface from a density grid — the reference's
    client-side final step (geomesa-process DensityProcess.scala:55-137,
    GeoTools HeatmapSurface): the distributed part is the sparse
    (i, j, weight) aggregation; the kernel smooth runs on the collected
    grid (at most w*h values regardless of input size).

    Returns an (h, w) float array (row j, col i).
    """
    surface = np.zeros((h, w), dtype=np.float64)
    for r in grid_df.select("i", "j", "weight").collect():
        if 0 <= r["i"] < w and 0 <= r["j"] < h:
            surface[r["j"], r["i"]] = r["weight"]
    if radius_px <= 0:
        return surface
    sigma = radius_px / 3.0
    half = radius_px
    xk = np.arange(-half, half + 1, dtype=np.float64)
    kernel = np.exp(-(xk * xk) / (2 * sigma * sigma))
    kernel /= kernel.sum()
    # separable convolution, zero-padded edges
    tmp = np.apply_along_axis(lambda row: np.convolve(row, kernel, mode="same"), 1, surface)
    return np.apply_along_axis(lambda col: np.convolve(col, kernel, mode="same"), 0, tmp)


def density_points(df: DataFrame, xcol: str, ycol: str,
                   xmin: float, ymin: float, xmax: float, ymax: float,
                   w: int, h: int, weight_col: str | None = None) -> DataFrame:
    """Pure-JVM density for point layers (no Python on the hot path).

    Same GridSnap assignment expressed with built-in expressions; rows
    outside the envelope are dropped (the reference's -1 cells).
    """
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    i = F.least(F.floor((F.col(xcol) - xmin) / dx), F.lit(w - 1)).cast("int")
    j = F.least(F.floor((F.col(ycol) - ymin) / dy), F.lit(h - 1)).cast("int")
    weight = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    return (
        df.filter((F.col(xcol) >= xmin) & (F.col(xcol) <= xmax)
                  & (F.col(ycol) >= ymin) & (F.col(ycol) <= ymax))
          .select(i.alias("i"), j.alias("j"), weight.alias("__w__"))
          .groupBy("i", "j").agg(F.sum("__w__").alias("weight"))
    )


def density_pyramid(base: DataFrame, levels: int, icol: str = "i",
                    jcol: str = "j", wcol: str = "weight") -> DataFrame:
    """Zoom pyramid over a base density grid: level ``levels`` is the
    input; each coarser level halves both axes (i >> 1, j >> 1) and
    sums — the slippy-map / COG-overview scheme the reference's density
    tiles feed ("geomesa-process .../DensityProcess.scala" renders one
    zoom; serving a map needs the stack). Returns (level, i, j, weight)
    for levels ``levels`` down to 0.

    Scale shape: every base cell explodes to its ``levels + 1``
    ancestors (level, i >> s, j >> s) and ONE grouped aggregation sums
    the whole stack — two exchanges total regardless of depth, with
    map-side combine doing the per-level rollup. (A per-level cascade
    reads prettier but Spark recomputes each union branch's lineage:
    measured 21 exchanges for a 6-level stack vs 2 here.) Unit-weight
    sums are integer-valued doubles (exact to 2^53), so the stack is
    bit-reproducible regardless of aggregation order.
    """
    ancestors = F.array(*[
        F.struct(F.lit(lvl).alias("level"),
                 F.shiftright(F.col(icol), levels - lvl).alias(icol),
                 F.shiftright(F.col(jcol), levels - lvl).alias(jcol))
        for lvl in range(levels, -1, -1)])
    return (base.select(F.explode(ancestors).alias("__a__"), F.col(wcol))
                .groupBy(F.col("__a__.level").alias("level"),
                         F.col(f"__a__.{icol}").alias(icol),
                         F.col(f"__a__.{jcol}").alias(jcol))
                .agg(F.sum(wcol).alias(wcol)))


def vectorize_grid(grid: DataFrame,
                   xmin: float, ymin: float, xmax: float, ymax: float,
                   w: int, h: int, breaks: list[float],
                   icol: str = "i", jcol: str = "j",
                   wcol: str = "weight") -> DataFrame:
    """Raster -> vector: dissolve a density grid into per-band
    rectilinear polygons (the inverse of ``density``; together they are
    the raster<->vector tiling pair — the reference renders rasters from
    vectors via DensityScan, this recovers vector regions from the
    raster for downstream spatial joins).

    ``breaks`` are ascending band thresholds: a cell with weight ``v``
    lands in band ``#{b in breaks : v >= b}`` (band 0 = below every
    break). Adjacent same-band cells in a row are merged into one
    rectangle by gaps-and-islands (run key = i - row_number per
    (band, j) — one window, one grouped agg; both stages shuffle only
    the occupied-cell rows, bounded by w*h regardless of input size).

    Returns one row per run: (band, j, i0, i1, ncells, total_weight,
    x0, y0, x1, y1) with world-coordinate rectangle edges. Every
    expression is a Spark built-in — whole-stage codegen end to end,
    and the identical formulation runs in ANSI SQL (the driver oracle).
    """
    if list(breaks) != sorted(breaks):
        raise ValueError(f"breaks must be ascending: {breaks}")
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    v = F.col(wcol).cast("double")
    band = sum((v >= F.lit(float(b))).cast("int") for b in breaks)

    win = Window.partitionBy("band", jcol).orderBy(icol)
    runs = (grid.select(F.col(icol), F.col(jcol), v.alias("__v__"),
                        band.alias("band"))
                .withColumn("__grp__", F.col(icol) - F.row_number().over(win)))
    out = (runs.groupBy("band", jcol, "__grp__")
               .agg(F.min(icol).alias("i0"), F.max(icol).alias("i1"),
                    F.count("*").alias("ncells"),
                    F.sum("__v__").alias("total_weight"))
               .drop("__grp__"))
    return out.select(
        "band", F.col(jcol).alias("j"), "i0", "i1", "ncells", "total_weight",
        (F.lit(xmin) + F.col("i0") * F.lit(dx)).alias("x0"),
        (F.lit(ymin) + F.col(jcol) * F.lit(dy)).alias("y0"),
        (F.lit(xmin) + (F.col("i1") + 1) * F.lit(dx)).alias("x1"),
        (F.lit(ymin) + (F.col(jcol) + 1) * F.lit(dy)).alias("y1"))


def decayed_density(df: DataFrame, xcol: str, ycol: str, ts_col: str,
                    ref_ts: str, half_life_s: float,
                    xmin: float, ymin: float, xmax: float, ymax: float,
                    w: int, h: int, id_col: str | None = None) -> DataFrame:
    """Freshness-weighted density: each event contributes
    ``0.5 ** (age / half_life)`` toward its tile, ages measured back
    from ``ref_ts`` (an ISO timestamp string — pass the analysis time
    explicitly; "now()" would break retry-stability). The recency
    surface of live dashboards: yesterday's burst fades, last hour's
    dominates.

    Same GridSnap assignment and single combining agg as
    `density_points`; ages are exact integer microseconds, and with
    ``id_col`` set the per-cell sum becomes an id-ordered fold (the
    idw_grid convention) so the float chain is engine-reproducible —
    the returned weight is float32 (``weight32``), absorbing the
    <=1-ulp pow() library differences. Events after ``ref_ts`` are
    dropped (negative age = not yet happened at analysis time).
    """
    if not (float(half_life_s) > 0.0):
        # 0 would make the exponent Inf/NaN silently; negative inverts
        # decay into growth — both are caller bugs, fail fast
        raise ValueError(f"half_life_s must be > 0, got {half_life_s}")
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    i = F.least(F.floor((F.col(xcol) - xmin) / dx), F.lit(w - 1)).cast("int")
    j = F.least(F.floor((F.col(ycol) - ymin) / dy), F.lit(h - 1)).cast("int")
    ts_type = df.schema[ts_col].dataType.simpleString()
    age_us = F.timestamp_diff("MICROSECOND", F.col(ts_col),
                              F.lit(ref_ts).cast(ts_type))
    wexp = F.pow(F.lit(0.5), age_us.cast("double")
                 / F.lit(float(half_life_s) * 1e6))
    base = (df.filter((F.col(xcol) >= xmin) & (F.col(xcol) <= xmax)
                      & (F.col(ycol) >= ymin) & (F.col(ycol) <= ymax)
                      & (age_us >= 0))
              .select(i.alias("i"), j.alias("j"), wexp.alias("__w__"),
                      (F.col(id_col) if id_col else F.lit(0)).alias("__id__")))
    if id_col is not None:
        agg = F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("__id__"),
                                                 F.col("__w__")))),
            F.lit(0.0), lambda acc, s: acc + s["__w__"])
    else:
        agg = F.sum("__w__")
    return (base.groupBy("i", "j")
                .agg(agg.cast("float").alias("weight32")))
