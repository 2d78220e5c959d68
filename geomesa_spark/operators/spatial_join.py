"""Spatial joins: cell-cover prefilter (Z2 equi-join) + exact vectorized refine.

Re-expresses the reference's grid-partition + sweepline join
(geomesa-spark-sql GeoMesaJoinRelation.scala:41-91, RelationUtils.grid:30-70)
as idiomatic DataFrame ops:

1. Both sides get Z2 cell keys at a fixed level L (the reference's grid
   envelopes become statically-defined SFC cells, so both sides are always
   "partitioned compatibly" and the reference's ``cover`` repartition problem
   disappears).
2. Points map to exactly ONE cell; extended geometries explode to all cells
   covering their (expanded) bbox. The equi-join on the cell key is the
   prefilter — Catalyst plans a shuffled hash join (or broadcast when the
   polygon side is small), AQE handles skewed cells at runtime.
3. An Arrow-batched refine evaluates the exact predicate per candidate pair,
   decoding each distinct polygon once per batch and running the vectorized
   PIP kernel over all its candidate points (zero per-row Python).

Pair dedup: a point occupies one cell, so point-joins produce each pair at
most once (no dedup shuffle needed — unlike the reference, which duplicates
both sides and leaves a TODO at RelationUtils.scala:38). Extended x extended
joins DO duplicate pairs across cells and get a dropDuplicates on the pair id.

Skew: pass ``salt=N`` to spread a hot cell over N shuffle keys (the
reference's shard byte, ShardStrategy.scala:42-83); AQE skew-join is the
backstop. At 10^12-row scale prefer level>=8 so cells are granular enough
for AQE to split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StructField, StructType,
)

from ..curves.zorder import z2_encode
from ..curves.norm import normalized_lat, normalized_lon
from ..geom import kernels as K
from ..geom import measures as M
from ..geom.wkb import Point, Polygon, wkb_read
from ..functions.registry import dwithin_geoms

DEFAULT_LEVEL = 8  # 2^8 x 2^8 world grid; cells ~1.4 x 0.7 degrees

_LON = normalized_lon(31)
_LAT = normalized_lat(31)


def cell_expr_of_points(x, y, level: int = DEFAULT_LEVEL):
    """Pure-JVM Column: (x, y) -> Z2 cell id at ``level``.

    Bit-identical to :func:`cell_of_points` (same floor-normalization and
    interleave as the numpy kernel / Z2.scala:58-78) but expressed with
    built-in floor/shift/mask expressions, so the 10^12-row point side of a
    join never crosses the Arrow boundary — the cell key stays inside
    whole-stage codegen.
    """
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    cx = F.greatest(F.least(x, F.lit(180.0)), F.lit(-180.0))
    cy = F.greatest(F.least(y, F.lit(90.0)), F.lit(-90.0))
    ix = F.least(F.floor((cx + 180.0) * (2147483648.0 / 360.0)),
                 F.lit((1 << 31) - 1)).cast("long")
    iy = F.least(F.floor((cy + 90.0) * (2147483648.0 / 180.0)),
                 F.lit((1 << 31) - 1)).cast("long")
    ixl = F.shiftright(ix, 31 - level)
    iyl = F.shiftright(iy, 31 - level)
    cell = F.lit(0).cast("long")
    for b in range(level):
        cell = (cell
                + F.shiftleft(F.shiftright(ixl, b).bitwiseAND(F.lit(1)), 2 * b)
                + F.shiftleft(F.shiftright(iyl, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    return cell


def cell_of_points(level: int = DEFAULT_LEVEL):
    """pandas UDF: (x, y) -> Z2 cell id at the given level (one cell/point)."""
    shift = np.uint64(2 * (31 - level))

    @pandas_udf(LongType())
    def cell(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        nx = _LON.normalize(np.clip(xs, -180.0, 180.0))
        ny = _LAT.normalize(np.clip(ys, -90.0, 90.0))
        z = z2_encode(nx, ny).astype(np.uint64) >> shift
        out = pd.Series(z.astype(np.int64))
        out[x.isna().to_numpy() | y.isna().to_numpy()] = None
        return out

    return cell


def cells_of_bbox_arrays(xmin, ymin, xmax, ymax, level: int):
    """Vectorized bbox -> list of covering cell ids (python list per row)."""
    n = 1 << level
    shift = 31 - level
    ix0 = (_LON.normalize(np.clip(xmin, -180.0, 180.0)) >> shift).astype(np.int64)
    ix1 = (_LON.normalize(np.clip(xmax, -180.0, 180.0)) >> shift).astype(np.int64)
    iy0 = (_LAT.normalize(np.clip(ymin, -90.0, 90.0)) >> shift).astype(np.int64)
    iy1 = (_LAT.normalize(np.clip(ymax, -90.0, 90.0)) >> shift).astype(np.int64)
    out = []
    for a, b, c, d in zip(ix0, ix1, iy0, iy1):
        xs = np.arange(a, b + 1, dtype=np.int64)
        ys = np.arange(c, d + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        out.append([int(v) for v in z2_encode(gx.ravel(), gy.ravel())])
    return out


def cells_of_disk_arrays(xs, ys, rlon, rlat, level: int):
    """Covering cells of per-point expanded bboxes WITH antimeridian wrap.

    A window crossing the +-180 line splits into two windows (the
    reference's IDL handling, FilterHelper.addWayPointsToBBOX /
    st_antimeridianSafeGeom semantics); cell lists are merged per row.
    """
    base = cells_of_bbox_arrays(xs - rlon, ys - rlat, xs + rlon, ys + rlat, level)
    lo = xs - rlon
    hi = xs + rlon
    wrap_lo = lo < -180.0
    wrap_hi = hi > 180.0
    if np.any(wrap_lo):
        idx = np.where(wrap_lo)[0]
        extra = cells_of_bbox_arrays(lo[idx] + 360.0, (ys - rlat)[idx],
                                     np.full(len(idx), 180.0), (ys + rlat)[idx], level)
        for k, i in enumerate(idx):
            base[i] = sorted(set(base[i]) | set(extra[k]))
    if np.any(wrap_hi):
        idx = np.where(wrap_hi)[0]
        extra = cells_of_bbox_arrays(np.full(len(idx), -180.0), (ys - rlat)[idx],
                                     hi[idx] - 360.0, (ys + rlat)[idx], level)
        for k, i in enumerate(idx):
            base[i] = sorted(set(base[i]) | set(extra[k]))
    return base


def sphere_expand_degrees(ys, radius_m):
    """Conservative meters -> per-dim degree expansion at each latitude.

    radius_m may be a scalar or a per-row array. The longitude expansion
    is evaluated at the radius-expanded latitude so the cover is a true
    superset of the spherical disk. Both divisors are BELOW the sphere's
    actual meters-per-degree (R*pi/180 = 111,194.93 for R=6371008.7714),
    so the expansion strictly over-covers — an under-expanded window
    would silently drop matching rows from the prefilter.
    """
    ys = np.asarray(ys, dtype=np.float64)
    r = np.broadcast_to(np.asarray(radius_m, dtype=np.float64), ys.shape)
    rlat = r / 110_540.0
    phi = np.clip(np.abs(ys) + rlat, 0.0, 89.9)
    rlon = r / (110_540.0 * np.cos(np.radians(phi)))
    return rlon, rlat


def cells_of_geom(level: int = DEFAULT_LEVEL, expand_deg: float = 0.0):
    """pandas UDF: WKB geometry -> array of covering cell ids (bbox cover)."""

    @pandas_udf(ArrayType(LongType()))
    def cover(s: pd.Series) -> pd.Series:
        n = len(s)
        xmin = np.empty(n)
        ymin = np.empty(n)
        xmax = np.empty(n)
        ymax = np.empty(n)
        null = np.zeros(n, dtype=bool)
        for i, v in enumerate(s):
            if v is None:
                null[i] = True
                xmin[i] = ymin[i] = xmax[i] = ymax[i] = 0.0
                continue
            e = wkb_read(bytes(v)).envelope()
            xmin[i], ymin[i], xmax[i], ymax[i] = e
        covers = cells_of_bbox_arrays(xmin - expand_deg, ymin - expand_deg,
                                      xmax + expand_deg, ymax + expand_deg, level)
        return pd.Series([None if null[i] else covers[i] for i in range(n)], dtype=object)

    return cover


def _is_axis_rect(geom) -> tuple | None:
    """(xmin, ymin, xmax, ymax) if geom is an axis-aligned rectangle ring."""
    if not isinstance(geom, Polygon) or len(geom.rings) != 1:
        return None
    r = geom.rings[0]
    if len(r) != 5:
        return None
    e = geom.envelope()
    xs = set(float(v) for v in r[:, 0])
    ys = set(float(v) for v in r[:, 1])
    if xs == {e[0], e[2]} and ys == {e[1], e[3]}:
        return e
    return None


_CELL_FLAG_TYPE = ArrayType(StructType([
    StructField("c", LongType()), StructField("full", BooleanType()),
]))

# margin (degrees) >> the ~1e-13 deg fp window of the floor normalization,
# so a boundary-misassigned point can never be wrongly fast-accepted
_FULL_EPS = 1e-9


def _full_cells_polygon(geom: Polygon, cells: np.ndarray, level: int) -> np.ndarray:
    """Which covering cells lie STRICTLY inside the polygon (holes honored).

    Exact + conservative: a cell is full iff its eps-expanded rect is
    crossed by no ring edge AND its center is in the open interior. The
    edge/rect test is the standard segment-vs-AABB separating test
    (bbox overlap + rect corners straddling the edge line), vectorized
    over (cells x edges); degenerate touches count as crossings, so any
    error is toward full=False (never a wrong fast-accept).
    """
    from ..curves.zorder import z2_decode

    ix, iy = z2_decode(cells)
    sx = 360.0 / (1 << level)
    sy = 180.0 / (1 << level)
    x0 = -180.0 + ix * sx
    y0 = -90.0 + iy * sy
    rx0, ry0 = x0 - _FULL_EPS, y0 - _FULL_EPS
    rx1, ry1 = x0 + sx + _FULL_EPS, y0 + sy + _FULL_EPS

    loc = K.pip_rings(x0 + sx / 2.0, y0 + sy / 2.0, geom.rings)
    full = loc == 1
    if not full.any():
        return full

    for ring in geom.rings:
        ex0, ey0 = ring[:-1, 0], ring[:-1, 1]
        ex1, ey1 = ring[1:, 0], ring[1:, 1]
        bx0, bx1 = np.minimum(ex0, ex1), np.maximum(ex0, ex1)
        by0, by1 = np.minimum(ey0, ey1), np.maximum(ey0, ey1)
        ov = ((bx0[None, :] <= rx1[:, None]) & (bx1[None, :] >= rx0[:, None])
              & (by0[None, :] <= ry1[:, None]) & (by1[None, :] >= ry0[:, None]))
        if not ov.any():
            continue
        dx, dy = (ex1 - ex0)[None, :], (ey1 - ey0)[None, :]
        c1 = dx * (ry0[:, None] - ey0[None, :]) - dy * (rx0[:, None] - ex0[None, :])
        c2 = dx * (ry0[:, None] - ey0[None, :]) - dy * (rx1[:, None] - ex0[None, :])
        c3 = dx * (ry1[:, None] - ey0[None, :]) - dy * (rx0[:, None] - ex0[None, :])
        c4 = dx * (ry1[:, None] - ey0[None, :]) - dy * (rx1[:, None] - ex0[None, :])
        one_side = (((c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0))
                    | ((c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)))
        full &= ~(ov & ~one_side).any(axis=1)
        if not full.any():
            break
    return full


def _flagged_cover_of_wkb(wkb: bytes, level: int):
    """(cells:int64[], full:bool[]) covering one WKB geometry."""
    g = wkb_read(wkb)
    e = g.envelope()
    cells = cells_of_bbox_arrays(
        np.array([e[0]]), np.array([e[1]]), np.array([e[2]]), np.array([e[3]]),
        level)[0]
    arr = np.array(cells, dtype=np.int64)
    rect = _is_axis_rect(g)
    if rect is not None:
        from ..curves.zorder import z2_decode
        ix, iy = z2_decode(arr)
        sx = 360.0 / (1 << level)
        sy = 180.0 / (1 << level)
        cx0 = -180.0 + ix * sx
        cy0 = -90.0 + iy * sy
        full = ((cx0 > rect[0] + _FULL_EPS) & (cx0 + sx < rect[2] - _FULL_EPS)
                & (cy0 > rect[1] + _FULL_EPS) & (cy0 + sy < rect[3] - _FULL_EPS))
    elif isinstance(g, Polygon):
        full = _full_cells_polygon(g, arr, level)
    else:
        full = np.zeros(len(arr), dtype=bool)
    return arr, full


def cells_of_geom_flagged(level: int = DEFAULT_LEVEL):
    """pandas UDF: WKB -> array<struct<c, full>> covering cells.

    ``full`` marks cells whose bbox lies strictly inside the geometry —
    every point in such a cell satisfies contains/within/intersects/covers
    without the exact kernel. This is the reference's loose-bbox /
    useFullFilter optimization (Z2IndexKeySpace.scala:129-141: skip exact
    re-check for rectangular predicates) generalized to per-cell flags
    for ARBITRARY polygons (holes included) via the segment-vs-cell test
    in :func:`_full_cells_polygon`; axis rects keep the 4-comparison fast
    path. Non-polygon geometries get full=False everywhere.
    """

    @pandas_udf(_CELL_FLAG_TYPE)
    def cover(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            arr, full = _flagged_cover_of_wkb(bytes(v), level)
            out.append([{"c": int(c), "full": bool(f)} for c, f in zip(arr, full)])
        return pd.Series(out, dtype=object)

    return cover


def _auto_level(wkbs, target_cells_across: float = 16.0,
                max_broadcast_cells: int = 4_000_000,
                lo: int = 8, hi: int = 14) -> int:
    """Pick the join cell level from the polygon size distribution.

    Finer cells raise the interior (full-cell) fast-accept fraction —
    boundary cells scale with perimeter, interior with area — but each
    level quadruples the exploded broadcast rows; back off until the
    estimated cell-row count fits the broadcast budget.
    """
    exts = [max(e[2] - e[0], e[3] - e[1])
            for e in (wkb_read(w).envelope() for w in wkbs)]
    if not exts:
        return 10
    med = float(np.median(exts))
    if med <= 0:
        return hi
    lvl = int(np.ceil(np.log2(max(360.0 * target_cells_across / med, 2.0))))
    lvl = min(max(lvl, lo), hi)
    while lvl > lo:
        cell = 360.0 / (1 << lvl)
        if len(exts) * (med / cell + 1.0) ** 2 <= max_broadcast_cells:
            break
        lvl -= 1
    return lvl


def _pip_refine_udf(predicate: str, with_flag: bool = False):
    """Refine candidates: vectorized PIP per distinct polygon in the batch.

    Sort-based grouping (argsort on factorized polygon codes) keeps the
    batch cost O(n log n) instead of O(uniques * n); rows whose cell was
    flagged fully-contained bypass the kernel entirely.
    """
    accept_inside_only = predicate in ("st_contains", "st_within")

    def _refine_arrays(xs, ys, poly_wkb, full=None) -> np.ndarray:
        out = np.zeros(len(xs), dtype=bool)
        codes, uniques = pd.factorize(poly_wkb)
        todo = np.arange(len(xs)) if full is None else np.where(~full)[0]
        if full is not None:
            out[full] = True
        if len(todo) == 0:
            return out
        sub = codes[todo]
        order = todo[np.argsort(sub, kind="stable")]
        sorted_codes = codes[order]
        starts = np.searchsorted(sorted_codes, np.arange(len(uniques)))
        ends = np.append(starts[1:], len(sorted_codes))
        for u_idx, wkb in enumerate(uniques):
            idx = order[starts[u_idx]:ends[u_idx]]
            if wkb is None or len(idx) == 0:
                continue
            geom = wkb_read(bytes(wkb))
            rings = geom.rings if isinstance(geom, Polygon) else None
            if rings is not None:
                loc = K.pip_rings(xs[idx], ys[idx], rings)
                out[idx] = (loc == 1) if accept_inside_only else (loc >= 0)
            else:
                # non-polygon right side: exact kernel per pair (rare path)
                fn = K.contains if accept_inside_only else K.intersects
                for i in idx:
                    out[i] = fn(geom, Point(xs[i], ys[i]))
        return out

    if with_flag:
        @pandas_udf(BooleanType())
        def refine(x: pd.Series, y: pd.Series, poly_wkb: pd.Series,
                   full: pd.Series) -> pd.Series:
            return pd.Series(_refine_arrays(
                x.to_numpy(np.float64), y.to_numpy(np.float64), poly_wkb,
                full.fillna(False).to_numpy(bool)))
    else:
        @pandas_udf(BooleanType())
        def refine(x: pd.Series, y: pd.Series, poly_wkb: pd.Series) -> pd.Series:
            return pd.Series(_refine_arrays(
                x.to_numpy(np.float64), y.to_numpy(np.float64), poly_wkb))

    return refine


class PreparedPipPolys:
    """Broadcast-side PIP index built once and reused across joins.

    The reference amortizes index construction across queries (the store's
    Z-curve keys are written at ingest); this is the same separation for
    the broadcast join path: collect distinct polygons, choose the cell
    level, compute the (pid, cell, full) cover DRIVER-side in numpy (a few
    ms per thousand polygons — far cheaper than a distributed explode +
    collect round-trip), and keep the broadcast dict + a small Arrow-backed
    cells DataFrame ready.
    """

    def __init__(self, spark, pmap: dict, level: int, cells_df: DataFrame,
                 geoms_df: DataFrame, any_full: bool):
        self.spark = spark
        self.pmap = pmap
        self.level = level
        self.cells_df = cells_df
        self.geoms_df = geoms_df
        self.any_full = any_full
        self.bmap = spark.sparkContext.broadcast(pmap)

    def release(self) -> None:
        """Free executor-side state (persisted join-back cache + the
        geometry broadcast). Call when done querying this polygon set —
        long-running services preparing many sets would otherwise pin
        storage for the session lifetime."""
        self.geoms_df.unpersist()
        self.bmap.unpersist()


def prepare_pip_polys(polys: DataFrame, poly_geom: str = "geom",
                      level: int | None = None,
                      use_full_cells: bool = True) -> PreparedPipPolys:
    """``use_full_cells=False`` disables the interior fast-accept: every
    candidate goes through the exact kernel (the reference's full-filter
    mode, i.e. loose-bbox off — also the kernel-bound benchmark shape)."""
    spark = polys.sparkSession
    # null geometries can never match (null-in/null-out contract)
    pls = (polys.filter(F.col(poly_geom).isNotNull())
                .withColumn("__pid__", F.xxhash64(F.col(poly_geom))))
    pmap = {r[0]: bytes(r[1])
            for r in pls.select("__pid__", poly_geom).distinct().collect()}
    if level is None:
        level = _auto_level(pmap.values())
    pids, cells, fulls = [], [], []
    any_full = False
    for pid, w in pmap.items():
        arr, full = _flagged_cover_of_wkb(w, level)
        if not use_full_cells:
            full = np.zeros(len(arr), dtype=bool)
        pids.append(np.full(len(arr), pid, dtype=np.int64))
        cells.append(arr)
        fulls.append(full)
        any_full = any_full or bool(full.any())
    pdf = pd.DataFrame({
        "__pid__": np.concatenate(pids) if pids else np.empty(0, np.int64),
        "__cell__": np.concatenate(cells) if cells else np.empty(0, np.int64),
        "__full__": np.concatenate(fulls) if fulls else np.empty(0, bool),
    })
    cells_df = spark.createDataFrame(
        pdf, schema="__pid__ long, __cell__ long, __full__ boolean")
    # all original polygon columns ride along the final join-back;
    # persist + materialize so repeated joins don't re-run the polygon
    # source (it may be a generator/scan) for every query
    geoms_df = pls.dropDuplicates(["__pid__"]).persist()
    geoms_df.count()
    return PreparedPipPolys(spark, pmap, level, cells_df, geoms_df, any_full)


def pip_join(
    points: DataFrame,
    polys: DataFrame | PreparedPipPolys,
    point_x: str,
    point_y: str,
    poly_geom: str,
    predicate: str = "st_contains",
    level: int | None = None,
    broadcast_polys: bool | None = None,
    salt: int | None = None,
    project_polys: bool = True,
    fuse_refine: bool = False,
) -> DataFrame:
    """Point-in-polygon join: points(x, y) x polys(wkb geometry).

    Returns the inner-joined DataFrame (all columns from both sides).
    predicate: st_contains / st_covers / st_intersects / st_within
    (for points these differ only in boundary handling).

    ``level=None`` auto-tunes the cell size on the broadcast path: target
    ~16 cells across the median polygon extent (maximizes the interior
    fast-accept fraction — measured 2x throughput vs level 10 on ~1.5-degree
    polygons), backed off until the exploded broadcast side stays under
    ~4M cell rows. Non-broadcast defaults to level 10.

    Each point hits exactly one cell -> no pair dedup shuffle needed.

    Broadcast path (small polygon side): the join ships only a polygon id
    + containment flag; geometries reach the Python refine workers once,
    via a Spark broadcast dict — never per candidate row. Interior-cell
    candidates (full=true) bypass Python entirely; only boundary-cell
    candidates cross the Arrow boundary. This is the shape that scales:
    Arrow traffic ~25 bytes/candidate instead of the full WKB.
    """
    prepared = polys if isinstance(polys, PreparedPipPolys) else None
    if prepared is not None:
        level = prepared.level
    elif broadcast_polys:
        prepared = prepare_pip_polys(polys, poly_geom, level)
        level = prepared.level
    elif level is None:
        level = 10

    pts = points.withColumn("__cell__", cell_expr_of_points(point_x, point_y, level))

    if salt and salt > 1:
        salt_pt = F.pmod(F.xxhash64(F.col(point_x), F.col(point_y)), F.lit(salt))
        salt_pl = F.explode(F.array([F.lit(i) for i in range(salt)]))
        join_keys = ["__cell__", "__salt__"]
        pts = pts.withColumn("__salt__", salt_pt)
    else:
        join_keys = ["__cell__"]

    if prepared is not None:
        pls_k = prepared.cells_df
        if salt and salt > 1:
            pls_k = pls_k.withColumn("__salt__", salt_pl)
        cand = pts.join(F.broadcast(pls_k), on=join_keys, how="inner")
        if fuse_refine and prepared.any_full:
            # single JVM pass: every candidate crosses Arrow, flagged rows
            # skip the kernel (trades Arrow volume for one fewer scan+probe)
            refine_f = _pip_refine_by_pid_udf(predicate, prepared.bmap, with_flag=True)
            out = cand.filter(refine_f(F.col(point_x), F.col(point_y),
                                       F.col("__pid__"), F.col("__full__")))
        elif prepared.any_full:
            # interior candidates never cross the Arrow boundary
            refine = _pip_refine_by_pid_udf(predicate, prepared.bmap)
            interior = cand.filter(F.col("__full__"))
            boundary = (cand.filter(~F.col("__full__"))
                            .filter(refine(F.col(point_x), F.col(point_y), F.col("__pid__"))))
            out = interior.unionByName(boundary)
        else:
            refine = _pip_refine_by_pid_udf(predicate, prepared.bmap)
            out = cand.filter(refine(F.col(point_x), F.col(point_y), F.col("__pid__")))
        if project_polys:
            # restore the polygon attribute columns (skippable projection
            # pushdown: callers that only keep point columns avoid the
            # join-back entirely)
            out = (out.join(F.broadcast(prepared.geoms_df), on="__pid__", how="inner")
                      .drop("__pid__", "__full__"))
        else:
            out = out.drop("__pid__", "__full__")
        return out.drop("__cell__", "__salt__") if salt else out.drop("__cell__")

    cover = cells_of_geom_flagged(level)
    pls = (polys.withColumn("__cf__", F.explode(cover(F.col(poly_geom))))
                .withColumn("__cell__", F.col("__cf__.c"))
                .withColumn("__full__", F.col("__cf__.full"))
                .drop("__cf__"))
    if salt and salt > 1:
        pls = pls.withColumn("__salt__", salt_pl)

    cand = pts.join(pls, on=join_keys, how="inner")
    refine = _pip_refine_udf(predicate, with_flag=True)
    out = cand.filter(refine(F.col(point_x), F.col(point_y), F.col(poly_geom),
                             F.col("__full__")))
    out = out.drop("__full__")
    return out.drop("__cell__", "__salt__") if salt else out.drop("__cell__")


def recommend_salt(points: DataFrame, x: str, y: str,
                   level: int = DEFAULT_LEVEL, max_salt: int = 64,
                   sample_rows: int = 1_000_000) -> int:
    """Pick a salt factor from the observed per-cell histogram.

    The explicit analog of the reference's shard byte (ShardStrategy
    .scala:42-83, default 4): salt so the hottest cell splits into chunks
    no larger than ~4x the mean cell population. Computed on a bounded
    sample; the same histogram is persisted per stage by
    plans.checkpoint (cell_histogram) so production runs can reuse it
    without a rescan. AQE skew-join remains the runtime backstop.
    """
    cells = points.select(cell_expr_of_points(x, y, level).alias("c")).limit(sample_rows)
    hist = cells.groupBy("c").count()
    row = hist.agg(F.max("count").alias("mx"), F.avg("count").alias("avg")).collect()[0]
    if row["avg"] is None or row["avg"] == 0:
        return 1
    salt = int(row["mx"] / (4.0 * row["avg"])) + 1
    return max(1, min(max_salt, salt))


def _pip_refine_by_pid_udf(predicate: str, bmap, with_flag: bool = False):
    """Refine via broadcast polygon dict (pid -> WKB): Arrow ships only ids.

    Rectangles refine with four vectorized comparisons; general polygons
    with the PIP rings kernel; other geometries with the exact DE-9IM
    kernel per pair. ``with_flag`` adds a full-cell column: flagged rows
    accept without touching the kernel (single-pass alternative to the
    interior/boundary union — one JVM scan, all candidates cross Arrow).
    """
    accept_inside_only = predicate in ("st_contains", "st_within")

    def _refine(xs, ys, pid, full=None) -> np.ndarray:
        out = np.zeros(len(xs), dtype=bool)
        if full is not None:
            out[full] = True
            todo = np.where(~full)[0]
            if len(todo) == 0:
                return out
            codes, uniques = pd.factorize(pid[todo])
            base = todo
        else:
            codes, uniques = pd.factorize(pid)
            base = np.arange(len(xs))
        order = base[np.argsort(codes, kind="stable")]
        sorted_codes = codes[np.argsort(codes, kind="stable")]
        starts = np.searchsorted(sorted_codes, np.arange(len(uniques)))
        ends = np.append(starts[1:], len(sorted_codes))
        pmap = bmap.value
        for u_idx, p in enumerate(uniques):
            idx = order[starts[u_idx]:ends[u_idx]]
            if len(idx) == 0:
                continue
            wkb = pmap.get(p)
            if wkb is None:
                continue
            geom = wkb_read(wkb)
            rect = _is_axis_rect(geom)
            if rect is not None:
                px, py = xs[idx], ys[idx]
                if accept_inside_only:
                    out[idx] = ((px > rect[0]) & (px < rect[2])
                                & (py > rect[1]) & (py < rect[3]))
                else:
                    out[idx] = ((px >= rect[0]) & (px <= rect[2])
                                & (py >= rect[1]) & (py <= rect[3]))
            elif isinstance(geom, Polygon):
                loc = K.pip_rings(xs[idx], ys[idx], geom.rings)
                out[idx] = (loc == 1) if accept_inside_only else (loc >= 0)
            else:
                fn = K.contains if accept_inside_only else K.intersects
                for i in idx:
                    out[i] = fn(geom, Point(xs[i], ys[i]))
        return out

    if with_flag:
        @pandas_udf(BooleanType())
        def refine(x: pd.Series, y: pd.Series, pid: pd.Series,
                   full: pd.Series) -> pd.Series:
            return pd.Series(_refine(x.to_numpy(np.float64), y.to_numpy(np.float64),
                                     pid.to_numpy(np.int64),
                                     full.fillna(False).to_numpy(bool)))
    else:
        @pandas_udf(BooleanType())
        def refine(x: pd.Series, y: pd.Series, pid: pd.Series) -> pd.Series:
            return pd.Series(_refine(x.to_numpy(np.float64), y.to_numpy(np.float64),
                                     pid.to_numpy()))

    return refine


def dwithin_join_points(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    lx: str, ly: str, rx: str, ry: str,
    metric: str = "degrees",
    level: int = DEFAULT_LEVEL,
    broadcast_right: bool = False,
) -> DataFrame:
    """Point x point distance join: pairs with dist(l, r) < radius.

    The proximity-join analog (geomesa-process ProximitySearchProcess.scala:25,
    CQL DWITHIN semantics GeometryProcessing.scala:143-146): the right side
    explodes to the Z2 cells covering its radius-expanded bbox, the left
    keeps its single point cell — equi-join prefilter, exact vectorized
    distance refine. metric 'degrees' = cartesian (st_distance), 'sphere' =
    haversine meters (st_distanceSphere two-stage accept).
    """
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def cover_pt(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        if metric == "sphere":
            rlon, rlat = sphere_expand_degrees(ys, radius)
        else:
            rlon = rlat = np.full_like(xs, radius)
        return pd.Series(cells_of_disk_arrays(xs, ys, rlon, rlat, level),
                         dtype=object)

    l = left.withColumn("__cell__", cell_expr_of_points(lx, ly, level))
    r = right.withColumn("__cell__", F.explode(cover_pt(F.col(rx), F.col(ry))))
    rr = F.broadcast(r) if broadcast_right else r
    cand = l.join(rr, on="__cell__", how="inner").drop("__cell__")

    if metric == "degrees":
        dist = F.sqrt((F.col(lx) - F.col(rx)) * (F.col(lx) - F.col(rx))
                      + (F.col(ly) - F.col(ry)) * (F.col(ly) - F.col(ry)))
    else:
        la1, la2 = F.radians(F.col(ly)), F.radians(F.col(ry))
        sd = F.sin((la2 - la1) / 2)
        sl = F.sin((F.radians(F.col(rx)) - F.radians(F.col(lx))) / 2)
        a = sd * sd + F.cos(la1) * F.cos(la2) * sl * sl
        dist = F.lit(2.0 * 6371008.7714) * F.asin(F.sqrt(a))
    return cand.withColumn("dist", dist).filter(F.col("dist") < radius)


def _geom_refine_udf(predicate: str, meters: float | None = None):
    """General candidate refine with the exact DE-9IM kernel per pair."""
    pred_fn = {
        "st_contains": K.contains,
        "st_within": K.within,
        "st_covers": K.covers,
        "st_coveredBy": K.covered_by,
        "st_intersects": K.intersects,
        "st_overlaps": K.overlaps,
        "st_touches": K.touches,
        "st_crosses": K.crosses,
        "st_equals": K.equals,
        "st_disjoint": K.disjoint,
    }.get(predicate)

    @pandas_udf(BooleanType())
    def refine(l: pd.Series, r: pd.Series) -> pd.Series:
        out = []
        cache: dict = {}
        for lv, rv in zip(l, r):
            if lv is None or rv is None:
                out.append(False)
                continue
            ga = cache.get(lv)
            if ga is None:
                ga = cache[lv] = wkb_read(bytes(lv))
            gb = cache.get(rv)
            if gb is None:
                gb = cache[rv] = wkb_read(bytes(rv))
            if meters is not None:
                out.append(dwithin_geoms(ga, gb, meters))
            else:
                # fast path: bbox reject before the exact kernel
                ea = ga.envelope()
                eb = gb.envelope()
                if predicate != "st_disjoint" and (
                    ea[0] > eb[2] or eb[0] > ea[2] or ea[1] > eb[3] or eb[1] > ea[3]
                ) and predicate in ("st_intersects", "st_contains", "st_within",
                                     "st_covers", "st_coveredBy", "st_overlaps",
                                     "st_touches", "st_crosses", "st_equals"):
                    out.append(False)
                else:
                    out.append(bool(pred_fn(ga, gb)))
        return pd.Series(out)

    return refine


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str,
    left_geom: str = "geom",
    right_geom: str = "geom",
    left_id: str | None = None,
    right_id: str | None = None,
    level: int = DEFAULT_LEVEL,
    meters: float | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """General geometry x geometry join via bbox cell covers + exact refine.

    Both sides explode to covering cells -> pairs may repeat -> dedup on the
    pair id before refine (pass left_id/right_id; defaults to the WKB bytes).
    For st_dwithin pass ``meters``; the right covers are expanded by the
    max-degree equivalent (FilterHelper/GeometryProcessing buffer semantics).
    """
    expand = 0.0
    if meters is not None:
        # conservative degree expansion at the worst-case latitude
        expand = meters / 111_320.0 * 1.5

    cover_l = cells_of_geom(level)
    cover_r = cells_of_geom(level, expand_deg=expand)

    l = left.withColumn("__cell__", F.explode(cover_l(F.col(left_geom))))
    r = right.withColumn("__cell__", F.explode(cover_r(F.col(right_geom))))
    rr = F.broadcast(r) if broadcast_right else r

    cand = l.join(rr, on="__cell__", how="inner").drop("__cell__")
    dedup_keys = [left_id or left_geom, right_id or right_geom]
    cand = cand.dropDuplicates(dedup_keys)

    refine = _geom_refine_udf(predicate, meters=meters)
    return cand.filter(refine(F.col(left_geom), F.col(right_geom)))
