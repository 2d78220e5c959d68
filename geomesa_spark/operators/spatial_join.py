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
from pyspark.sql.types import ArrayType, BooleanType, LongType

from ..curves.zorder import z2_encode
from ..curves.norm import normalized_lat, normalized_lon
from ..geom import kernels as K
from ..geom import measures as M
from ..geom.wkb import Point, Polygon, wkb_read
from ..functions.registry import dwithin_geoms

DEFAULT_LEVEL = 8  # 2^8 x 2^8 world grid; cells ~1.4 x 0.7 degrees

_LON = normalized_lon(31)
_LAT = normalized_lat(31)


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


def _pip_refine_udf(predicate: str):
    """Refine candidates: vectorized PIP per distinct polygon in the batch."""
    accept_inside_only = predicate in ("st_contains", "st_within")

    @pandas_udf(BooleanType())
    def refine(x: pd.Series, y: pd.Series, poly_wkb: pd.Series) -> pd.Series:
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        out = np.zeros(len(xs), dtype=bool)
        # group candidate points by polygon (polygons repeat across candidates)
        codes, uniques = pd.factorize(poly_wkb)
        for u_idx, wkb in enumerate(uniques):
            sel = codes == u_idx
            if wkb is None or not np.any(sel):
                continue
            geom = wkb_read(bytes(wkb))
            rings = geom.rings if isinstance(geom, Polygon) else None
            if rings is not None:
                loc = K.pip_rings(xs[sel], ys[sel], rings)
                out[sel] = (loc == 1) if accept_inside_only else (loc >= 0)
            else:
                # non-polygon right side: exact kernel per pair (rare path)
                fn = K.contains if accept_inside_only else K.intersects
                idx = np.where(sel)[0]
                for i in idx:
                    out[i] = fn(geom, Point(xs[i], ys[i]))
        return pd.Series(out)

    return refine


def pip_join(
    points: DataFrame,
    polys: DataFrame,
    point_x: str,
    point_y: str,
    poly_geom: str,
    predicate: str = "st_contains",
    level: int = DEFAULT_LEVEL,
    broadcast_polys: bool | None = None,
    salt: int | None = None,
) -> DataFrame:
    """Point-in-polygon join: points(x, y) x polys(wkb geometry).

    Returns the inner-joined DataFrame (all columns from both sides).
    predicate: st_contains / st_covers / st_intersects / st_within
    (for points these differ only in boundary handling).

    Each point hits exactly one cell -> no pair dedup shuffle needed.
    """
    cell_pt = cell_of_points(level)
    cover = cells_of_geom(level)

    pts = points.withColumn("__cell__", cell_pt(F.col(point_x), F.col(point_y)))
    pls = polys.withColumn("__cells__", cover(F.col(poly_geom))) \
               .withColumn("__cell__", F.explode("__cells__")) \
               .drop("__cells__")

    if salt and salt > 1:
        pts = pts.withColumn("__salt__", F.pmod(F.xxhash64(F.col(point_x), F.col(point_y)), F.lit(salt)))
        pls = pls.withColumn("__salt__", F.explode(F.array([F.lit(i) for i in range(salt)])))
        join_keys = ["__cell__", "__salt__"]
    else:
        join_keys = ["__cell__"]

    if broadcast_polys is None:
        broadcast_polys = False
    right = F.broadcast(pls) if broadcast_polys else pls

    cand = pts.join(right, on=join_keys, how="inner")
    refine = _pip_refine_udf(predicate)
    out = cand.filter(refine(F.col(point_x), F.col(point_y), F.col(poly_geom)))
    return out.drop("__cell__", "__salt__") if salt else out.drop("__cell__")


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

    cell_pt = cell_of_points(level)
    if metric == "sphere":
        expand = radius / 111_320.0 * 1.5
    else:
        expand = radius

    @pandas_udf(ArrayType(LongType()))
    def cover_pt(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy(np.float64)
        ys = y.to_numpy(np.float64)
        return pd.Series(
            cells_of_bbox_arrays(xs - expand, ys - expand, xs + expand, ys + expand, level),
            dtype=object)

    l = left.withColumn("__cell__", cell_pt(F.col(lx), F.col(ly)))
    r = right.withColumn("__cell__", F.explode(cover_pt(F.col(rx), F.col(ry))))
    rr = F.broadcast(r) if broadcast_right else r
    cand = l.join(rr, on="__cell__", how="inner").drop("__cell__")

    if metric == "degrees":
        dist = F.sqrt((F.col(lx) - F.col(rx)) ** 2 + (F.col(ly) - F.col(ry)) ** 2)
    else:
        la1, la2 = F.radians(F.col(ly)), F.radians(F.col(ry))
        a = (F.sin((la2 - la1) / 2) ** 2
             + F.cos(la1) * F.cos(la2) * F.sin((F.radians(F.col(rx)) - F.radians(F.col(lx))) / 2) ** 2)
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
