"""IDW surface interpolation: scattered points -> raster grid.

The reference ships point-density rendering (geomesa-process
.../DensityProcess.scala) but no continuous-surface interpolation;
inverse-distance weighting (Shepard 1968) is the standard gridding
companion and reuses the same GridSnap cell frame as
`tiling.density_points`.

Spark-first shape: each sample point scatters to the (2r+1)^2 grid
cells around its own cell (bounded fan-out, narrow rows), one groupBy
on the target cell computes the weighted average — no all-pairs
point x cell product, no Python anywhere. Cells farther than r cells
from every sample stay absent (emit-near-data: at 100x the grid the
output stays proportional to the data, not to w*h).

Two summation modes:

* ``deterministic=False`` (default, the scale path): plain `F.sum` —
  partial aggregation map-side, float summation order unspecified
  (fine for rendering; error is ~ulp).
* ``deterministic=True``: contributions are collected per cell, sorted
  by source id, and folded left-to-right with `F.aggregate` — the
  fixed evaluation order makes the double chain bit-reproducible
  across engines (the DuckDB oracle mirrors the same ordered fold).
  Costs a collect_list per cell, so the per-cell fan-in must be
  bounded (it is: at most the samples within r cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["idw_grid", "areal_interpolate_rects"]


def areal_interpolate_rects(
    src: DataFrame, dst: DataFrame,
    src_id: str, src_env: tuple, value_col: str,
    dst_id: str, dst_env: tuple,
    level: int = 6,
    deterministic: bool = False,
) -> DataFrame:
    """Areal interpolation between incompatible RECTANGULAR zone
    systems (Goodchild & Lam 1980 area weighting): each source zone's
    value spreads uniformly over its area, and every target zone
    collects what falls inside it:

        v(t) = sum_s v(s) * area(s ∩ t) / area(s)

    The census-to-grid / admin-to-tile reaggregation step of spatial
    pipelines. Rect zones (axis-aligned envelope == geometry — the
    nation/customer layers, tiles, bboxes) keep the whole computation
    closed-form: overlap = clamped interval products, pure JVM.

    Scale shape: both layers explode to covering grid cells via the
    codegen'd sequence-explodes and meet on the report-once canonical
    cell (max of the per-axis cover minima — the spatial_join rule), so
    no pair-dedup shuffle; the final combining agg is keyed by the
    target id. ``deterministic=True`` swaps the sum for a
    source-id-ordered fold (idw_grid convention, engine-reproducible).
    Returns (dst_id, value) over targets with nonzero overlap.
    Degenerate sources (zero area) are dropped.
    """
    from .spatial_join import _explode_bbox_ij

    sx0, sy0, sx1, sy1 = (F.col(c) for c in src_env)
    dx0, dy0, dx1, dy1 = (F.col(c) for c in dst_env)
    l = _explode_bbox_ij(
        src.select(F.col(src_id).alias("__sid__"),
                   F.col(value_col).cast("double").alias("__v__"),
                   sx0.cast("double").alias("__sx0__"),
                   sy0.cast("double").alias("__sy0__"),
                   sx1.cast("double").alias("__sx1__"),
                   sy1.cast("double").alias("__sy1__"))
           .filter((sx1.cast("double") > sx0.cast("double"))
                   & (sy1.cast("double") > sy0.cast("double"))),
        F.col("__sx0__"), F.col("__sy0__"), F.col("__sx1__"),
        F.col("__sy1__"), level, "l")
    r = _explode_bbox_ij(
        dst.select(F.col(dst_id).alias("__did__"),
                   dx0.cast("double").alias("__dx0__"),
                   dy0.cast("double").alias("__dy0__"),
                   dx1.cast("double").alias("__dx1__"),
                   dy1.cast("double").alias("__dy1__")),
        F.col("__dx0__"), F.col("__dy0__"), F.col("__dx1__"),
        F.col("__dy1__"), level, "r")
    ox = (F.least(F.col("__sx1__"), F.col("__dx1__"))
          - F.greatest(F.col("__sx0__"), F.col("__dx0__")))
    oy = (F.least(F.col("__sy1__"), F.col("__dy1__"))
          - F.greatest(F.col("__sy0__"), F.col("__dy0__")))
    share = (ox * oy) / ((F.col("__sx1__") - F.col("__sx0__"))
                         * (F.col("__sy1__") - F.col("__sy0__")))
    pairs = (l.join(r, on=["__gi__", "__gj__"])
              .filter((F.col("__gi__") == F.greatest("__lgi0__", "__rgi0__"))
                      & (F.col("__gj__") == F.greatest("__lgj0__", "__rgj0__")))
              .filter((ox > F.lit(0.0)) & (oy > F.lit(0.0)))
              .select("__did__", "__sid__",
                      (F.col("__v__") * share).alias("__c__")))
    if deterministic:
        agg = F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("__sid__"),
                                                 F.col("__c__")))),
            F.lit(0.0), lambda acc, s: acc + s["__c__"])
    else:
        agg = F.sum("__c__")
    return (pairs.groupBy(F.col("__did__").alias(dst_id))
                 .agg(agg.alias("value")))


def idw_grid(pts: DataFrame, x_col: str, y_col: str, value: str,
             xmin: float, ymin: float, xmax: float, ymax: float,
             w: int, h: int, radius_cells: int = 2,
             id_col: str | None = None,
             deterministic: bool = False) -> DataFrame:
    """Inverse-distance-weighted estimate per grid cell near data.

    weight_k = 1 / (d2_k + 1e-12) with d2_k the squared degree distance
    from sample k to the cell CENTER (power p=2 — no sqrt on the hot
    path); est = sum(w_k * v_k) / sum(w_k) over samples within
    ``radius_cells`` Chebyshev cells. The epsilon keeps a sample that
    lands exactly on a cell center finite (it then dominates at
    weight 1e12, the Shepard exact-hit limit).

    Returns (i, j, n_src, est). ``deterministic=True`` requires
    ``id_col`` for the fold order.
    """
    if deterministic and id_col is None:
        raise ValueError("deterministic IDW needs id_col for fold order")
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    r = int(radius_cells)
    pi = F.least(F.floor((F.col(x_col) - xmin) / dx), F.lit(w - 1)).cast("int")
    pj = F.least(F.floor((F.col(y_col) - ymin) / dy), F.lit(h - 1)).cast("int")
    base = (pts.filter((F.col(x_col) >= xmin) & (F.col(x_col) <= xmax)
                       & (F.col(y_col) >= ymin) & (F.col(y_col) <= ymax))
               .select(pi.alias("pi"), pj.alias("pj"),
                       F.col(x_col).cast("double").alias("px"),
                       F.col(y_col).cast("double").alias("py"),
                       F.col(value).cast("double").alias("v"),
                       *((F.col(id_col).alias("sid"),) if id_col else ())))
    offs = F.explode(F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in range(-r, r + 1) for dj in range(-r, r + 1)])).alias("o")
    tgt = (base.select("*", offs)
               .select((F.col("pi") + F.col("o.di")).alias("i"),
                       (F.col("pj") + F.col("o.dj")).alias("j"),
                       "px", "py", "v",
                       *(("sid",) if id_col else ()))
               .filter((F.col("i") >= 0) & (F.col("i") < w)
                       & (F.col("j") >= 0) & (F.col("j") < h)))
    cx = F.lit(float(xmin)) + (F.col("i").cast("double") + F.lit(0.5)) * F.lit(dx)
    cy = F.lit(float(ymin)) + (F.col("j").cast("double") + F.lit(0.5)) * F.lit(dy)
    d2 = ((F.col("px") - cx) * (F.col("px") - cx)
          + (F.col("py") - cy) * (F.col("py") - cy))
    wt = F.lit(1.0) / (d2 + F.lit(1e-12))
    tgt = tgt.withColumn("wt", wt).withColumn("wv", F.col("wt") * F.col("v"))
    if not deterministic:
        agg = tgt.groupBy("i", "j").agg(
            F.count("*").alias("n_src"),
            F.sum("wt").alias("swt"), F.sum("wv").alias("swv"))
    else:
        # ordered left fold: sort contributions by source id, then
        # accumulate (swt, swv) pairwise — one addition order, both
        # engines replay it exactly
        arr = F.array_sort(F.collect_list(
            F.struct(F.col("sid"), F.col("wt"), F.col("wv"))))
        fold = F.aggregate(
            arr,
            F.struct(F.lit(0.0).alias("swt"), F.lit(0.0).alias("swv"),
                     F.lit(0).cast("long").alias("n")),
            lambda acc, s: F.struct(
                (acc["swt"] + s["wt"]).alias("swt"),
                (acc["swv"] + s["wv"]).alias("swv"),
                (acc["n"] + 1).alias("n")))
        agg = (tgt.groupBy("i", "j")
                  .agg(fold.alias("f"))
                  .select("i", "j", F.col("f.n").alias("n_src"),
                          F.col("f.swt").alias("swt"),
                          F.col("f.swv").alias("swv")))
    return agg.select("i", "j", "n_src",
                      (F.col("swv") / F.col("swt")).alias("est"))
