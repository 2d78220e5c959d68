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

__all__ = ["idw_grid"]


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
