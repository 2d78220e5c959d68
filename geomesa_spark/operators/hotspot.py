"""Getis-Ord Gi* hotspot detection over a density grid.

The reference renders density surfaces (geomesa-process
.../DensityProcess.scala) and leaves "where are the statistically
significant hot cells" to the analyst; Gi* (Getis & Ord 1992, "The
Analysis of Spatial Association by Use of Distance Statistics") is the
standard answer and composes directly with `tiling.density_points`.

Spark-first shape: the grid is SPARSE (only occupied cells exist as
rows — absent cells are implicit zeros, which contribute nothing to any
neighbor sum). Each occupied cell emits its value to the 9 queen
positions around it (a 9-way explode of 16-byte rows), one combining
groupBy produces every cell's neighborhood sum, and the global
mean/variance is one scalar aggregate broadcast back. No Python, no
driver collect, no all-pairs anywhere — at 100x the grid this is one
narrow shuffle keyed by cell.

Exactness: for integer-valued grids (counts, the density_points
output) every sum is exact in doubles (< 2^53), so the z-score's
divide/sqrt chain is bit-reproducible across engines — the property
the DuckDB oracle relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["gi_star"]


def gi_star(grid: DataFrame, w: int, h: int,
            i: str = "i", j: str = "j",
            value: str = "weight") -> DataFrame:
    """Gi* z-score per occupied cell of a sparse (i, j, value) grid.

    ``w`` x ``h`` is the full study-area grid (n = w*h cells, absent
    cells = 0); weights are binary queen contiguity including self
    (W_i = in-bounds 3x3 block size, 4/6/9 at corners/edges/interior).

    Gi* = (S_wi - xbar*W_i) / (s * sqrt((n*W_i - W_i^2) / (n - 1)))
    with S_wi the neighborhood sum, xbar/s the global mean/std over all
    n cells. Returns (i, j, value, wi, gi_z), occupied cells only.
    """
    n = float(w) * float(h)
    g = grid.select(F.col(i).cast("int").alias("i"),
                    F.col(j).cast("int").alias("j"),
                    F.col(value).cast("double").alias("x"))
    # every occupied cell scatters its value to its 9 queen positions;
    # out-of-bounds targets are dropped (they're outside the study area)
    offs = F.explode(F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)])).alias("o")
    contrib = (g.select("i", "j", "x", offs)
                .select((F.col("i") + F.col("o.di")).alias("ni"),
                        (F.col("j") + F.col("o.dj")).alias("nj"),
                        "x")
                .filter((F.col("ni") >= 0) & (F.col("ni") < w)
                        & (F.col("nj") >= 0) & (F.col("nj") < h)))
    nsum = contrib.groupBy("ni", "nj").agg(F.sum("x").alias("swx"))
    # global moments: zeros of absent cells contribute nothing to the
    # sums; n is the full grid size
    tot = g.agg(F.sum("x").alias("sx"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"))
    xbar = F.col("sx") / F.lit(n)
    s = F.sqrt(F.col("sxx") / F.lit(n) - xbar * xbar)
    stats = tot.select(xbar.alias("xbar"), s.alias("s"))
    # in-bounds 3x3 block size from the cell position alone
    wi = ((F.least(F.col("i") + 1, F.lit(w - 1))
           - F.greatest(F.col("i") - 1, F.lit(0)) + 1)
          * (F.least(F.col("j") + 1, F.lit(h - 1))
             - F.greatest(F.col("j") - 1, F.lit(0)) + 1)).cast("double")
    out = (g.join(nsum, on=[g["i"] == nsum["ni"], g["j"] == nsum["nj"]])
            .crossJoin(F.broadcast(stats))
            .withColumn("wi", wi))
    gi = ((F.col("swx") - F.col("xbar") * F.col("wi"))
          / (F.col("s")
             * F.sqrt((F.lit(n) * F.col("wi") - F.col("wi") * F.col("wi"))
                      / F.lit(n - 1.0))))
    return out.select("i", "j", F.col("x").alias(value), "wi",
                      gi.alias("gi_z"))
