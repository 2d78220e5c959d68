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

__all__ = ["gi_star", "local_moran", "gi_star_st", "mann_kendall",
           "cell_anomaly"]


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


def local_moran(grid: DataFrame, w: int, h: int,
                i: str = "i", j: str = "j",
                value: str = "weight") -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA) per occupied cell of a sparse
    (i, j, value) grid — the cluster/outlier companion to `gi_star`
    (hot cells NEXT TO hot cells vs lone spikes).

    Row-standardized queen weights WITHOUT self: with z_k = x_k - xbar
    and m2 = sum(z^2)/n over the full w x h grid (absent cells = 0),

        I_i = (z_i / m2) * (sum_{k in N_i} z_k) / |N_i|

    where |N_i| is the in-bounds 8-neighborhood size (3/5/8 at
    corners/edges/interior). Absent neighbors are real zeros: they
    count in |N_i| and contribute -xbar to the z sum, which is why the
    neighbor z sum is computed as S_i - |N_i|*xbar from the exact
    occupied-neighbor sum S_i.

    Same scale shape as gi_star: 8-way scatter of occupied cells, one
    combining groupBy, broadcast global moments; integer-valued grids
    keep every sum exact so the I chain is bit-reproducible. Returns
    (i, j, value, ni, z, lag, moran_i), occupied cells only; lag is the
    row-standardized neighbor z mean.
    """
    n = float(w) * float(h)
    g = grid.select(F.col(i).cast("int").alias("i"),
                    F.col(j).cast("int").alias("j"),
                    F.col(value).cast("double").alias("x"))
    offs = F.explode(F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)
        if not (di == 0 and dj == 0)])).alias("o")
    contrib = (g.select("i", "j", "x", offs)
                .select((F.col("i") + F.col("o.di")).alias("ni_"),
                        (F.col("j") + F.col("o.dj")).alias("nj_"),
                        "x")
                .filter((F.col("ni_") >= 0) & (F.col("ni_") < w)
                        & (F.col("nj_") >= 0) & (F.col("nj_") < h)))
    nsum = contrib.groupBy("ni_", "nj_").agg(F.sum("x").alias("sn"))
    tot = g.agg(F.sum("x").alias("sx"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"))
    xbar = F.col("sx") / F.lit(n)
    m2 = F.col("sxx") / F.lit(n) - xbar * xbar
    stats = tot.select(xbar.alias("xbar"), m2.alias("m2"))
    # isolated occupied cells receive no contribution rows: their
    # occupied-neighbor sum is a true 0, not a missing row
    ni = ((F.least(F.col("i") + 1, F.lit(w - 1))
           - F.greatest(F.col("i") - 1, F.lit(0)) + 1)
          * (F.least(F.col("j") + 1, F.lit(h - 1))
             - F.greatest(F.col("j") - 1, F.lit(0)) + 1)
          - 1).cast("double")
    out = (g.join(nsum, on=[g["i"] == nsum["ni_"], g["j"] == nsum["nj_"]],
                  how="left")
            .withColumn("sn", F.coalesce(F.col("sn"), F.lit(0.0)))
            .crossJoin(F.broadcast(stats))
            .withColumn("ni", ni)
            .withColumn("z", F.col("x") - F.col("xbar"))
            .withColumn("lag", (F.col("sn") - F.col("ni") * F.col("xbar"))
                               / F.col("ni")))
    return out.select("i", "j", F.col("x").alias(value), "ni", "z", "lag",
                      ((F.col("z") / F.col("m2")) * F.col("lag"))
                      .alias("moran_i"))


def gi_star_st(grid: DataFrame, w: int, h: int, nt: int,
               i: str = "i", j: str = "j", t: str = "t",
               value: str = "weight") -> DataFrame:
    """Space-time Gi* over a sparse (i, j, t, value) cube — the
    emerging-hotspot primitive (ESRI space-time cube semantics): queen
    contiguity in space x +/-1 in time, 3x3x3 neighborhood including
    self, so a cell is hot only if its spatial neighbors were also hot
    in the adjacent time bins.

    Same scale shape as `gi_star` lifted one dimension: a 27-way
    scatter of occupied cells, one combining groupBy, broadcast global
    moments over the full n = w*h*nt cube (absent cells are exact
    zeros). Returns (i, j, t, value, wi, gi_z), occupied cells only.
    """
    n = float(w) * float(h) * float(nt)
    g = grid.select(F.col(i).cast("int").alias("i"),
                    F.col(j).cast("int").alias("j"),
                    F.col(t).cast("int").alias("t"),
                    F.col(value).cast("double").alias("x"))
    offs = F.explode(F.array(*[
        F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"),
                 F.lit(dt).alias("dt"))
        for di in (-1, 0, 1) for dj in (-1, 0, 1)
        for dt in (-1, 0, 1)])).alias("o")
    contrib = (g.select("i", "j", "t", "x", offs)
                .select((F.col("i") + F.col("o.di")).alias("ni"),
                        (F.col("j") + F.col("o.dj")).alias("nj"),
                        (F.col("t") + F.col("o.dt")).alias("nt_"),
                        "x")
                .filter((F.col("ni") >= 0) & (F.col("ni") < w)
                        & (F.col("nj") >= 0) & (F.col("nj") < h)
                        & (F.col("nt_") >= 0) & (F.col("nt_") < nt)))
    nsum = contrib.groupBy("ni", "nj", "nt_").agg(F.sum("x").alias("swx"))
    tot = g.agg(F.sum("x").alias("sx"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"))
    xbar = F.col("sx") / F.lit(n)
    s = F.sqrt(F.col("sxx") / F.lit(n) - xbar * xbar)
    stats = tot.select(xbar.alias("xbar"), s.alias("s"))
    wi = ((F.least(F.col("i") + 1, F.lit(w - 1))
           - F.greatest(F.col("i") - 1, F.lit(0)) + 1)
          * (F.least(F.col("j") + 1, F.lit(h - 1))
             - F.greatest(F.col("j") - 1, F.lit(0)) + 1)
          * (F.least(F.col("t") + 1, F.lit(nt - 1))
             - F.greatest(F.col("t") - 1, F.lit(0)) + 1)).cast("double")
    out = (g.join(nsum, on=[g["i"] == nsum["ni"], g["j"] == nsum["nj"],
                            g["t"] == nsum["nt_"]])
            .crossJoin(F.broadcast(stats))
            .withColumn("wi", wi))
    gi = ((F.col("swx") - F.col("xbar") * F.col("wi"))
          / (F.col("s")
             * F.sqrt((F.lit(n) * F.col("wi") - F.col("wi") * F.col("wi"))
                      / F.lit(n - 1.0))))
    return out.select("i", "j", "t", F.col("x").alias(value), "wi",
                      gi.alias("gi_z"))


def cell_anomaly(grid: DataFrame, nt: int,
                 i: str = "i", j: str = "j", t: str = "t",
                 value: str = "weight", z_thresh: float = 2.0) -> DataFrame:
    """Per-cell temporal anomaly scan: occupied bins whose value sits
    ``z_thresh`` standard deviations from that cell's own densified
    ``nt``-bin mean (absent bins are exact zeros, as mann_kendall) —
    the "which day spiked where" companion of the trend test in
    emerging-hotspot analysis.

    Moments come from one combining agg per cell (sum and sum-of-
    squares are exact doubles for integer-valued counts), broadcast
    back to the occupied rows by a cell-keyed join; the z chain
    (mean = s/nt, var = ss/nt - mean², z = (x-mean)/sqrt(var)) is one
    fixed expression — bit-reproducible. Cells with var <= 0 (constant
    series) produce no anomalies. Returns (i, j, t, x, z) with
    |z| >= z_thresh.
    """
    if nt < 2:
        raise ValueError("cell_anomaly needs nt >= 2 time bins")
    g = grid.select(F.col(i).cast("int").alias("i"),
                    F.col(j).cast("int").alias("j"),
                    F.col(t).cast("int").alias("t"),
                    F.col(value).cast("double").alias("x"))
    st = (g.groupBy("i", "j")
           .agg(F.sum("x").alias("s"),
                F.sum(F.col("x") * F.col("x")).alias("ss")))
    mean = F.col("s") / F.lit(float(nt))
    var = F.col("ss") / F.lit(float(nt)) - mean * mean
    z = (F.col("x") - mean) / F.sqrt(var)
    return (g.join(st, on=["i", "j"])
             .filter(var > F.lit(0.0))
             .withColumn("z", z)
             .filter(F.abs(F.col("z")) >= F.lit(float(z_thresh)))
             .select("i", "j", "t", "x", "z"))


def mann_kendall(grid: DataFrame, nt: int,
                 i: str = "i", j: str = "j", t: str = "t",
                 value: str = "weight") -> DataFrame:
    """Mann-Kendall trend test per cell of a sparse (i, j, t, value)
    cube — the trend half of emerging-hotspot analysis: is a cell's
    time series rising or falling, nonparametrically?

    Absent bins are exact zeros: each occupied cell's series is
    densified to all ``nt`` bins before the pairwise scan, so a cell
    occupied only late genuinely trends upward. S = sum over bin pairs
    a < b of sign(x_b - x_a); VAR(S) = nt*(nt-1)*(2*nt+5)/18 (no-ties
    normal approximation); z applies the standard +/-1 continuity
    correction. All-integer arithmetic until the final divide -> the z
    chain is bit-reproducible across engines.

    Scale shape: one groupBy collects each occupied cell's <= nt
    (bin, value) pairs; the O(nt^2) pairwise scan runs as a JVM HOF
    over that bounded array (time bins are dozens, not millions — the
    cube's time axis is fixed by the analysis window). Returns
    (i, j, s_stat, z).
    """
    if nt < 2:
        # no bin pairs exist; F.sequence(0, nt-2) would auto-step
        # DOWNWARD ([0,-1]) and index past the series instead of being
        # empty, so guard rather than let the fold misfire
        raise ValueError("mann_kendall needs nt >= 2 time bins")
    g = grid.select(F.col(i).cast("int").alias("i"),
                    F.col(j).cast("int").alias("j"),
                    F.col(t).cast("int").alias("t"),
                    F.col(value).cast("double").alias("x"))
    cell = (g.groupBy("i", "j")
             .agg(F.map_from_arrays(F.collect_list("t"),
                                    F.collect_list("x")).alias("m")))
    # densify: x_b for every bin b in [0, nt), absent -> 0.0
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(nt - 1)),
        lambda b: F.coalesce(F.element_at(F.col("m"), b), F.lit(0.0)))
    # S = sum_{a<b} sign(x_b - x_a) via nested HOF folds (long ints)
    arr = cell.withColumn("xs", dense).drop("m")
    pair_sum = F.aggregate(
        F.sequence(F.lit(0), F.lit(nt - 2)),
        F.lit(0).cast("long"),
        lambda acc, a: acc + F.aggregate(
            F.sequence(a + 1, F.lit(nt - 1)),
            F.lit(0).cast("long"),
            lambda acc2, b: acc2 + F.signum(
                F.element_at(F.col("xs"), b + 1)
                - F.element_at(F.col("xs"), a + 1)).cast("long")))
    var_s = float(nt * (nt - 1) * (2 * nt + 5)) / 18.0
    out = arr.withColumn("s_stat", pair_sum)
    zc = (F.when(F.col("s_stat") > 0,
                 (F.col("s_stat").cast("double") - F.lit(1.0))
                 / F.sqrt(F.lit(var_s)))
           .when(F.col("s_stat") < 0,
                 (F.col("s_stat").cast("double") + F.lit(1.0))
                 / F.sqrt(F.lit(var_s)))
           .otherwise(F.lit(0.0)))
    return out.select("i", "j", "s_stat", zc.alias("z"))
