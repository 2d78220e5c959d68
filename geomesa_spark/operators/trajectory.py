"""Trajectory similarity: Hausdorff distance join between tracks.

The reference's spatial join family (geomesa-spark/geomesa-spark-sql
st_distance joins, SparkSQLSpatialRelationsTest) covers geometry pairs;
track-to-track similarity (which patrol routes cover the same corridor,
which user paths mirror each other) needs a set-to-set metric. The
symmetric Hausdorff distance is the standard one:

    H(A, B) = max( max_a min_b |a-b|, max_b min_a |a-b| )

Spark-first shape: tracks are collected once into bounded per-track
point arrays (tracks are bounded by sessionization/resampling upstream
— this is the per-track state the reference's BIN export also assumes),
pairs come from a self-join pruned by an ENVELOPE LOWER BOUND (the
rectangle gap between two track bounding boxes never exceeds the
Hausdorff distance, so `threshold` prunes pairs before any point math),
and the O(|A|*|B|) point scan runs as nested JVM higher-order folds —
whole-stage codegen, no Python, no explode of the cross product.

Exactness: max/min folds over doubles are order-independent (pure
comparisons), and each distance is one fixed mul/add/sqrt chain, so
results are bit-reproducible across engines with no ordered-fold trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hausdorff_join"]


def hausdorff_join(df: DataFrame, track_col: str, x_col: str, y_col: str,
                   order_col: str, threshold: float | None = None,
                   max_points: int = 4096) -> DataFrame:
    """All-pairs symmetric Hausdorff distance between tracks.

    Returns (track_a, track_b, n_a, n_b, hausdorff) with
    track_a < track_b (each unordered pair once). ``threshold`` keeps
    only pairs with H <= threshold AND prunes the self-join with the
    envelope-gap lower bound first (the scale path — without it the
    pair count is quadratic in the track count). ``max_points`` guards
    against unbounded per-track state: a track longer than this raises
    at plan-build time via an assertive filter (resample upstream with
    `route.track_interpolate` instead of silently truncating).
    """
    pts = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("o"),
                 F.col(x_col).cast("double").alias("x"),
                 F.col(y_col).cast("double").alias("y"))))
    tr = (df.groupBy(F.col(track_col).alias("tid"))
            .agg(pts.alias("pts"),
                 F.min(x_col).cast("double").alias("x0"),
                 F.min(y_col).cast("double").alias("y0"),
                 F.max(x_col).cast("double").alias("x1"),
                 F.max(y_col).cast("double").alias("y1"),
                 F.count("*").alias("n")))
    tr = tr.withColumn(
        "pts",
        F.when(F.size("pts") <= max_points, F.col("pts"))
         .otherwise(F.raise_error(F.lit(
             f"hausdorff_join: track exceeds max_points={max_points}; "
             "resample with track_interpolate first"))))
    a = tr.select(F.col("tid").alias("ta"), F.col("pts").alias("pa"),
                  F.col("n").alias("n_a"),
                  F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
                  F.col("x1").alias("ax1"), F.col("y1").alias("ay1"))
    b = tr.select(F.col("tid").alias("tb"), F.col("pts").alias("pb"),
                  F.col("n").alias("n_b"),
                  F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
                  F.col("x1").alias("bx1"), F.col("y1").alias("by1"))
    cond = F.col("ta") < F.col("tb")
    if threshold is not None:
        # envelope gap: a lower bound on min point distance, hence on H
        gx = F.greatest(F.lit(0.0), F.col("bx0") - F.col("ax1"),
                        F.col("ax0") - F.col("bx1"))
        gy = F.greatest(F.lit(0.0), F.col("by0") - F.col("ay1"),
                        F.col("ay0") - F.col("by1"))
        cond = cond & (F.sqrt(gx * gx + gy * gy) <= F.lit(float(threshold)))
    pairs = a.join(b, on=cond)

    def _directed(src, dst):
        return F.aggregate(
            src, F.lit(0.0),
            lambda acc, p: F.greatest(acc, F.aggregate(
                dst, F.lit(float("inf")),
                lambda m, q: F.least(m, F.sqrt(
                    (p["x"] - q["x"]) * (p["x"] - q["x"])
                    + (p["y"] - q["y"]) * (p["y"] - q["y"]))))))

    hd = F.greatest(_directed(F.col("pa"), F.col("pb")),
                    _directed(F.col("pb"), F.col("pa")))
    out = pairs.select(F.col("ta").alias("track_a"),
                       F.col("tb").alias("track_b"),
                       "n_a", "n_b", hd.alias("hausdorff"))
    if threshold is not None:
        out = out.filter(F.col("hausdorff") <= F.lit(float(threshold)))
    return out
