"""Geometric aggregations: convex hull, extent, track building.

The reference's ConvexHull UDAF (geomesa-spark-jts udaf/ConvexHull.scala:
16-51 — running union().convexHull() with partial merge) re-expressed as
Spark's native partial aggregation shape: per-partition hulls via
applyInPandas (each group's points reduced to <= hull vertices), final
hull on the merged vertex set. Extent = plain min/max agg (RelationUtils
getBound:72-83). Point2Point (analytic/Point2PointProcess.scala:27) =
window-ordered track assembly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

__all__ = ["convex_hull_points", "monotone_chain", "extent_agg", "point2point"]


def monotone_chain(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain: (n,2) hull vertices in CCW order."""
    pts = np.unique(np.column_stack([xs, ys]), axis=0)  # sorted lexicographic
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


_HULL_SCHEMA = StructType([
    StructField("group", StringType()),
    StructField("hull_x", ArrayType(DoubleType())),
    StructField("hull_y", ArrayType(DoubleType())),
    StructField("n_hull", LongType()),
])


def convex_hull_points(df: DataFrame, group_col: str, x: str = "lon",
                       y: str = "lat") -> DataFrame:
    """Per-group convex hull of a point layer.

    Two-level: per (group, partition-chunk) partial hulls, then the final
    hull per group over the tiny partial vertex sets — the UDAF
    partial/merge shape, so no group ever collects all its raw points.
    """
    chunk = F.spark_partition_id()
    partial_in = df.select(F.col(group_col).cast("string").alias("group"),
                           F.col(x).alias("__x__"), F.col(y).alias("__y__"),
                           chunk.alias("__chunk__"))

    def hull_of(pdf: pd.DataFrame) -> pd.DataFrame:
        h = monotone_chain(pdf["__x__"].to_numpy(np.float64),
                           pdf["__y__"].to_numpy(np.float64))
        return pd.DataFrame({
            "group": [pdf["group"].iloc[0]],
            "hull_x": [h[:, 0].tolist()], "hull_y": [h[:, 1].tolist()],
            "n_hull": [len(h)],
        })

    partial = partial_in.groupBy("group", "__chunk__").applyInPandas(
        lambda pdf: hull_of(pdf), _HULL_SCHEMA)

    merged = (partial.select("group", F.explode(F.arrays_zip("hull_x", "hull_y")).alias("v"))
                     .select("group", F.col("v.hull_x").alias("__x__"),
                             F.col("v.hull_y").alias("__y__"))
                     .withColumn("__chunk__", F.lit(0)))
    return merged.groupBy("group", "__chunk__").applyInPandas(
        lambda pdf: hull_of(pdf), _HULL_SCHEMA).drop("__chunk__")


def extent_agg(df: DataFrame, x: str = "lon", y: str = "lat"):
    """Geometry-envelope aggregate (st_extent)."""
    return df.agg(F.min(x).alias("xmin"), F.min(y).alias("ymin"),
                  F.max(x).alias("xmax"), F.max(y).alias("ymax"))


def point2point(df: DataFrame, track_col: str, order_cols: list[str],
                x: str = "lon", y: str = "lat") -> DataFrame:
    """Collect each track's points into an ordered line (Point2Point).

    Returns (track, n_points, line) where line is 'x y,x y,...' in order.
    """
    pt = F.concat_ws(" ", F.col(x).cast("string"), F.col(y).cast("string"))
    struct_cols = [F.col(c) for c in order_cols] + [pt.alias("__pt__")]
    arr = F.array_sort(F.collect_list(F.struct(*struct_cols)))
    line = F.array_join(F.transform(arr, lambda s: s["__pt__"]), ",")
    return (df.groupBy(track_col)
              .agg(F.count("*").alias("n_points"), line.alias("line")))
