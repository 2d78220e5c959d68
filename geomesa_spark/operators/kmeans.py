"""Distributed Lloyd k-means over embedding columns.

The engine's ANN family (operators/ann.py) uses a 0-iteration sample
quantizer; this is the full iterative refinement — the building block
for IVF training, semantic sharding, and SemDeDup-style clustering at
corpus scale.

Spark-first shape per Lloyd iteration:

* **assignment** is map-only: centroids travel as k x dim literal
  expressions (a few KB), the per-vector argmin runs as JVM
  higher-order folds — no shuffle, no Python, no UDF;
* **update** is ONE combining aggregation of k x dim scalar sums
  (map-side partial agg, then a k-row shuffle) — the only data motion
  per iteration, independent of corpus size per reducer.

The k x dim centroid matrix is collected to the driver between
iterations (bounded: k clusters x dim floats), matching how every
production Lloyd implementation ships centroids.

Cross-engine exactness (the DuckDB oracle unrolls the same
iterations): vectors are QUANTIZED once to integers
(floor(x * scale)), so per-cluster per-dimension sums are exact in
any summation order; centroid components are single exact divisions;
distances are fixed-order folds over the array index; argmin ties
break to the smallest centroid id. Every iteration is therefore
bit-reproducible. Quantized k-means is also the honest scale variant
(int8/int16 vectors are what 100 TB embedding stores hold — see
operators/ann.quantized_* ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (pUDF type-hint resolution)
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

__all__ = ["kmeans_assign"]


def _quantize(df: DataFrame, id_col: str, vec_col: str,
              scale: float) -> DataFrame:
    q = F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * F.lit(scale))
                               .cast("long"))
    return df.select(F.col(id_col).cast("long").alias("id"),
                     q.alias("q"))


def _init_centroids(q: DataFrame, k: int, seed: int) -> list[list[float]]:
    """Deterministic seeds: the k vectors with smallest splitmix64(id)
    (ties by id) — the `ann._sample_centroids` convention, unnormalized
    (L2 k-means wants raw magnitudes)."""
    from .ann import mix64

    @F.pandas_udf(LongType())
    def _mixu(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    picked = (q.withColumn("__m__", _mixu("id"))
               .orderBy("__m__", "id").limit(k).collect())
    return [[float(v) for v in r["q"]] for r in picked]


def _dist_expr(cent: list[float]) -> F.Column:
    lits = F.array(*[F.lit(c) for c in cent])
    sq = F.zip_with(F.col("q"), lits, lambda a, b: (a - b) * (a - b))
    return F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale: float = 256.0, seed: int = 42,
                  dim: int | None = None) -> DataFrame:
    """Lloyd k-means; returns the final assignment
    (``id_col``, cluster, dist) with cluster in [0, k) (seed order) and
    dist the squared quantized-space L2 to the winning centroid.

    ``iters`` update rounds run before the returned assignment; empty
    clusters keep their previous centroid. ``dim`` is inferred from the
    first row when not given.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None:
            return df.sparkSession.createDataFrame(
                [], f"{id_col} long, cluster int, dist double")
        dim = int(first["d"])
    raw = _quantize(df, id_col, vec_col, scale)
    q = raw.persist() if iters > 0 else raw
    cents = _init_centroids(q, k, seed)
    k = len(cents)  # fewer rows than k: degenerate but well-defined

    def _with_cluster(frame: DataFrame) -> DataFrame:
        dists = F.array(*[_dist_expr(c) for c in cents])
        best = F.array_min(dists)
        # first index of the minimum -> ties to the smallest cluster id
        cl = (F.array_position(dists, best) - 1).cast("int")
        return frame.select("id", "q", cl.alias("cluster"),
                            best.alias("dist"))

    for _ in range(iters):
        agg = (_with_cluster(q)
               .groupBy("cluster")
               .agg(F.count("*").alias("n"),
                    *[F.sum(F.element_at("q", d + 1)).alias(f"s{d}")
                      for d in range(dim)])
               .collect())
        got = {r["cluster"]: r for r in agg}
        cents = [
            [float(got[c][f"s{d}"]) / float(got[c]["n"]) for d in range(dim)]
            if c in got else cents[c]
            for c in range(k)]
    # the returned frame reads from the UNCACHED lineage so the
    # iteration cache can be released here, not leaked for the session
    out = _with_cluster(raw).select(F.col("id").alias(id_col),
                                    "cluster", "dist")
    if iters > 0:
        q.unpersist()
    return out
