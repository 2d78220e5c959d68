"""Quantized Lloyd k-means vs a numpy replication of the same rules."""

from __future__ import annotations

import numpy as np

from geomesa_spark.operators.ann import mix64
from geomesa_spark.operators.kmeans import kmeans_assign


def _brute(ids, vecs, k, iters, scale=256.0, seed=42):
    q = np.floor(vecs.astype(np.float64) * scale)
    order = np.lexsort((ids, mix64(ids.astype(np.int64), seed)))
    cents = q[order[:k]].astype(np.float64)

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return d.argmin(axis=1), d.min(axis=1)  # argmin: first min = low id

    for _ in range(iters):
        cl, _ = assign(cents)
        for c in range(k):
            m = cl == c
            if m.any():
                cents[c] = q[m].sum(axis=0) / m.sum()
    cl, dist = assign(cents)
    return dict(zip(ids.tolist(), zip(cl.tolist(), dist.tolist())))


def test_kmeans_matches_brute_force(spark):
    rng = np.random.default_rng(31)
    n, dim, k = 60, 6, 4
    centers = rng.uniform(-4, 4, (k, dim))
    vecs = (centers[rng.integers(0, k, n)]
            + rng.normal(0, 0.3, (n, dim))).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_assign(df, k=k, iters=3).collect()}
    exp = _brute(ids, vecs, k, iters=3)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-6


def test_kmeans_iterations_improve_inertia(spark):
    rng = np.random.default_rng(37)
    vecs = rng.normal(0, 1, (80, 4)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    inertia0 = sum(r["dist"] for r in
                   kmeans_assign(df, k=5, iters=0).collect())
    inertia3 = sum(r["dist"] for r in
                   kmeans_assign(df, k=5, iters=3).collect())
    assert inertia3 <= inertia0


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_assign(df, k=3, iters=2).count() == 0
