"""all_knn_join (large x large kNN join): brute-force equivalence.

The broadcast-side knn_join is covered by the driver oracle (q_knn /
q_knn_sphere); this file proves the shuffle-based all-kNN join — phase-1
in-cell kth-distance seeding + expanding-disk rounds — returns exactly
the brute-force top-k with the (dist, right_id) tie-break, across both
metrics, sparse/dense levels, and a right side smaller than k.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_spark.operators.knn import all_knn_join  # noqa: E402


def _mk_points(n, salt):
    ids = np.arange(n, dtype=np.int64)
    lon = ((ids * 7919 + salt) % 36000) / 100.0 - 180.0
    lat = ((ids * 104729 + salt * 3) % 18000) / 100.0 - 90.0
    return ids, lon, lat


def _brute(lids, llon, llat, rids, rlon, rlat, k, metric):
    out = set()
    for i, qid in enumerate(lids):
        if metric == "degrees":
            d = np.hypot(llon[i] - rlon, llat[i] - rlat)
        else:
            la1, la2 = np.radians(llat[i]), np.radians(rlat)
            dla, dlo = (la2 - la1) / 2, np.radians(rlon - llon[i]) / 2
            a = np.sin(dla) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo) ** 2
            d = 2 * 6371008.7714 * np.arcsin(np.sqrt(a))
        order = sorted(range(len(rids)), key=lambda j: (d[j], rids[j]))
        for rank, j in enumerate(order[:k], start=1):
            out.add((int(qid), int(rids[j]), rank))
    return out


def _run(spark, nl, nr, k, metric, level):
    lids, llon, llat = _mk_points(nl, 13)
    rids, rlon, rlat = _mk_points(nr, 29)
    left = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in zip(lids, llon, llat)],
        "lid long, lx double, ly double")
    right = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in zip(rids, rlon, rlat)],
        "rid long, rlon double, rlat double")
    out = all_knn_join(left, right, k, "lid", "lx", "ly",
                       "rid", "rlon", "rlat", metric=metric, level=level)
    got = {(r["lid"], r["rid"], r["rank"]) for r in out.collect()}
    assert got == _brute(lids, llon, llat, rids, rlon, rlat, k, metric)


def test_all_knn_degrees_sparse_cells(spark):
    # level 6 over 300 right points: ~0.07/cell -> exercises escalation rounds
    _run(spark, nl=80, nr=300, k=3, metric="degrees", level=6)


def test_all_knn_degrees_dense_cells(spark):
    # level 2 packs many points per cell -> phase-1 d_k seeding resolves
    # nearly everything in one round
    _run(spark, nl=60, nr=400, k=5, metric="degrees", level=2)


def test_all_knn_sphere(spark):
    _run(spark, nl=40, nr=200, k=3, metric="sphere", level=3)


def test_all_knn_right_smaller_than_k(spark):
    left = spark.createDataFrame([(0, 0.0, 0.0), (1, 100.0, 40.0)],
                                 "lid long, lx double, ly double")
    right = spark.createDataFrame([(7, 1.0, 1.0), (8, -50.0, 20.0)],
                                  "rid long, rlon double, rlat double")
    out = all_knn_join(left, right, k=5, left_id="lid", lx="lx", ly="ly",
                       right_id="rid", rx="rlon", ry="rlat", level=4)
    # every left gets both rights (all that exist), ranked
    assert out.count() == 4
    ranks = {(r["lid"], r["rank"]) for r in out.collect()}
    assert ranks == {(0, 1), (0, 2), (1, 1), (1, 2)}


def test_all_knn_duplicate_coords_zero_radius(spark):
    # k coincident neighbors make the phase-1 kth distance 0; the zero
    # disk must still retire the query with the true (tie-broken) top-k
    left = spark.createDataFrame([(0, 10.0, 10.0)],
                                 "lid long, lx double, ly double")
    right = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 10.0, 10.0), (3, 10.0, 10.0), (4, 11.0, 10.0)],
        "rid long, rlon double, rlat double")
    out = all_knn_join(left, right, k=2, left_id="lid", lx="lx", ly="ly",
                       right_id="rid", rx="rlon", ry="rlat", level=4)
    got = {(r["rid"], r["rank"]) for r in out.collect()}
    assert got == {(1, 1), (2, 2)}
