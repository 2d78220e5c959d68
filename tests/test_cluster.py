"""DBSCAN: brute-force equivalence + role/boundary semantics."""

import numpy as np
import pytest

from geomesa_spark.operators.cluster import dbscan, eps_neighbor_pairs, release


def _brute_dbscan(ids, xs, ys, eps, min_pts, metric="degrees"):
    """Reference DBSCAN with the operator's deterministic conventions:
    inclusive distance, cluster_id = min core id of the component,
    border -> min cluster over core neighbors."""
    n = len(ids)
    if metric == "sphere":
        rad = np.pi / 180.0
        dphi = (ys[None, :] - ys[:, None]) * rad / 2
        dlam = (xs[None, :] - xs[:, None]) * rad / 2
        a = (np.sin(dphi) ** 2
             + np.cos(ys[:, None] * rad) * np.cos(ys[None, :] * rad)
             * np.sin(dlam) ** 2)
        d = 2.0 * 6371008.8 * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
        nbr = d <= eps
    else:
        d2 = (xs[:, None] - xs) ** 2 + (ys[:, None] - ys) ** 2
        nbr = d2 <= eps * eps
    np.fill_diagonal(nbr, False)
    core = nbr.sum(1) + 1 >= min_pts
    # components over core-core edges (BFS), label = min core id
    label = {}
    for s in np.argsort(ids):
        if not core[s] or ids[s] in label:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in np.where(nbr[v] & core)[0]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        m = min(ids[v] for v in comp)
        for v in comp:
            label[ids[v]] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (label[ids[i]], "core")
        else:
            cn = [label[ids[j]] for j in np.where(nbr[i] & core)[0]]
            out[ids[i]] = (min(cn), "border") if cn else (None, "noise")
    return out


def _clustered_points(rng, n_clusters=6, per=40, n_noise=60):
    cx = rng.uniform(-150, 150, n_clusters)
    cy = rng.uniform(-60, 60, n_clusters)
    xs = np.concatenate([cx[i] + rng.normal(0, 0.6, per)
                         for i in range(n_clusters)]
                        + [rng.uniform(-170, 170, n_noise)])
    ys = np.concatenate([cy[i] + rng.normal(0, 0.6, per)
                         for i in range(n_clusters)]
                        + [rng.uniform(-80, 80, n_noise)])
    ids = np.arange(len(xs)) * 7 + 3  # non-contiguous ids
    return ids, xs, ys


@pytest.mark.parametrize("eps,min_pts", [(1.0, 5), (0.7, 4), (2.0, 10)])
def test_dbscan_matches_brute_force(spark, eps, min_pts):
    rng = np.random.default_rng(42)
    ids, xs, ys = _clustered_points(rng)
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in zip(ids, xs, ys)],
        "id long, lon double, lat double")
    got = dbscan(df, eps, min_pts, level=10)
    rows = {r["id"]: (r["cluster_id"], r["role"]) for r in got.collect()}
    release(got)
    exp = _brute_dbscan(ids, xs, ys, eps, min_pts)
    assert rows == exp
    roles = {v[1] for v in exp.values()}
    assert roles == {"core", "border", "noise"}  # scenario exercises all


def test_dbscan_inclusive_eps_boundary(spark):
    # 3 collinear points exactly eps apart: all core at min_pts=2,
    # one chain-connected cluster (inclusive <=, the DBSCAN convention)
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 2.0, 0.0)],
        "id long, lon double, lat double")
    got = dbscan(df, 1.0, 2, level=10)
    rows = {r["id"]: (r["cluster_id"], r["role"]) for r in got.collect()}
    release(got)
    assert rows == {1: (1, "core"), 2: (1, "core"), 3: (1, "core")}


def test_dbscan_singleton_core_and_border(spark):
    # tight pair (4,5) + far point 9: min_pts=2 -> 4,5 core cluster 4,
    # 9 noise. min_pts=3 with a third point near: border semantics.
    df = spark.createDataFrame(
        [(4, 0.0, 0.0), (5, 0.1, 0.0), (6, 0.2, 0.0), (9, 50.0, 0.0)],
        "id long, lon double, lat double")
    # 6 is within eps of 5 but not 4; min_pts=3 -> 5 core (nbrs 4,6),
    # 4 and 6 border (1 nbr each + self = 2 < 3), 9 noise
    got = dbscan(df, 0.15, 3, level=10)
    rows = {r["id"]: (r["cluster_id"], r["role"]) for r in got.collect()}
    release(got)
    assert rows == {4: (5, "border"), 5: (5, "core"),
                    6: (5, "border"), 9: (None, "noise")}


def test_dbscan_sphere_metric(spark):
    rng = np.random.default_rng(7)
    ids, xs, ys = _clustered_points(rng, n_clusters=3, per=25, n_noise=20)
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in zip(ids, xs, ys)],
        "id long, lon double, lat double")
    eps_m, min_pts = 80_000.0, 5
    got = dbscan(df, eps_m, min_pts, metric="sphere", level=9)
    rows = {r["id"]: (r["cluster_id"], r["role"]) for r in got.collect()}
    release(got)
    exp = _brute_dbscan(ids, xs, ys, eps_m, min_pts, metric="sphere")
    assert rows == exp


def test_eps_pairs_symmetric_and_exclude_self(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.5, 0.0), (3, 10.0, 0.0)],
        "id long, lon double, lat double")
    pairs = {(r["id_a"], r["id_b"])
             for r in eps_neighbor_pairs(df, 1.0, level=10).collect()}
    assert pairs == {(1, 2), (2, 1)}
