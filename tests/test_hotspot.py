"""Gi* hotspot detection vs a dense numpy brute force."""

from __future__ import annotations

import numpy as np

from geomesa_spark.operators.hotspot import gi_star


def _brute(grid, w, h):
    """Dense Gi* over the full w x h grid (queen + self weights)."""
    n = w * h
    xbar = grid.sum() / n
    s = np.sqrt((grid * grid).sum() / n - xbar * xbar)
    out = {}
    for i in range(w):
        for j in range(h):
            i0, i1 = max(i - 1, 0), min(i + 1, w - 1)
            j0, j1 = max(j - 1, 0), min(j + 1, h - 1)
            wi = float((i1 - i0 + 1) * (j1 - j0 + 1))
            swx = grid[i0:i1 + 1, j0:j1 + 1].sum()
            z = (swx - xbar * wi) / (s * np.sqrt((n * wi - wi * wi) / (n - 1)))
            out[(i, j)] = (wi, z)
    return out


def test_gi_star_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    w, h = 12, 8
    grid = np.zeros((w, h))
    occupied = [(int(i), int(j)) for i, j in
                zip(rng.integers(0, w, 25), rng.integers(0, h, 25))]
    for i, j in occupied:
        grid[i, j] += float(rng.integers(1, 50))
    rows = [(i, j, float(grid[i, j])) for i, j in sorted(set(occupied))]
    df = spark.createDataFrame(rows, "i int, j int, weight double")
    got = {(r["i"], r["j"]): (r["wi"], r["gi_z"], r["weight"])
           for r in gi_star(df, w, h).collect()}
    exp = _brute(grid, w, h)
    assert set(got) == set((i, j) for i, j in sorted(set(occupied)))
    for (i, j), (wi, z, x) in got.items():
        assert x == grid[i, j]
        assert wi == exp[(i, j)][0]
        assert abs(z - exp[(i, j)][1]) < 1e-9


def test_gi_star_corner_edge_interior_wi(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (5, 0, 1.0), (5, 5, 1.0)], "i int, j int, weight double")
    got = {(r["i"], r["j"]): r["wi"] for r in gi_star(df, 16, 16).collect()}
    assert got == {(0, 0): 4.0, (5, 0): 6.0, (5, 5): 9.0}


def test_gi_star_hot_blob_beats_background(spark):
    """A dense 3x3 blob must score a higher z than isolated singles."""
    rows = [(i, j, 9.0) for i in (7, 8, 9) for j in (7, 8, 9)]
    rows += [(0, 0, 1.0), (15, 15, 1.0)]
    df = spark.createDataFrame(rows, "i int, j int, weight double")
    got = {(r["i"], r["j"]): r["gi_z"] for r in gi_star(df, 16, 16).collect()}
    assert got[(8, 8)] > got[(0, 0)]
    assert got[(8, 8)] == max(got.values())
