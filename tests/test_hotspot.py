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


def _brute_moran(grid, w, h):
    n = w * h
    xbar = grid.sum() / n
    z = grid - xbar
    m2 = (z * z).sum() / n
    out = {}
    for i in range(w):
        for j in range(h):
            i0, i1 = max(i - 1, 0), min(i + 1, w - 1)
            j0, j1 = max(j - 1, 0), min(j + 1, h - 1)
            ni = (i1 - i0 + 1) * (j1 - j0 + 1) - 1
            lag = (z[i0:i1 + 1, j0:j1 + 1].sum() - z[i, j]) / ni
            out[(i, j)] = (float(ni), z[i, j] / m2 * lag)
    return out


def test_local_moran_matches_brute_force(spark):
    from geomesa_spark.operators.hotspot import local_moran

    rng = np.random.default_rng(11)
    w, h = 10, 7
    grid = np.zeros((w, h))
    occ = sorted(set((int(a), int(b)) for a, b in
                     zip(rng.integers(0, w, 20), rng.integers(0, h, 20))))
    for i, j in occ:
        grid[i, j] = float(rng.integers(1, 40))
    df = spark.createDataFrame([(i, j, float(grid[i, j])) for i, j in occ],
                               "i int, j int, weight double")
    got = {(r["i"], r["j"]): (r["ni"], r["moran_i"])
           for r in local_moran(df, w, h).collect()}
    exp = _brute_moran(grid, w, h)
    assert set(got) == set(occ)
    for k, (ni, mi) in got.items():
        assert ni == exp[k][0]
        assert abs(mi - exp[k][1]) < 1e-9


def test_local_moran_isolated_cell_has_zero_occupied_neighbors(spark):
    """An isolated spike gets a LEFT-join zero, not a dropped row, and
    its lag is the pure absent-neighbor term -xbar."""
    from geomesa_spark.operators.hotspot import local_moran

    df = spark.createDataFrame([(5, 5, 100.0)], "i int, j int, weight double")
    rows = local_moran(df, 16, 16).collect()
    assert len(rows) == 1
    r = rows[0]
    xbar = 100.0 / 256.0
    assert r["ni"] == 8.0
    assert abs(r["lag"] - (-xbar)) < 1e-12
    assert r["moran_i"] < 0  # high value among zeros = high-low outlier


def _brute_gi_st(cube, w, h, nt):
    n = w * h * nt
    xbar = cube.sum() / n
    s = np.sqrt((cube * cube).sum() / n - xbar * xbar)
    out = {}
    for i in range(w):
        for j in range(h):
            for t in range(nt):
                i0, i1 = max(i - 1, 0), min(i + 1, w - 1)
                j0, j1 = max(j - 1, 0), min(j + 1, h - 1)
                t0, t1 = max(t - 1, 0), min(t + 1, nt - 1)
                wi = float((i1 - i0 + 1) * (j1 - j0 + 1) * (t1 - t0 + 1))
                swx = cube[i0:i1 + 1, j0:j1 + 1, t0:t1 + 1].sum()
                z = (swx - xbar * wi) / (s * np.sqrt((n * wi - wi * wi) / (n - 1)))
                out[(i, j, t)] = (wi, z)
    return out


def test_gi_star_st_matches_brute_force(spark):
    from geomesa_spark.operators.hotspot import gi_star_st

    rng = np.random.default_rng(13)
    w, h, nt = 6, 5, 4
    cube = np.zeros((w, h, nt))
    occ = sorted(set((int(a), int(b), int(c)) for a, b, c in
                     zip(rng.integers(0, w, 30), rng.integers(0, h, 30),
                         rng.integers(0, nt, 30))))
    for k in occ:
        cube[k] = float(rng.integers(1, 30))
    df = spark.createDataFrame([(i, j, t, float(cube[i, j, t]))
                                for i, j, t in occ],
                               "i int, j int, t int, weight double")
    got = {(r["i"], r["j"], r["t"]): (r["wi"], r["gi_z"])
           for r in gi_star_st(df, w, h, nt).collect()}
    exp = _brute_gi_st(cube, w, h, nt)
    assert set(got) == set(occ)
    for k, (wi, z) in got.items():
        assert wi == exp[k][0]
        assert abs(z - exp[k][1]) < 1e-9


def _brute_mk(series):
    s = 0
    nt = len(series)
    for a in range(nt - 1):
        for b in range(a + 1, nt):
            s += int(np.sign(series[b] - series[a]))
    var = nt * (nt - 1) * (2 * nt + 5) / 18.0
    if s > 0:
        z = (s - 1.0) / np.sqrt(var)
    elif s < 0:
        z = (s + 1.0) / np.sqrt(var)
    else:
        z = 0.0
    return s, z


def test_mann_kendall_matches_brute_force(spark):
    from geomesa_spark.operators.hotspot import mann_kendall

    rng = np.random.default_rng(17)
    nt = 8
    rows, exp = [], {}
    for c, (i, j) in enumerate([(0, 0), (1, 2), (3, 3), (4, 1)]):
        series = np.zeros(nt)
        bins = sorted(set(int(b) for b in rng.integers(0, nt, 5)))
        for b in bins:
            series[b] = float(rng.integers(1, 20))
            rows.append((i, j, b, float(series[b])))
        exp[(i, j)] = _brute_mk(series)
    df = spark.createDataFrame(rows, "i int, j int, t int, weight double")
    got = {(r["i"], r["j"]): (r["s_stat"], r["z"])
           for r in mann_kendall(df, nt).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-12


def test_mann_kendall_monotone_series(spark):
    from geomesa_spark.operators.hotspot import mann_kendall

    rows = [(0, 0, t, float(t + 1)) for t in range(6)]       # strictly up
    rows += [(1, 1, t, float(6 - t)) for t in range(6)]      # strictly down
    df = spark.createDataFrame(rows, "i int, j int, t int, weight double")
    got = {(r["i"], r["j"]): r["s_stat"] for r in mann_kendall(df, 6).collect()}
    assert got[(0, 0)] == 15 and got[(1, 1)] == -15


def test_cell_anomaly_known_answer(spark):
    import math

    import pytest as _pt

    from geomesa_spark.operators.hotspot import cell_anomaly

    # cell (0,0): one spike of 10 at t=3 over nt=10 (absent bins zero)
    # cell (1,1): constant occupied value but var>0 from the zeros
    # cell (2,2): fully constant series (var 0) -> no output
    rows = ([(0, 0, 3, 10.0)]
            + [(1, 1, t, 4.0) for t in range(5)]
            + [(2, 2, t, 7.0) for t in range(10)])
    df = spark.createDataFrame(rows, "i int, j int, t int, weight double")
    got = {(r.i, r.j, r.t): r.z
           for r in cell_anomaly(df, 10, z_thresh=1.5).collect()}
    # cell (0,0): mean=1, var=100/10-1=9 -> z=(10-1)/3=3
    assert abs(got[(0, 0, 3)] - 3.0) < 1e-12
    # cell (1,1): mean=2, var=80/10-4=4 -> z=(4-2)/2=1 < 1.5 -> absent
    assert all(k[0] != 1 for k in got)
    assert all(k[0] != 2 for k in got)
    with _pt.raises(ValueError):
        cell_anomaly(df, 1)


def test_decayed_density_known_answer(spark):
    import datetime as dt

    from geomesa_spark.operators.tiling import decayed_density

    t0 = dt.datetime(2024, 1, 2)
    rows = [
        (1, t0, 0.5, 0.5),                                 # age 0 -> 1.0
        (2, t0 - dt.timedelta(hours=1), 0.5, 0.5),         # 1 hl -> 0.5
        (3, t0 - dt.timedelta(hours=2), 0.5, 0.5),         # 2 hl -> 0.25
        (4, t0 + dt.timedelta(hours=1), 0.5, 0.5),         # future: dropped
        (5, t0, 5.5, 0.5),                                 # other tile
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "lon double, lat double")
    got = {(r.i, r.j): r.weight32 for r in decayed_density(
        df, "lon", "lat", "ts", "2024-01-02 00:00:00", 3600.0,
        0.0, 0.0, 10.0, 1.0, 10, 1, id_col="event_id").collect()}
    assert abs(got[(0, 0)] - 1.75) < 1e-6
    assert abs(got[(5, 0)] - 1.0) < 1e-6
    assert len(got) == 2
