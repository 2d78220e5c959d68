"""IDW gridding vs a dense numpy brute force."""

from __future__ import annotations

import numpy as np

from geomesa_spark.operators.interpolate import idw_grid


def _brute(samples, xmin, ymin, dx, dy, w, h, r):
    """Dense IDW over all cells, then drop cells with no sample within
    r Chebyshev cells (the emit-near-data rule)."""
    out = {}
    for i in range(w):
        for j in range(h):
            cx, cy = xmin + (i + 0.5) * dx, ymin + (j + 0.5) * dy
            swt = swv = 0.0
            n = 0
            for (px, py, v, pi, pj) in samples:
                if abs(pi - i) <= r and abs(pj - j) <= r:
                    d2 = (px - cx) ** 2 + (py - cy) ** 2
                    wt = 1.0 / (d2 + 1e-12)
                    swt += wt
                    swv += wt * v
                    n += 1
            if n:
                out[(i, j)] = (n, swv / swt)
    return out


def test_idw_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    w, h, r = 10, 8, 2
    xmin, ymin, dx, dy = 0.0, 0.0, 1.0, 1.0
    pts = [(float(rng.uniform(0, 10)), float(rng.uniform(0, 8)),
            float(rng.integers(1, 100))) for _ in range(30)]
    samples = [(px, py, v, min(int(px // dx), w - 1), min(int(py // dy), h - 1))
               for px, py, v in pts]
    df = spark.createDataFrame(
        [(k, px, py, v) for k, (px, py, v) in enumerate(pts)],
        "sid long, x double, y double, v double")
    got = {(row["i"], row["j"]): (row["n_src"], row["est"])
           for row in idw_grid(df, "x", "y", "v", 0.0, 0.0, 10.0, 8.0,
                               w, h, radius_cells=r).collect()}
    exp = _brute(samples, xmin, ymin, dx, dy, w, h, r)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9


def test_idw_deterministic_path_agrees(spark):
    rng = np.random.default_rng(5)
    pts = [(k, float(rng.uniform(0, 4)), float(rng.uniform(0, 4)),
            float(rng.integers(1, 50))) for k in range(25)]
    df = spark.createDataFrame(pts, "sid long, x double, y double, v double")
    fast = {(r["i"], r["j"]): (r["n_src"], r["est"])
            for r in idw_grid(df, "x", "y", "v", 0.0, 0.0, 4.0, 4.0, 8, 8,
                              radius_cells=2).collect()}
    det = {(r["i"], r["j"]): (r["n_src"], r["est"])
           for r in idw_grid(df, "x", "y", "v", 0.0, 0.0, 4.0, 4.0, 8, 8,
                             radius_cells=2, id_col="sid",
                             deterministic=True).collect()}
    assert set(fast) == set(det)
    for k in fast:
        assert fast[k][0] == det[k][0]
        assert abs(fast[k][1] - det[k][1]) < 1e-9


def test_idw_exact_hit_dominates(spark):
    """A sample on the cell center pins the estimate to its value."""
    df = spark.createDataFrame(
        [(0, 0.5, 0.5, 42.0), (1, 1.9, 0.5, 7.0)],
        "sid long, x double, y double, v double")
    got = {(r["i"], r["j"]): r["est"]
           for r in idw_grid(df, "x", "y", "v", 0.0, 0.0, 4.0, 4.0, 4, 4,
                             radius_cells=2).collect()}
    assert abs(got[(0, 0)] - 42.0) < 1e-6


def _brute_areal(srcs, dsts):
    out = {}
    for did, dx0, dy0, dx1, dy1 in dsts:
        tot = 0.0
        for sid, sx0, sy0, sx1, sy1, v in sorted(srcs):
            ox = min(sx1, dx1) - max(sx0, dx0)
            oy = min(sy1, dy1) - max(sy0, dy0)
            if ox > 0 and oy > 0 and sx1 > sx0 and sy1 > sy0:
                tot += v * (ox * oy) / ((sx1 - sx0) * (sy1 - sy0))
        if tot:
            out[did] = tot
    return out


def test_areal_interpolate_rects_brute_force(spark):
    import random

    from geomesa_spark.operators.interpolate import areal_interpolate_rects

    rng = random.Random(8)
    srcs = []
    for sid in range(60):
        x0, y0 = rng.uniform(-40, 40), rng.uniform(-20, 20)
        srcs.append((sid, x0, y0, x0 + rng.uniform(0, 15),
                     y0 + rng.uniform(0, 8), rng.uniform(1, 10)))
    srcs.append((60, 0.0, 0.0, 0.0, 5.0, 99.0))   # degenerate: dropped
    dsts = []
    for did in range(20):
        x0, y0 = rng.uniform(-40, 40), rng.uniform(-20, 20)
        dsts.append((did, x0, y0, x0 + rng.uniform(1, 20),
                     y0 + rng.uniform(1, 10)))
    sdf = spark.createDataFrame(
        srcs, "sid long, x0 double, y0 double, x1 double, y1 double, v double")
    ddf = spark.createDataFrame(
        dsts, "did long, x0 double, y0 double, x1 double, y1 double")
    got = {r.did: r.value for r in areal_interpolate_rects(
        sdf, ddf, "sid", ("x0", "y0", "x1", "y1"), "v",
        "did", ("x0", "y0", "x1", "y1"), level=5,
        deterministic=True).collect()}
    want = _brute_areal(srcs, dsts)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    # mass conservation when a source is fully covered by one target
    sdf2 = spark.createDataFrame([(1, 0.0, 0.0, 1.0, 1.0, 7.0)],
                                 "sid long, x0 double, y0 double, x1 double, y1 double, v double")
    ddf2 = spark.createDataFrame([(1, -5.0, -5.0, 5.0, 5.0)],
                                 "did long, x0 double, y0 double, x1 double, y1 double")
    one = areal_interpolate_rects(sdf2, ddf2, "sid",
                                  ("x0", "y0", "x1", "y1"), "v",
                                  "did", ("x0", "y0", "x1", "y1")).first()
    assert one.value == 7.0
