"""Hausdorff trajectory join vs a numpy brute force."""

from __future__ import annotations

import numpy as np

from geomesa_spark.operators.trajectory import hausdorff_join


def _hausdorff(a, b):
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    return max(d.min(axis=1).max(), d.min(axis=0).max())


def _tracks(rng, n_tracks=6, n_pts=9):
    tracks = {}
    for t in range(n_tracks):
        ox, oy = rng.uniform(-50, 50, 2)
        pts = np.column_stack([ox + np.cumsum(rng.uniform(-1, 1, n_pts)),
                               oy + np.cumsum(rng.uniform(-1, 1, n_pts))])
        tracks[t] = pts
    return tracks


def test_hausdorff_matches_brute_force(spark):
    rng = np.random.default_rng(23)
    tracks = _tracks(rng)
    rows = [(t, k, float(p[0]), float(p[1]))
            for t, pts in tracks.items() for k, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "tid int, o int, x double, y double")
    got = {(r["track_a"], r["track_b"]): r["hausdorff"]
           for r in hausdorff_join(df, "tid", "x", "y", "o").collect()}
    assert len(got) == 15  # 6 choose 2
    for (ta, tb), hd in got.items():
        assert ta < tb
        assert abs(hd - _hausdorff(tracks[ta], tracks[tb])) < 1e-9


def test_hausdorff_threshold_prunes_and_filters(spark):
    rows = [(0, k, float(k), 0.0) for k in range(3)]          # near origin
    rows += [(1, k, float(k), 0.5) for k in range(3)]         # 0.5 above
    rows += [(2, k, 1000.0 + k, 0.0) for k in range(3)]       # far away
    df = spark.createDataFrame(rows, "tid int, o int, x double, y double")
    got = {(r["track_a"], r["track_b"]): r["hausdorff"]
           for r in hausdorff_join(df, "tid", "x", "y", "o",
                                   threshold=1.0).collect()}
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - 0.5) < 1e-12


def test_hausdorff_identical_tracks_zero(spark):
    rows = [(t, k, float(k), float(k)) for t in (0, 1) for k in range(4)]
    df = spark.createDataFrame(rows, "tid int, o int, x double, y double")
    r = hausdorff_join(df, "tid", "x", "y", "o").collect()
    assert len(r) == 1 and r[0]["hausdorff"] == 0.0


def test_hausdorff_max_points_guard(spark):
    import pytest

    rows = [(0, k, float(k), 0.0) for k in range(10)]
    df = spark.createDataFrame(rows, "tid int, o int, x double, y double")
    with pytest.raises(Exception, match="max_points"):
        hausdorff_join(df, "tid", "x", "y", "o", max_points=5).collect()


class TestCoTravel:
    def test_matches_brute_force(self, spark):
        import datetime as dt

        from geomesa_spark.operators.trajectory import co_travel

        rng = np.random.default_rng(43)
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(8):
            for k in range(12):
                rows.append((u, t0 + dt.timedelta(seconds=int(rng.integers(0, 86400))),
                             float(rng.uniform(-20, 20)), float(rng.uniform(-20, 20))))
        df = spark.createDataFrame(rows, "uid long, ts timestamp_ntz, x double, y double")
        eps_deg, eps_s = 6.0, 7200
        got = {(r["track_a"], r["track_b"]): r["n_hits"]
               for r in co_travel(df, "uid", "ts", "x", "y",
                                  eps_deg, eps_s).collect()}
        exp = {}
        for (ua, ta, xa, ya) in rows:
            for (ub, tb, xb, yb) in rows:
                if ua < ub and (xa - xb) ** 2 + (ya - yb) ** 2 < eps_deg ** 2 \
                        and abs((ta - tb).total_seconds()) <= eps_s:
                    exp[(ua, ub)] = exp.get((ua, ub), 0) + 1
        assert got == exp
        assert exp  # the fixture really produces hits

    def test_min_hits_filters(self, spark):
        import datetime as dt

        from geomesa_spark.operators.trajectory import co_travel

        t0 = dt.datetime(2024, 1, 1)
        rows = [(0, t0, 0.0, 0.0), (1, t0, 0.1, 0.0),          # 1 hit pair
                (2, t0, 50.0, 0.0), (3, t0, 50.1, 0.0),        # hit 1
                (2, t0 + dt.timedelta(hours=1), 51.0, 0.0),    # hit 2 + the
                (3, t0 + dt.timedelta(hours=1), 51.1, 0.0)]    # 2@1h-3@0 cross
        df = spark.createDataFrame(rows, "uid long, ts timestamp_ntz, x double, y double")
        got = {(r["track_a"], r["track_b"]): r["n_hits"]
               for r in co_travel(df, "uid", "ts", "x", "y", 1.0, 3600,
                                  min_hits=2).collect()}
        assert got == {(2, 3): 3}


def _np_frechet(P, Q):
    import numpy as np

    n, m = len(P), len(Q)
    d = np.sqrt(((P[:, None, :] - Q[None, :, :]) ** 2).sum(-1))
    ca = np.empty((n, m))
    for i in range(n):
        for j in range(m):
            best = (d[i, j] if i == 0 and j == 0 else
                    ca[i, j - 1] if i == 0 else
                    ca[i - 1, j] if j == 0 else
                    min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]))
            ca[i, j] = max(d[i, j], best)
    return ca[-1, -1]


def test_frechet_join_matches_numpy_dp(spark):
    import random

    import numpy as np

    from geomesa_spark.operators.trajectory import frechet_join

    rng = random.Random(11)
    rows = []
    tracks = {}
    for tid in range(6):
        npts = rng.randint(1, 9)
        pts = [(rng.uniform(-5, 5), rng.uniform(-5, 5)) for _ in range(npts)]
        tracks[tid] = np.array(pts)
        rows += [(tid, k, x, y) for k, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "tid long, seq long, x double, y double")
    got = {(r.track_a, r.track_b): r.frechet
           for r in frechet_join(df, "tid", "x", "y", "seq").collect()}
    assert len(got) == 15
    for (ta, tb), v in got.items():
        want = _np_frechet(tracks[ta], tracks[tb])
        assert abs(v - want) < 1e-12, (ta, tb, v, want)


def test_frechet_is_order_aware(spark):
    """A path and its reverse: Hausdorff 0, Fréchet = span."""
    from geomesa_spark.operators.trajectory import frechet_join, hausdorff_join

    fwd = [(0, k, float(k), 0.0) for k in range(5)]
    rev = [(1, k, float(4 - k), 0.0) for k in range(5)]
    df = spark.createDataFrame(fwd + rev, "tid long, seq long, x double, y double")
    h = hausdorff_join(df, "tid", "x", "y", "seq").first()
    f = frechet_join(df, "tid", "x", "y", "seq").first()
    assert h.hausdorff == 0.0
    assert f.frechet == 4.0


def test_frechet_threshold_prunes(spark):
    from geomesa_spark.operators.trajectory import frechet_join

    rows = ([(0, k, float(k), 0.0) for k in range(4)]
            + [(1, k, float(k), 0.5) for k in range(4)]
            + [(2, k, float(k) + 100.0, 0.0) for k in range(4)])
    df = spark.createDataFrame(rows, "tid long, seq long, x double, y double")
    got = {(r.track_a, r.track_b): r.frechet
           for r in frechet_join(df, "tid", "x", "y", "seq",
                                 threshold=1.0).collect()}
    assert set(got) == {(0, 1)} and abs(got[(0, 1)] - 0.5) < 1e-15


def _ref_dp(xs, ys, tol):
    """Textbook recursive Douglas-Peucker (same deviation + tie rule)."""
    import numpy as np

    def seg_d2(px, py, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        t = 0.0 if len2 == 0.0 else min(max(((px - x1) * dx + (py - y1) * dy)
                                            / len2, 0.0), 1.0)
        return (px - (x1 + t * dx)) ** 2 + (py - (y1 + t * dy)) ** 2

    n = len(xs)
    keep = {0, n - 1}

    def rec(i0, i1):
        if i1 - i0 < 2:
            return
        best, bj = -1.0, -1
        for j in range(i0 + 1, i1):
            d2 = seg_d2(xs[j], ys[j], xs[i0], ys[i0], xs[i1], ys[i1])
            if d2 > best:
                best, bj = d2, j
        if best > tol * tol:
            keep.add(bj)
            rec(i0, bj)
            rec(bj, i1)

    rec(0, n - 1)
    return sorted(keep)


def test_simplify_tracks_matches_reference(spark):
    import random

    from geomesa_spark.operators.trajectory import simplify_tracks

    rng = random.Random(13)
    rows, tracks = [], {}
    for tid in range(8):
        npts = rng.randint(1, 30)
        xs = [rng.uniform(-10, 10) for _ in range(npts)]
        ys = [rng.uniform(-10, 10) for _ in range(npts)]
        tracks[tid] = (xs, ys)
        rows += [(tid, k, xs[k], ys[k]) for k in range(npts)]
    # a closed loop (coincident endpoints) exercises the len2=0 path
    loop = [(100, 0, 0.0, 0.0), (100, 1, 5.0, 0.0), (100, 2, 5.0, 5.0),
            (100, 3, 0.0, 0.0)]
    tracks[100] = ([0.0, 5.0, 5.0, 0.0], [0.0, 0.0, 5.0, 0.0])
    rows += loop
    df = spark.createDataFrame(rows, "tid long, seq long, x double, y double")
    for tol in (0.5, 2.0):
        got = {}
        for r in simplify_tracks(df, "tid", "x", "y", "seq", tol).collect():
            got.setdefault(r.track, []).append(r.seq)
        for tid, (xs, ys) in tracks.items():
            want = (_ref_dp(xs, ys, tol) if len(xs) > 2
                    else list(range(len(xs))))
            assert sorted(got[tid]) == want, (tid, tol)


def test_simplify_tracks_straight_line_collapses(spark):
    from geomesa_spark.operators.trajectory import simplify_tracks

    rows = [(1, k, float(k), 0.0) for k in range(10)]
    rows[5] = (1, 5, 5.0, 0.5)  # one sub-tolerance spike
    df = spark.createDataFrame(rows, "tid long, seq long, x double, y double")
    kept = sorted(r.seq for r in
                  simplify_tracks(df, "tid", "x", "y", "seq", 1.0).collect())
    assert kept == [0, 9]   # everything within tolerance of the chord
    tight = sorted(r.seq for r in
                   simplify_tracks(df, "tid", "x", "y", "seq", 0.01).collect())
    # collinear runs drop at ANY tolerance; the spike and its shoulder
    # points (ends of the exactly-straight runs) survive
    assert tight == [0, 4, 5, 6, 9]


def test_convoys_known_answer(spark):
    import datetime as dt

    import pytest as _pt

    from geomesa_spark.operators.trajectory import convoys

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    # 1-minute bins. tracks 1&2: together bins 0,1,2 then apart bin 3,
    # together again bin 5 (run of 1). tracks 1&3: never close.
    rows = []
    for b in range(3):
        rows += [(1, ts(b), 0.0, 0.0), (2, ts(b), 0.1, 0.0)]
    rows += [(1, ts(3), 0.0, 0.0), (2, ts(3), 50.0, 0.0)]
    rows += [(1, ts(5), 0.0, 0.0), (2, ts(5), 0.1, 0.0)]
    rows += [(3, ts(0), 120.0, 0.0), (3, ts(1), 120.0, 0.0)]
    df = spark.createDataFrame(rows, "tid long, ts timestamp, lon double, lat double")
    got = {(r.track_a, r.track_b, r.start_bin % 10000, r.run_len)
           for r in convoys(df, "tid", "ts", "lon", "lat",
                            eps_deg=1.0, bin_s=60, min_len=2).collect()}
    # only the 3-bin run survives min_len=2
    assert len(got) == 1
    (ta, tb, _, rl), = got
    assert (ta, tb, rl) == (1, 2, 3)
    # min_len=1 also returns the singleton run at bin 5
    runs = {r.run_len for r in convoys(df, "tid", "ts", "lon", "lat",
                                       eps_deg=1.0, bin_s=60,
                                       min_len=1).collect()}
    assert runs == {3, 1}
    with _pt.raises(ValueError):
        convoys(df, "tid", "ts", "lon", "lat", 1.0, 60, 0)
