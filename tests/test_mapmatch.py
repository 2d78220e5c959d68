"""snap_join (map-matching) brute-force equivalence + track_segments."""

import math
import random

import pytest


def _pt_seg(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0.0 else min(max(((px - x1) * dx + (py - y1) * dy)
                                        / len2, 0.0), 1.0)
    sx, sy = x1 + t * dx, y1 + t * dy
    return math.sqrt((px - sx) ** 2 + (py - sy) ** 2), t, sx, sy


def test_snap_join_brute_force(spark):
    from geomesa_spark.operators.mapmatch import snap_join

    rng = random.Random(5)
    segs = []
    for sid in range(40):
        x1, y1 = rng.uniform(-20, 20), rng.uniform(-10, 10)
        segs.append((sid, x1, y1, x1 + rng.uniform(-3, 3),
                     y1 + rng.uniform(-3, 3)))
    segs.append((40, 5.0, 5.0, 5.0, 5.0))  # degenerate point-segment
    pts = [(pid, rng.uniform(-22, 22), rng.uniform(-12, 12))
           for pid in range(120)]
    sdf = spark.createDataFrame(segs, "sid long, x1 double, y1 double, "
                                      "x2 double, y2 double")
    pdf = spark.createDataFrame(pts, "pid long, px double, py double")
    max_dist = 2.0
    out = {r.pid: (r.seg_id, r.snap_dist, r.snap_t, r.snap_x, r.snap_y)
           for r in snap_join(pdf, sdf, "pid", "px", "py",
                              "sid", "x1", "y1", "x2", "y2",
                              max_dist, level=6).collect()}
    for pid, px, py in pts:
        cands = sorted(((*_pt_seg(px, py, *s[1:])[:1], s[0],
                         *_pt_seg(px, py, *s[1:])[1:]) for s in segs))
        best = cands[0]
        if best[0] > max_dist:
            assert pid not in out, pid
        else:
            assert pid in out, pid
            sid, d, t, sx, sy = out[pid]
            assert sid == best[1] and abs(d - best[0]) < 1e-12
            assert abs(t - best[2]) < 1e-12
            assert abs(sx - best[3]) < 1e-12 and abs(sy - best[4]) < 1e-12


def test_snap_join_left_and_ties(spark):
    from geomesa_spark.operators.mapmatch import snap_join

    # two segments equidistant from the point: min seg id wins
    segs = [(7, 0.0, 1.0, 10.0, 1.0), (3, 0.0, -1.0, 10.0, -1.0)]
    pts = [(1, 5.0, 0.0), (2, 50.0, 50.0)]
    sdf = spark.createDataFrame(segs, "sid long, x1 double, y1 double, "
                                      "x2 double, y2 double")
    pdf = spark.createDataFrame(pts, "pid long, px double, py double")
    rows = {r.pid: r for r in snap_join(pdf, sdf, "pid", "px", "py",
                                        "sid", "x1", "y1", "x2", "y2",
                                        2.0, level=5, how="left").collect()}
    assert rows[1].seg_id == 3 and rows[1].snap_dist == 1.0
    assert rows[2].seg_id is None
    with pytest.raises(ValueError):
        snap_join(pdf, sdf, "pid", "px", "py", "sid", "x1", "y1",
                  "x2", "y2", 2.0, how="outer")


def test_track_segments(spark):
    from geomesa_spark.operators.mapmatch import track_segments

    fixes = [(1, 0, 0.0, 0.0), (1, 1, 1.0, 0.0), (1, 2, 1.0, 2.0),
             (2, 0, 5.0, 5.0)]
    df = spark.createDataFrame(fixes, "tid long, seq long, x double, y double")
    got = {(r.track, r.seg_idx): (r.x1, r.y1, r.x2, r.y2)
           for r in track_segments(df, "tid", "x", "y", "seq").collect()}
    assert got == {(1, 0): (0.0, 0.0, 1.0, 0.0),
                   (1, 1): (1.0, 0.0, 1.0, 2.0)}


def _seg_x(a, b):
    (ax1, ay1, ax2, ay2), (bx1, by1, bx2, by2) = a, b
    rx, ry = ax2 - ax1, ay2 - ay1
    sx, sy = bx2 - bx1, by2 - by1
    denom = rx * sy - ry * sx
    if denom == 0.0:
        return None
    qpx, qpy = bx1 - ax1, by1 - ay1
    ta = (qpx * sy - qpy * sx) / denom
    tb = (qpx * ry - qpy * rx) / denom
    if 0.0 <= ta <= 1.0 and 0.0 <= tb <= 1.0:
        return ta, tb, ax1 + ta * rx, ay1 + ta * ry
    return None


def test_segment_intersections_brute_force(spark):
    from geomesa_spark.operators.mapmatch import segment_intersections

    rng = random.Random(17)
    A, B = [], []
    for i in range(50):
        x, y = rng.uniform(-20, 20), rng.uniform(-10, 10)
        A.append((i, x, y, x + rng.uniform(-6, 6), y + rng.uniform(-6, 6)))
    for i in range(60):
        x, y = rng.uniform(-20, 20), rng.uniform(-10, 10)
        B.append((i, x, y, x + rng.uniform(-6, 6), y + rng.uniform(-6, 6)))
    # endpoint touch and parallel pair
    A.append((50, 0.0, 0.0, 1.0, 0.0))
    B.append((60, 1.0, 0.0, 1.0, 5.0))   # touches A#50 at its endpoint
    B.append((61, 0.0, 1.0, 1.0, 1.0))   # parallel to A#50: excluded
    adf = spark.createDataFrame(A, "aid long, x1 double, y1 double, x2 double, y2 double")
    bdf = spark.createDataFrame(B, "bid long, x1 double, y1 double, x2 double, y2 double")
    got = {(r.a_id, r.b_id): (r.ta, r.tb, r.ix, r.iy)
           for r in segment_intersections(
               adf, bdf, "aid", "x1", "y1", "x2", "y2",
               "bid", "x1", "y1", "x2", "y2", level=6).collect()}
    want = {}
    for aid, *sa in A:
        for bid, *sb in B:
            hit = _seg_x(tuple(sa), tuple(sb))
            if hit is not None:
                want[(aid, bid)] = (hit[0], hit[1], hit[2], hit[3])
    assert set(got) == set(want)
    assert (50, 60) in got and (50, 61) not in got
    for k, (ta, tb, ix, iy) in want.items():
        gta, gtb, gix, giy = got[k]
        assert gta == ta and gtb == tb and gix == ix and giy == iy, k
