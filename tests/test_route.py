"""Route search: heading-matched proximity along a route."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.route import route_search


@pytest.fixture()
def route(spark):
    # eastward route along the equator: (0,0) -> (10,0)
    return spark.createDataFrame(
        [(i, float(i * 2), 0.0) for i in range(6)], "seq long, lon double, lat double")


def test_route_search_heading_filter(spark, route):
    data = spark.createDataFrame([
        (1, 5.0, 0.05, 90.0),    # near route, heading east -> match
        (2, 5.0, 0.05, 270.0),   # heading west -> match (bidirectional)
        (3, 5.0, 0.05, 0.0),     # heading north -> no match
        (4, 5.0, 5.0, 90.0),     # far from route -> no match
        (5, 9.9, -0.08, 100.0),  # near, heading ~east -> match
    ], "event_id long, lon double, lat double, heading double")
    out = route_search(route, data, buffer_deg=0.2, heading_tol=30.0)
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 5]


def test_route_search_unidirectional(spark, route):
    data = spark.createDataFrame([
        (1, 5.0, 0.05, 90.0),
        (2, 5.0, 0.05, 270.0),
    ], "event_id long, lon double, lat double, heading double")
    out = route_search(route, data, buffer_deg=0.2, heading_tol=30.0,
                       bidirectional=False)
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1]


def test_route_search_brute_force_equivalence(spark):
    # random route + random data: cell-join result == brute-force oracle
    rng = np.random.RandomState(3)
    rpts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(np.cumsum(rng.uniform(0.5, 2, 10)) - 10, rng.uniform(-2, 2, 10)))]
    route = spark.createDataFrame(rpts, "seq long, lon double, lat double")
    d = [(i, float(rng.uniform(-12, 12)), float(rng.uniform(-4, 4)),
          float(rng.uniform(0, 360))) for i in range(500)]
    data = spark.createDataFrame(d, "event_id long, lon double, lat double, heading double")

    got = sorted(r["event_id"] for r in
                 route_search(route, data, buffer_deg=0.5, heading_tol=60.0).collect())

    # brute force oracle in numpy
    segs = [(rpts[i][1], rpts[i][2], rpts[i + 1][1], rpts[i + 1][2])
            for i in range(len(rpts) - 1)]
    want = []
    for (eid, px, py, hd) in d:
        ok = False
        for (x0, y0, x1, y1) in segs:
            vx, vy = x1 - x0, y1 - y0
            L2 = vx * vx + vy * vy
            t = 0.0 if L2 == 0 else max(0.0, min(1.0, ((px - x0) * vx + (py - y0) * vy) / L2))
            dist = np.hypot(px - (x0 + t * vx), py - (y0 + t * vy))
            az = (np.degrees(np.arctan2(vx, vy)) + 360.0) % 360.0
            diff = abs(hd - az) % 360.0
            diff = min(diff, 360.0 - diff)
            diff = min(diff, abs(diff - 180.0))
            if dist <= 0.5 and diff <= 60.0:
                ok = True
                break
        if ok:
            want.append(eid)
    assert got == sorted(want)


def test_track_interpolate_half_open_grid(spark):
    """Hand-checkable resampling: ticks land on (t0, t1] multiples of
    step, linear in x/y; single-fix tracks and duplicate timestamps
    produce nothing."""
    import datetime as dt

    from geomesa_spark.operators.route import track_interpolate

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)
    rows = [
        ("a", t(0), 0.0, 0.0, 1),
        ("a", t(100), 10.0, -10.0, 2),
        ("a", t(160), 16.0, -16.0, 3),
        ("b", t(5), 1.0, 1.0, 4),      # single fix -> no samples
        ("c", t(50), 2.0, 2.0, 5),     # duplicate ts -> zero-length segment
        ("c", t(50), 3.0, 3.0, 6),
    ]
    df = spark.createDataFrame(
        rows, "track string, ts timestamp_ntz, x double, y double, oid int")
    out = track_interpolate(df, "track", "ts", "x", "y", step_s=25,
                            order_col="oid")
    got = sorted((r["track"], r["sample_ts"].second + r["sample_ts"].minute * 60,
                  r["x"], r["y"]) for r in out.collect())
    # base ts is midnight-aligned, so ticks are 25,50,75,100 then 125,150
    assert got == [
        ("a", 25, 2.5, -2.5), ("a", 50, 5.0, -5.0), ("a", 75, 7.5, -7.5),
        ("a", 100, 10.0, -10.0), ("a", 125, 12.5, -12.5), ("a", 150, 15.0, -15.0),
    ]


def test_stay_points_chain_rule(spark):
    """Hand-built track: a 3-fix stay (span 1200 s) qualifies; the later
    2-fix stay (span 600 s) fails the duration gate; lone jumps never
    form a stay."""
    import datetime as dt

    from geomesa_spark.operators.route import stay_points

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        ("a", t(0), 0.0, 0.0, 1),
        ("a", t(600), 0.5, 0.0, 2),
        ("a", t(1200), 1.0, 0.0, 3),
        ("a", t(1800), 50.0, 50.0, 4),   # jump -> new run
        ("a", t(2400), 50.2, 50.0, 5),   # 2-fix run but only 600 s
        ("b", t(0), 9.0, 9.0, 6),        # single fix
    ]
    df = spark.createDataFrame(
        rows, "track string, ts timestamp_ntz, x double, y double, oid int")
    got = stay_points(df, "track", "ts", "x", "y", radius_deg=1.0,
                      min_duration_s=900, order_col="oid").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["track"], r["n_fixes"], r["duration_us"]) == ("a", 3, 1_200_000_000)
    assert abs(r["cx"] - 0.5) < 1e-6 and r["cy"] == 0.0
    assert r["t_start"] == t(0) and r["t_end"] == t(1200)


def test_track_interpolate_max_ticks_breaks_dirty_gaps(spark):
    """A multi-year gap with a small step is a track break, not a job
    abort: the capped segment emits nothing, neighbors still emit."""
    import datetime as dt

    from geomesa_spark.operators.route import track_interpolate

    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
    rows = [("a", t(0), 0.0, 0.0, 1),
            ("a", t(100), 10.0, 10.0, 2),        # 4 ticks at step 25
            ("a", t(200_000_100), 99.0, 99.0, 3)]  # ~8e6 ticks -> capped
    df = spark.createDataFrame(
        rows, "track string, ts timestamp_ntz, x double, y double, oid int")
    out = track_interpolate(df, "track", "ts", "x", "y", step_s=25,
                            order_col="oid", max_ticks=1000)
    assert out.count() == 4
    full = track_interpolate(df.limit(2), "track", "ts", "x", "y",
                             step_s=25, order_col="oid", max_ticks=None)
    assert full.count() == 4


class TestGeofence:
    """geofence_sequence: visit intervals per (track, zone)."""

    def _zones(self, spark):
        from tests.test_spatial_join import _rect_wkb

        return spark.createDataFrame(
            [(1, _rect_wkb(0.5, -1.0, 3.5, 1.0)),
             (2, _rect_wkb(4.5, -1.0, 7.5, 1.0))],
            "zone int, geom binary")

    def _fixes(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
        lons = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 2.0]
        rows = [("u1", t(60 * i), lon, 0.0, i) for i, lon in enumerate(lons)]
        rows += [("u2", t(0), 1.0, 0.0, 0), ("u2", t(60), 6.0, 0.0, 1)]
        return spark.createDataFrame(
            rows, "track string, ts timestamp_ntz, x double, y double, oid int")

    def test_visits(self, spark):
        from geomesa_spark.operators.route import geofence_sequence

        out = geofence_sequence(self._fixes(spark), self._zones(spark),
                                "track", "ts", "x", "y",
                                zone_id="zone", order_col="oid")
        got = {(r["track"], r["zone"], r["visit"]):
               (r["enter_seq"], r["exit_seq"], r["n_fixes"], r["dwell_us"])
               for r in out.collect()}
        assert got == {
            ("u1", 1, 1): (2, 4, 3, 120_000_000),
            ("u1", 1, 2): (10, 10, 1, 0),
            ("u1", 2, 1): (6, 8, 3, 120_000_000),
            ("u2", 1, 1): (1, 1, 1, 0),
            ("u2", 2, 1): (2, 2, 1, 0),
        }

    def test_boundary_is_inside(self, spark):
        """st_intersects semantics: a fix exactly on the fence counts."""
        import datetime as dt

        from geomesa_spark.operators.route import geofence_sequence

        fixes = spark.createDataFrame(
            [("u", dt.datetime(2024, 1, 1), 0.5, 0.0, 0)],
            "track string, ts timestamp_ntz, x double, y double, oid int")
        out = geofence_sequence(fixes, self._zones(spark),
                                "track", "ts", "x", "y",
                                zone_id="zone", order_col="oid").collect()
        assert len(out) == 1 and out[0]["zone"] == 1


class TestODMatrix:
    def test_flows(self, spark):
        import datetime as dt

        from geomesa_spark.operators.route import od_matrix
        from tests.test_spatial_join import _rect_wkb

        zones = spark.createDataFrame(
            [(1, _rect_wkb(0.5, -1.0, 3.5, 1.0)),
             (2, _rect_wkb(4.5, -1.0, 7.5, 1.0))],
            "zone int, geom binary")
        t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)
        # u1: zone 1 -> zone 2 -> zone 1 (round trip); u2: 1 -> 2
        lons_u1 = [1.0, 4.0, 5.0, 4.0, 2.0]
        rows = [("u1", t(60 * i), lon, 0.0, i) for i, lon in enumerate(lons_u1)]
        rows += [("u2", t(0), 1.0, 0.0, 0), ("u2", t(60), 6.0, 0.0, 1)]
        fixes = spark.createDataFrame(
            rows, "track string, ts timestamp_ntz, x double, y double, oid int")
        out = od_matrix(fixes, zones, "track", "ts", "x", "y",
                        zone_id="zone", order_col="oid")
        got = {(r["from_zone"], r["to_zone"]): r["n_trips"]
               for r in out.collect()}
        assert got == {(1, 2): 2, (2, 1): 1}


def test_zone_paths_known_answer(spark):
    """Hand-built visit sequence: k=3 paths counted across tracks; k=2
    reproduces od_matrix edges."""
    from geomesa_spark.geom.wkb import Polygon, wkb_write
    import datetime as dt
    import numpy as np

    from geomesa_spark.operators.route import od_matrix, zone_paths

    def rect(x0, y0, x1, y1):
        ring = np.array([[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]])
        return wkb_write(Polygon(ring))

    zones = spark.createDataFrame(
        [(1, rect(0, 0, 10, 10)), (2, rect(20, 0, 30, 10)),
         (3, rect(40, 0, 50, 10))], "zone_id long, geom binary")

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    # track 7: zones 1 -> 2 -> 3 -> 1 ; track 8: 1 -> 2 -> 3
    fixes = [(7, ts(0), 5.0, 5.0, 1), (7, ts(1), 25.0, 5.0, 2),
             (7, ts(2), 45.0, 5.0, 3), (7, ts(3), 5.0, 5.0, 4),
             (8, ts(0), 5.0, 5.0, 5), (8, ts(1), 25.0, 5.0, 6),
             (8, ts(2), 45.0, 5.0, 7)]
    df = spark.createDataFrame(
        fixes, "tid long, ts timestamp, lon double, lat double, eid long")
    got = {(r.z1, r.z2, r.z3): r.n_paths
           for r in zone_paths(df, zones, "tid", "ts", "lon", "lat", k=3,
                               order_col="eid").collect()}
    assert got == {(1, 2, 3): 2, (2, 3, 1): 1}

    got2 = {(r.z1, r.z2): r.n_paths
            for r in zone_paths(df, zones, "tid", "ts", "lon", "lat", k=2,
                                order_col="eid").collect()}
    od = {(r.from_zone, r.to_zone): r.n_trips
          for r in od_matrix(df, zones, "tid", "ts", "lon", "lat",
                             order_col="eid").collect()}
    assert got2 == od

    import pytest as _pt
    with _pt.raises(ValueError):
        zone_paths(df, zones, "tid", "ts", "lon", "lat", k=1)
