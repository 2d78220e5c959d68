"""SQL-surface tests: the reference SparkSQL relationship suite run through
our registered UDFs (SparkSQLSpatialRelationshipsTest.scala:88-396 style —
direct st_* calls in spark.sql, truth tables, null-in/null-out)."""

import pytest

BOX_REF = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"
LINE_REF = "LINESTRING(0 10, 0 -10)"


def q1(spark, sql):
    return spark.sql(sql).collect()[0][0]


def direct(spark, f, g1, g2):
    return q1(spark, f"select {f}(st_geomFromWKT('{g1}'), st_geomFromWKT('{g2}'))")


@pytest.mark.usefixtures("spark")
class TestRelationsSQL:
    def test_contains_direct(self, spark):
        assert direct(spark, "st_contains", BOX_REF, "POINT(5 5)") is True
        assert direct(spark, "st_contains", BOX_REF, "POINT(0 5)") is False
        assert direct(spark, "st_contains", BOX_REF, "POINT(0 0)") is False
        assert direct(spark, "st_contains", BOX_REF, "POINT(-5 0)") is False
        assert direct(spark, "st_contains", BOX_REF, "POLYGON((0 1, 0 2, 1 2, 1 1, 0 1))") is True
        assert direct(spark, "st_contains", BOX_REF, "POLYGON((-1 1, -1 2, 1 2, 1 1, -1 1))") is False

    def test_covers_touches(self, spark):
        assert direct(spark, "st_covers", BOX_REF, "POINT(0 5)") is True
        assert direct(spark, "st_covers", BOX_REF, "POINT(0 0)") is True
        assert direct(spark, "st_touches", BOX_REF, "POLYGON((-1 1, -1 2, 0 2, 0 1, -1 1))") is True
        assert direct(spark, "st_touches", BOX_REF, "POLYGON((0 1, 0 2, 1 2, 1 1, 0 1))") is False

    def test_crosses_intersects(self, spark):
        assert direct(spark, "st_crosses", LINE_REF, "LINESTRING(-1 0, 1 0)") is True
        assert direct(spark, "st_crosses", LINE_REF, "LINESTRING(0 0, 1 0)") is False
        assert direct(spark, "st_intersects", BOX_REF, "POLYGON((-1 -1, -1 0, 0 0, 0 -1, -1 -1))") is True
        assert direct(spark, "st_disjoint", BOX_REF, "POLYGON((-2 1, -2 2, -1 2, -1 1, -2 1))") is True

    def test_equals(self, spark):
        assert direct(spark, "st_equals", "LINESTRING(0 0, 1 1)", "LINESTRING(1 1, 0 0)") is True
        assert direct(spark, "st_equals", BOX_REF, "POLYGON((10 0, 10 10, 0 10, 0 0, 10 0))") is True

    def test_relate(self, spark):
        m = direct(spark, "st_relate", "LINESTRING(1 2, 3 4)", "LINESTRING(5 6, 7 8)")
        assert m == "FF1FF0102"
        r = q1(spark, "select st_relateBool(st_geomFromWKT('LINESTRING(1 2, 3 4)'), "
                      "st_geomFromWKT('LINESTRING(5 6, 7 8)'), 'FF*FF****')")
        assert r is True

    def test_null_in_null_out(self, spark):
        for f in ("st_contains", "st_covers", "st_crosses", "st_disjoint", "st_equals",
                  "st_intersects", "st_overlaps", "st_touches", "st_within", "st_relate"):
            assert q1(spark, f"select {f}(null, null)") is None
        assert q1(spark, "select st_area(null)") is None
        assert q1(spark, "select st_centroid(null)") is None
        assert q1(spark, "select st_distance(null, null)") is None

    def test_truth_table_where_clause(self, spark):
        rows = spark.sql(
            "with t as (select name, st_geomFromWKT(wkt) as geom from values "
            "('int', 'POINT(5 5)'), ('edge', 'POINT(0 5)'), "
            "('corner', 'POINT(0 0)'), ('ext', 'POINT(-5 0)') as v(name, wkt)) "
            f"select name from t where st_covers(st_geomFromWKT('{BOX_REF}'), geom)"
        ).collect()
        assert sorted(r.name for r in rows) == ["corner", "edge", "int"]


class TestMeasuresSQL:
    def test_area_length(self, spark):
        assert q1(spark, f"select st_area(st_geomFromWKT('{BOX_REF}'))") == 100.0
        assert q1(spark, f"select st_length(st_geomFromWKT('{BOX_REF}'))") == 40.0
        assert q1(spark, "select st_length(st_geomFromWKT('LINESTRING(0 0, 10 0)'))") == 10.0

    def test_centroid_closestpoint(self, spark):
        wkt = q1(spark, f"select st_asText(st_centroid(st_geomFromWKT('{BOX_REF}')))")
        assert wkt == "POINT (5 5)"
        wkt = q1(spark, f"select st_asText(st_closestPoint(st_geomFromWKT('{BOX_REF}'), "
                        "st_geomFromWKT('POINT(15 5)')))")
        assert wkt == "POINT (10 5)"

    def test_distances(self, spark):
        assert q1(spark, "select st_distance(st_geomFromWKT('POINT(0 0)'), st_geomFromWKT('POINT(10 0)'))") == 10.0
        d = q1(spark, "select st_distanceSpheroid(st_geomFromWKT('POINT(0 0)'), st_geomFromWKT('POINT(10 0)'))")
        assert abs(d - 1113194.0) <= 1.0

    def test_makepoint_xy(self, spark):
        assert q1(spark, "select st_x(st_makePoint(1.5, 2.5))") == 1.5
        assert q1(spark, "select st_y(st_point(1.5, 2.5))") == 2.5
        assert q1(spark, "select st_x(st_geomFromWKT('LINESTRING(0 0, 1 1)'))") is None

    def test_geohash(self, spark):
        gh = q1(spark, "select st_geoHash(st_makePoint(-5.6, 42.6), 25)")
        assert gh == "ezs42"

    def test_constructors(self, spark):
        assert q1(spark, "select st_asText(st_makeBBOX(0, 0, 2, 2))") == \
            "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
        assert q1(spark, "select st_asText(st_geomFromGeoJSON('{\"type\":\"Point\",\"coordinates\":[1,2]}'))") == \
            "POINT (1 2)"

    def test_accessors(self, spark):
        assert q1(spark, f"select st_geometryType(st_geomFromWKT('{BOX_REF}'))") == "Polygon"
        assert q1(spark, f"select st_dimension(st_geomFromWKT('{BOX_REF}'))") == 2
        assert q1(spark, f"select st_numPoints(st_geomFromWKT('{BOX_REF}'))") == 5
        assert q1(spark, "select st_asText(st_pointN(st_geomFromWKT('LINESTRING(0 0, 1 1, 2 2)'), -1))") == \
            "POINT (2 2)"
        assert q1(spark, "select st_isClosed(st_geomFromWKT('LINESTRING(0 0, 1 1)'))") is False

    def test_dwithin(self, spark):
        # ~111 km per degree at the equator
        assert q1(spark, "select st_dwithin(st_makePoint(0,0), st_makePoint(1,0), 120000)") is True
        assert q1(spark, "select st_dwithin(st_makePoint(0,0), st_makePoint(1,0), 100000)") is False

    def test_buffer_point(self, spark):
        # 100km buffer around (0,0) must contain a point 50km east
        r = q1(spark, "select st_contains(st_bufferPoint(st_makePoint(0,0), 100000), "
                      "st_makePoint(0.449, 0))")
        assert r is True

    def test_aggregate_distance_window(self, spark):
        # pattern from SparkSQLDataTest.scala:649-667
        df = spark.sql(
            "select st_aggregateDistanceSphere(array(st_makePoint(0,0), st_makePoint(1,0))) as d")
        d = df.collect()[0].d
        assert abs(d - 111195.0) < 100


class TestUtmTransform:
    """UTM (Krueger series) against independent oracles: numeric meridian
    -arc integration, exact anchor identities, and round-trips."""

    def test_central_meridian_anchors(self):
        import numpy as np

        from geomesa_spark.functions.registry import _utm_forward

        # on the central meridian of zone 33 (15 E): E = 500000 exactly
        c = _utm_forward(np.array([[15.0, 45.0]]), 33, False)
        assert abs(c[0, 0] - 500_000.0) < 1e-6
        # equator, central meridian: N = 0 (north), 10e6 (south)
        c = _utm_forward(np.array([[15.0, 0.0]]), 33, False)
        assert abs(c[0, 1]) < 1e-6
        c = _utm_forward(np.array([[15.0, 0.0]]), 33, True)
        assert abs(c[0, 1] - 10_000_000.0) < 1e-6

    def test_northing_equals_k0_meridian_arc(self):
        """N on the central meridian == 0.9996 * meridian arc length,
        the arc computed by brute-force numeric integration of
        a(1-e^2)/(1-e^2 sin^2 phi)^{3/2} — a fully independent oracle."""
        import numpy as np

        from geomesa_spark.functions.registry import (
            _WGS84_A, _WGS84_F, _utm_forward)

        e2 = _WGS84_F * (2 - _WGS84_F)
        for lat in (12.0, 45.0, 68.0):
            phi = np.linspace(0.0, np.radians(lat), 2_000_001)
            m = _WGS84_A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
            arc = np.trapz(m, phi)
            n = _utm_forward(np.array([[15.0, lat]]), 33, False)[0, 1]
            assert abs(n - 0.9996 * arc) < 0.01, (lat, n, 0.9996 * arc)

    def test_roundtrip(self):
        import numpy as np

        from geomesa_spark.functions.registry import _utm_forward, _utm_inverse

        rng = np.random.RandomState(7)
        lon = 15.0 + rng.uniform(-3, 3, 200)        # zone 33: 12..18 E
        lat = rng.uniform(-79, 83, 200)
        c = np.column_stack([lon, lat])
        for south in (False, True):
            back = _utm_inverse(_utm_forward(c, 33, south), 33, south)
            assert np.abs(back - c).max() < 1e-7  # ~1 cm: order-n^3 truncation

    def test_sql_surface(self, spark):
        from geomesa_spark.functions import register_functions

        register_functions(spark)
        row = spark.sql("""
            SELECT st_x(st_transform(st_makePoint(15.0, 45.0),
                                     'EPSG:4326', 'EPSG:32633')) AS e,
                   st_y(st_transform(st_transform(st_makePoint(14.2, 48.3),
                                     'EPSG:4326', 'EPSG:32633'),
                                     'EPSG:32633', 'EPSG:4326')) AS lat_rt
        """).collect()[0]
        assert abs(row.e - 500_000.0) < 1e-3
        assert abs(row.lat_rt - 48.3) < 1e-6  # round-trip


def test_utm_crs_validation():
    import pytest

    from geomesa_spark.functions.registry import _parse_crs, _transform
    from geomesa_spark.geom.wkb import Point

    assert _parse_crs("utm:33n") == ("utm", 33, False)
    assert _parse_crs("utm:99n") == (None, None, None)   # invalid zone
    assert _parse_crs("EPSG:326ab") == (None, None, None)
    with pytest.raises(ValueError, match="st_transform supports"):
        _transform(Point(0.0, 0.0), "EPSG:4326", "utm:99n")


class TestPolarLaeaTransform:
    """Polar stereographic + LAEA against independent oracles: the EPSG
    GN7-2 worked example, scale-factor identities by finite difference,
    the ellipsoidal equal-area Jacobian, and round-trips."""

    def test_ups_epsg_worked_example(self):
        """EPSG Guidance Note 7-2 §3.2.4 variant-A example (UPS North):
        73 N, 44 E -> E 3320416.75, N 632668.43 (published to cm)."""
        import numpy as np

        from geomesa_spark.geom import crs as C

        out = C.ps_forward(np.array([[44.0, 73.0]]), **C.PS_CRS["5041"])
        assert abs(out[0, 0] - 3320416.75) < 0.01
        assert abs(out[0, 1] - 632668.43) < 0.01

    def test_ups_pole_is_false_origin(self):
        import numpy as np

        from geomesa_spark.geom import crs as C

        n = C.ps_forward(np.array([[123.0, 90.0]]), **C.PS_CRS["5041"])
        s = C.ps_forward(np.array([[-77.0, -90.0]]), **C.PS_CRS["5042"])
        assert np.abs(n - 2_000_000.0).max() < 1e-6
        assert np.abs(s - 2_000_000.0).max() < 1e-6

    def test_variant_b_scale_true_at_lat_ts(self):
        """EPSG:3413 (lat_ts 70N) / 3976 (71S): the meridian-direction
        scale factor at the standard parallel is 1 (finite difference vs
        the ellipsoidal meridian radius M(phi))."""
        import numpy as np

        from geomesa_spark.geom import crs as C

        a, e2 = C._A, C._E2
        h = 1e-6
        for code, lat in (("3413", 70.0), ("3976", -71.0)):
            kw = C.PS_CRS[code]
            p = np.array([[kw["lon0"], lat], [kw["lon0"], lat + h]])
            q = C.ps_forward(p, **kw)
            dproj = float(np.hypot(q[1, 0] - q[0, 0], q[1, 1] - q[0, 1]))
            phi = np.radians(lat)
            m = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
            assert abs(dproj / (m * np.radians(h)) - 1.0) < 1e-6
            assert abs(q[0, 0] - kw["fe"]) < 1e-6  # central meridian -> E = FE

    def test_ps_roundtrip_all_codes(self):
        import numpy as np

        from geomesa_spark.geom import crs as C

        rng = np.random.RandomState(11)
        for code, kw in C.PS_CRS.items():
            lat = rng.uniform(60, 89.99, 300)
            if kw["south"]:
                lat = -lat
            pts = np.column_stack([rng.uniform(-180, 180, 300), lat])
            back = C.ps_inverse(C.ps_forward(pts, **kw), **kw)
            dlon = (back[:, 0] - pts[:, 0] + 180.0) % 360.0 - 180.0
            assert np.abs(dlon).max() < 1e-9, code
            assert np.abs(back[:, 1] - pts[:, 1]).max() < 1e-8, code

    def test_laea_equal_area_jacobian(self):
        """EPSG:3035 is equal-area: |det J(E,N / lon,lat)| equals the
        ellipsoidal area element a^2 (1-e^2) cos(phi) / (1-e^2 sin^2 phi)^2
        everywhere (finite-difference Jacobian, fully independent)."""
        import numpy as np

        from geomesa_spark.geom import crs as C

        kw = C.LAEA_CRS["3035"]
        a, e2 = C._A, C._E2
        h = 1e-6
        for lon0, lat0 in ((10.0, 50.0), (25.0, 40.0), (-8.0, 65.0), (31.0, 34.5)):
            p = np.array([[lon0, lat0], [lon0 + h, lat0], [lon0, lat0 + h]])
            q = C.laea_forward(p, **kw)
            j = np.array([[(q[1, 0] - q[0, 0]), (q[2, 0] - q[0, 0])],
                          [(q[1, 1] - q[0, 1]), (q[2, 1] - q[0, 1])]]) / np.radians(h)
            det = abs(float(np.linalg.det(j)))
            phi = np.radians(lat0)
            want = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
            assert abs(det / want - 1.0) < 1e-5, (lon0, lat0)

    def test_laea_center_and_roundtrip(self):
        import numpy as np

        from geomesa_spark.geom import crs as C

        kw = C.LAEA_CRS["3035"]
        c = C.laea_forward(np.array([[10.0, 52.0]]), **kw)
        assert abs(c[0, 0] - 4_321_000.0) < 1e-6   # projection center ->
        assert abs(c[0, 1] - 3_210_000.0) < 1e-6   # false origin exactly
        rng = np.random.RandomState(3)
        pts = np.column_stack([rng.uniform(-15, 45, 300),
                               rng.uniform(28, 72, 300)])
        back = C.laea_inverse(C.laea_forward(pts, **kw), **kw)
        assert np.abs(back - pts).max() < 1e-9

    def test_composed_pair_routes_through_4326(self):
        """3857 -> 3035 == (3857 -> 4326) then (4326 -> 3035)."""
        from geomesa_spark.functions.registry import _transform
        from geomesa_spark.geom.wkb import Point

        p = Point(1_113_194.9079327357, 6_446_275.841017158)  # ~ (10 E, 50 N)
        direct = _transform(p, "EPSG:3857", "EPSG:3035")
        via = _transform(_transform(p, "EPSG:3857", "EPSG:4326"),
                         "EPSG:4326", "EPSG:3035")
        assert abs(direct.x - via.x) < 1e-9 and abs(direct.y - via.y) < 1e-9
        # and the result is the right place: ~ (10 E, 50 N) in 3035
        back = _transform(direct, "EPSG:3035", "EPSG:4326")
        assert abs(back.x - 10.0) < 1e-6 and abs(back.y - 50.0) < 1e-6

    def test_sql_surface_polar(self, spark):
        from geomesa_spark.functions import register_functions

        register_functions(spark)
        row = spark.sql("""
            SELECT st_x(st_transform(st_makePoint(44.0, 73.0),
                                     'EPSG:4326', 'EPSG:5041')) AS e,
                   st_y(st_transform(st_transform(st_makePoint(19.5, 68.1),
                                     'EPSG:4326', 'EPSG:3413'),
                                     'EPSG:3413', 'EPSG:4326')) AS lat_rt
        """).collect()[0]
        assert abs(row.e - 3320416.75) < 0.01
        assert abs(row.lat_rt - 68.1) < 1e-8

    def test_inverse_longitudes_stay_in_range(self):
        """Inverse projections with a nonzero lon0 must wrap: EPSG:3413
        (lon0=-45) previously returned lon -190 for true lon 170."""
        import numpy as np

        from geomesa_spark.geom import crs as C

        kw = C.PS_CRS["3413"]
        pts = np.column_stack([np.array([170.0, -170.0, 179.99, -179.99]),
                               np.full(4, 75.0)])
        back = C.ps_inverse(C.ps_forward(pts, **kw), **kw)
        assert (back[:, 0] >= -180.0).all() and (back[:, 0] < 180.0).all()
        dl = (back[:, 0] - pts[:, 0] + 180.0) % 360.0 - 180.0
        assert np.abs(dl).max() < 1e-9
        kw2 = C.LAEA_CRS["3035"]
        pts2 = np.column_stack([np.array([-175.0, 175.0]), np.full(2, 55.0)])
        back2 = C.laea_inverse(C.laea_forward(pts2, **kw2), **kw2)
        assert (back2[:, 0] >= -180.0).all() and (back2[:, 0] < 180.0).all()


def test_geohash_bit_precision(spark):
    """st_geomFromGeoHash precision is bit-granular: 22 bits is exactly
    2x wider in longitude than 23 bits (the next bit splits x)."""
    r = spark.sql(
        "select st_envelope(st_geomFromGeoHash('9q8yyk8y', 22)) as a,"
        "       st_envelope(st_geomFromGeoHash('9q8yyk8y', 23)) as b").collect()[0]
    from geomesa_spark.geom.wkb import wkb_read

    ea, eb = wkb_read(bytes(r["a"])).envelope(), wkb_read(bytes(r["b"])).envelope()
    assert abs((ea[2] - ea[0]) - 2 * (eb[2] - eb[0])) < 1e-12
    assert (ea[3] - ea[1]) == (eb[3] - eb[1])          # lat unchanged
    assert eb[0] >= ea[0] and eb[2] <= ea[2]           # nested


def test_dwithin_null_distance_propagates(spark):
    """Null meters -> null result even when other rows in the Arrow
    batch carry a constant distance (the vectorized fast path)."""
    df = spark.createDataFrame(
        [(1, 1000.0), (2, None)], "id long, m double")
    df.createOrReplaceTempView("dwnull")
    rows = {r["id"]: r["ok"] for r in spark.sql(
        "select id, st_dwithin(st_makePoint(0,0), st_makePoint(0.001,0), m) as ok "
        "from dwnull").collect()}
    assert rows[1] is True and rows[2] is None


def test_wkb_ewkb_srid_and_zm(spark):
    """EWKB SRID payload is skipped (coordinates parse correctly);
    Z/M-flagged EWKB raises instead of silently misparsing."""
    import struct

    import pytest as _pytest

    from geomesa_spark.geom.wkb import wkb_read

    ewkb = struct.pack("<BIi2d", 1, 0x20000001, 4326, 12.5, -3.25)
    g = wkb_read(ewkb)
    assert (g.x, g.y) == (12.5, -3.25)
    zwkb = struct.pack("<BI3d", 1, 0x80000001, 1.0, 2.0, 3.0)
    with _pytest.raises(NotImplementedError):
        wkb_read(zwkb)


def test_is_simple_multiline_endpoint_touch(spark):
    """Elements touching at mutual endpoints are simple (SFS boundary
    rule); interior contact and closed-element contact are not."""
    assert q1(spark, "select st_isSimple(st_geomFromWKT("
              "'MULTILINESTRING((0 0, 1 1), (1 1, 2 0))'))") is True
    assert q1(spark, "select st_isSimple(st_geomFromWKT("
              "'MULTILINESTRING((0 0, 2 2), (1 1, 2 0))'))") is False
    # closed element: empty boundary, so endpoint contact is NOT allowed
    assert q1(spark, "select st_isSimple(st_geomFromWKT("
              "'MULTILINESTRING((0 0, 1 0, 1 1, 0 0), (0 0, -1 -1))'))") is False


def test_antimeridian_safe_preserves_shape(spark):
    """IDL split keeps the actual polygon shape: the two pieces' area
    equals the original triangle's area (not its envelope's)."""
    from geomesa_spark.geom.measures import ring_area
    from geomesa_spark.geom.wkb import MultiPolygon, Polygon, wkb_read

    wkb = q1(spark, "select st_antimeridianSafeGeom(st_geomFromWKT("
             "'POLYGON((170 0, 190 10, 190 0, 170 0))'))")
    g = wkb_read(bytes(wkb))
    assert isinstance(g, MultiPolygon) and len(g.geoms) == 2
    area = sum(abs(ring_area(p.shell)) for p in g.geoms)
    assert abs(area - 100.0) < 1e-9        # triangle area = 20*10/2
    for p in g.geoms:
        x0, _, x1, _ = p.envelope()
        assert -180.0 <= x0 <= x1 <= 180.0
