"""Geometry kernel tests.

Truth tables vendored from the reference SparkSQL relationship suite
(geomesa-spark-sql/src/test/.../SparkSQLSpatialRelationshipsTest.scala:31-396):
the exact WKT fixtures and expected name-sets per predicate, plus measures.
"""

import numpy as np
import pytest

from geomesa_spark.geom import (
    LineString,
    Point,
    Polygon,
    area,
    centroid,
    closest_point,
    contains,
    covers,
    crosses,
    disjoint,
    distance,
    distance_sphere,
    distance_spheroid,
    equals,
    intersects,
    length,
    length_sphere,
    overlaps,
    pip_rings,
    points_in_polygon,
    relate,
    relate_bool,
    touches,
    within,
    wkb_read,
    wkb_write,
    wkt_read,
    wkt_write,
)

BOX_REF = "POLYGON((0  0,  0 10, 10 10, 10  0,  0  0))"
LINE_REF = "LINESTRING(0 10, 0 -10)"

POINTS = {
    "int": "POINT(5 5)",
    "edge": "POINT(0 5)",
    "corner": "POINT(0 0)",
    "ext": "POINT(-5 0)",
}
LINES = {
    "touches": "LINESTRING(0 0, 1 0)",
    "crosses": "LINESTRING(-1 0, 1 0)",
    "disjoint": "LINESTRING(1 0, 2 0)",
}
BOXES = {
    "int": "POLYGON(( 1  1,  1  2,  2  2,  2  1,  1  1))",
    "intEdge": "POLYGON(( 0  1,  0  2,  1  2,  1  1,  0  1))",
    "overlap": "POLYGON((-1  1, -1  2,  1  2,  1  1, -1  1))",
    "extEdge": "POLYGON((-1  1, -1  2,  0  2,  0  1, -1  1))",
    "ext": "POLYGON((-2  1, -2  2, -1  2, -1  1, -2  1))",
    "corner": "POLYGON((-1 -1, -1  0,  0  0,  0 -1, -1 -1))",
}


def g(wkt):
    return wkt_read(wkt)


def names_matching(pred, ref_wkt, table, flip=False):
    ref = g(ref_wkt)
    out = []
    for name, wkt in table.items():
        other = g(wkt)
        ok = pred(other, ref) if flip else pred(ref, other)
        if ok:
            out.append(name)
    return sorted(out)


class TestWkbWkt:
    @pytest.mark.parametrize("wkt", [
        "POINT (5 5)",
        "LINESTRING (0 10, 0 -10)",
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))",
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
        "MULTIPOINT ((1 1), (2 2))",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 6, 6 6, 6 5, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))",
    ])
    def test_roundtrip(self, wkt):
        geom = wkt_read(wkt)
        assert wkt_write(wkb_read(wkb_write(geom))) == wkt_write(geom)


class TestDE9IMTruthTables:
    def test_contains(self):
        assert names_matching(contains, BOX_REF, POINTS) == ["int"]
        assert names_matching(contains, BOX_REF, BOXES) == ["int", "intEdge"]

    def test_covers(self):
        assert names_matching(covers, BOX_REF, POINTS) == ["corner", "edge", "int"]
        assert names_matching(covers, BOX_REF, BOXES) == ["int", "intEdge"]

    def test_crosses(self):
        assert names_matching(crosses, LINE_REF, LINES) == ["crosses"]

    def test_disjoint(self):
        assert names_matching(disjoint, BOX_REF, POINTS) == ["ext"]
        assert names_matching(disjoint, BOX_REF, BOXES) == ["ext"]

    def test_equals(self):
        assert equals(g("POINT(0 0)"), g(POINTS["corner"]))
        assert not equals(g("POINT(0 0)"), g(POINTS["edge"]))
        assert equals(g("LINESTRING(0 0, 1 1)"), g("LINESTRING(1 1, 0 0)"))
        assert equals(g(BOX_REF), g("POLYGON((10 0, 10 10, 0 10, 0 0, 10 0))"))

    def test_intersects(self):
        assert names_matching(intersects, BOX_REF, POINTS) == ["corner", "edge", "int"]
        assert names_matching(intersects, BOX_REF, BOXES) == sorted(
            ["int", "intEdge", "overlap", "extEdge", "corner"])

    def test_overlaps(self):
        assert names_matching(overlaps, BOX_REF, POINTS) == []
        assert names_matching(overlaps, BOX_REF, BOXES) == ["overlap"]

    def test_touches(self):
        assert names_matching(touches, BOX_REF, POINTS) == ["corner", "edge"]
        assert names_matching(touches, BOX_REF, BOXES) == ["corner", "extEdge"]
        assert touches(g(LINE_REF), g(LINES["touches"]))
        assert not touches(g(LINE_REF), g(LINES["crosses"]))
        assert not touches(g(LINE_REF), g(LINES["disjoint"]))

    def test_within(self):
        assert names_matching(within, BOX_REF, POINTS, flip=True) == ["int"]
        assert names_matching(within, BOX_REF, BOXES, flip=True) == ["int", "intEdge"]

    def test_relate(self):
        m = relate(g("LINESTRING(1 2, 3 4)"), g("LINESTRING(5 6, 7 8)"))
        assert m == "FF1FF0102"
        assert relate_bool(g("LINESTRING(1 2, 3 4)"), g("LINESTRING(5 6, 7 8)"), "FF*FF****")


class TestMeasures:
    def test_area(self):
        assert area(g(BOX_REF)) == 100.0
        assert area(g("POLYGON((0 50, 0 60, 10 60, 10 50, 0 50))")) == 100.0

    def test_centroid(self):
        c = centroid(g(BOX_REF))
        assert (c.x, c.y) == (5.0, 5.0)

    def test_closest_point(self):
        cp = closest_point(g(BOX_REF), g("POINT(15 5)"))
        assert (cp.x, cp.y) == (10.0, 5.0)

    def test_distance(self):
        assert distance(g("POINT(0 0)"), g("POINT(10 0)")) == 10.0
        assert distance(g(BOX_REF), g("POINT(15 5)")) == 5.0
        # intersecting -> 0
        assert distance(g(BOX_REF), g("POINT(5 5)")) == 0.0

    def test_distance_spheroid(self):
        d = distance_spheroid(g("POINT(0 0)"), g("POINT(10 0)"))
        assert abs(d - 1113194.0) <= 1.0  # reference asserts +-1 m

    def test_distance_sphere(self):
        d = distance_sphere(g("POINT(0 0)"), g("POINT(10 0)"))
        # haversine on mean sphere: 10 deg at equator
        assert abs(d - 10 * np.pi / 180 * 6371008.7714) < 1.0

    def test_length(self):
        assert length(g("LINESTRING(0 0, 10 0)")) == 10.0
        assert length(g(BOX_REF)) == 40.0  # perimeter

    def test_length_sphere(self):
        l = length_sphere(g("LINESTRING(0 0, 10 0)"))
        assert abs(l - 10 * np.pi / 180 * 6371008.7714) < 1.0


class TestVectorizedPIP:
    def test_matches_scalar_relate(self):
        rng = np.random.RandomState(7)
        shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=float)
        px = rng.uniform(-5, 15, 500)
        py = rng.uniform(-5, 15, 500)
        loc = pip_rings(px, py, [shell])
        inside = (px > 0) & (px < 10) & (py > 0) & (py < 10)
        on_b = ((px == 0) | (px == 10)) & (py >= 0) & (py <= 10)
        on_b |= ((py == 0) | (py == 10)) & (px >= 0) & (px <= 10)
        expected = np.where(on_b, 0, np.where(inside, 1, -1))
        assert np.array_equal(loc, expected)

    def test_boundary_and_holes(self):
        shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=float)
        hole = np.array([[4, 4], [4, 6], [6, 6], [6, 4], [4, 4]], dtype=float)
        px = np.array([5.0, 2.0, 4.0, 0.0, -1.0])
        py = np.array([5.0, 2.0, 5.0, 5.0, 5.0])
        loc = pip_rings(px, py, [shell, hole])
        # center is inside the hole -> outside; (4,5) on hole edge -> boundary
        assert list(loc) == [-1, 1, 0, 0, -1]

    def test_nonconvex(self):
        # L-shaped polygon
        shell = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], dtype=float)
        px = np.array([1.0, 3.0, 3.0, 1.0])
        py = np.array([1.0, 1.0, 3.0, 3.0])
        assert list(pip_rings(px, py, [shell])) == [1, 1, -1, 1]


class TestCoreReviewRegressions:
    """Fixes from the core-engine review pass."""

    def test_endpoint_touch_exact(self):
        """A line endpoint touching another line's interior must be
        touches, not crosses (ulp-exact cut points)."""
        from geomesa_spark.geom import kernels as K
        from geomesa_spark.geom.wkb import LineString
        import numpy as np

        a = LineString(np.array([[0.1, 0.0], [0.3, 0.2]]))
        b = LineString(np.array([[0.2, 0.2], [0.4, 0.2]]))
        assert K.touches(a, b)
        assert not K.crosses(a, b)
        # symmetric: b's endpoint on a's interior
        c = LineString(np.array([[0.2, 0.1], [0.7, 0.1]]))
        d = LineString(np.array([[0.3, 0.1], [0.3, 0.5]]))
        assert K.touches(c, d) and not K.crosses(c, d)

    def test_relate_rejects_geometry_collection(self):
        import numpy as np
        import pytest

        from geomesa_spark.geom import kernels as K
        from geomesa_spark.geom.wkb import GeometryCollection, Point, Polygon

        gc = GeometryCollection([Point(0.0, 0.0), Polygon(np.array(
            [[1, 1], [2, 1], [2, 2], [1, 1]], dtype=float))])
        with pytest.raises(ValueError, match="GeometryCollection"):
            K.relate(gc, Point(1.5, 1.2))

    def test_centroid_gc_with_multi_members(self):
        import numpy as np

        from geomesa_spark.geom.measures import centroid
        from geomesa_spark.geom.wkb import (
            GeometryCollection, MultiPoint, MultiPolygon, Point, Polygon)

        sq = Polygon(np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]],
                              dtype=float))
        c = centroid(GeometryCollection([MultiPolygon([sq])]))
        assert (c.x, c.y) == (1.0, 1.0)
        c2 = centroid(GeometryCollection([MultiPoint([Point(0.0, 0.0),
                                                      Point(4.0, 0.0)])]))
        assert (c2.x, c2.y) == (2.0, 0.0)

    def test_envelope_degenerate_is_linestring(self):
        import numpy as np

        from geomesa_spark.geom.measures import envelope_geom
        from geomesa_spark.geom.wkb import LineString

        e = envelope_geom(LineString(np.array([[0.0, 0.0], [5.0, 0.0]])))
        assert isinstance(e, LineString)

    def test_polygon_density_clipped_not_shifted(self):
        """Review regression: a polygon extending past xmax must fill its
        clipped columns, not wrap to column 0."""
        from geomesa_spark.operators.tiling import GridSnap, render_geometry
        from geomesa_spark.geom.wkb import Polygon
        import numpy as np

        grid = GridSnap(0.0, 0.0, 10.0, 10.0, 10, 10)
        poly = Polygon(np.array([[8, 2], [12, 2], [12, 4], [8, 4], [8, 2]],
                                dtype=float))
        cells = set(render_geometry(poly, grid))
        assert cells and all(i >= 8 for (i, j) in cells), cells
        assert not any(i <= 1 for (i, j) in cells)

    def test_line_density_clips_straddling_segment(self):
        """Review regression: a segment straddling the envelope renders
        its inside part (reference clips, does not drop)."""
        from geomesa_spark.operators.tiling import GridSnap, render_geometry
        from geomesa_spark.geom.wkb import LineString
        import numpy as np

        grid = GridSnap(0.0, 0.0, 10.0, 10.0, 10, 10)
        seg = LineString(np.array([[-5.0, 5.2], [5.0, 5.2]], dtype=float))
        cells = set(render_geometry(seg, grid))
        assert (0, 5) in cells and (4, 5) in cells
        assert all(j == 5 for (_, j) in cells)


def test_density_pyramid_levels(spark):
    from geomesa_spark.operators.tiling import density_pyramid

    base = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, 2.0), (2, 3, 4.0)],
        "i int, j int, weight double")
    got = {(r["level"], r["i"], r["j"]): r["weight"]
           for r in density_pyramid(base, levels=2).collect()}
    assert got == {
        (2, 0, 0): 1.0, (2, 1, 0): 2.0, (2, 2, 3): 4.0,   # base unchanged
        (1, 0, 0): 3.0, (1, 1, 1): 4.0,                    # halved once
        (0, 0, 0): 7.0,                                    # everything
    }


def test_vectorize_grid_runs(spark):
    """Raster -> vector dissolve: adjacent same-band cells in a row merge
    into one rectangle; band changes and column gaps split runs."""
    from geomesa_spark.operators.tiling import vectorize_grid

    # row j=0: cols 0,1 band 1 (w>=2), col 2 band 0, col 4 band 1 (gap at 3)
    # row j=1: cols 0-2 all band 2 (w>=5)
    base = spark.createDataFrame(
        [(0, 0, 2.0), (1, 0, 3.0), (2, 0, 1.0), (4, 0, 2.0),
         (0, 1, 5.0), (1, 1, 9.0), (2, 1, 6.0)],
        "i int, j int, weight double")
    out = vectorize_grid(base, 0.0, 0.0, 10.0, 4.0, 10, 4, [2.0, 5.0])
    got = {(r["band"], r["j"], r["i0"], r["i1"]):
           (r["ncells"], r["total_weight"], r["x0"], r["y0"], r["x1"], r["y1"])
           for r in out.collect()}
    assert got == {
        (1, 0, 0, 1): (2, 5.0, 0.0, 0.0, 2.0, 1.0),
        (0, 0, 2, 2): (1, 1.0, 2.0, 0.0, 3.0, 1.0),
        (1, 0, 4, 4): (1, 2.0, 4.0, 0.0, 5.0, 1.0),
        (2, 1, 0, 2): (3, 20.0, 0.0, 1.0, 3.0, 2.0),
    }


def test_hex_cells_center_roundtrip_and_partition(spark):
    """Every hex center assigns back to its own cell; jittered points
    within the in-radius stay in the cell (the axial-grid geometry)."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.tiling import hex_cell_cols, hex_center_cols

    s = 2.5
    cells = [(q, r) for q in range(-6, 7) for r in range(-6, 7)]
    df = spark.createDataFrame(cells, "q long, r long")
    lon, lat = hex_center_cols("q", "r", s)
    centered = df.select("q", "r", lon.alias("lon"), lat.alias("lat"))
    hq, hr = hex_cell_cols("lon", "lat", s)
    back = centered.select("q", "r", hq.alias("hq"), hr.alias("hr"))
    bad = back.filter((F.col("q") != F.col("hq")) | (F.col("r") != F.col("hr")))
    assert bad.count() == 0

    # jitter strictly inside the in-radius (sqrt(3)/2 * s) keeps the cell
    import math
    inr = math.sqrt(3) / 2 * s * 0.95
    for dx, dy in ((inr, 0.0), (-inr, 0.0), (0.0, inr * 0.99), (0.0, -inr * 0.99)):
        j = centered.select("q", "r", (F.col("lon") + dx).alias("lon"),
                            (F.col("lat") + dy).alias("lat"))
        hq2, hr2 = hex_cell_cols("lon", "lat", s)
        jb = j.select("q", "r", hq2.alias("hq"), hr2.alias("hr"))
        assert jb.filter((F.col("q") != F.col("hq"))
                         | (F.col("r") != F.col("hr"))).count() == 0


def test_zonal_stats_center_rule(spark):
    """Hand-built 4x4 grid over [0,4]x[0,4]: zone rect [0.9, 0.9, 3.1, 3.1]
    contains the four centers (1.5, 2.5) x (1.5, 2.5)."""
    from geomesa_spark.geom.wkb import wkb_write, wkt_read
    from geomesa_spark.operators.tiling import zonal_stats

    grid = spark.createDataFrame(
        [(i, j, float(10 * i + j)) for i in range(4) for j in range(4)],
        "i int, j int, weight double")
    wkb = wkb_write(wkt_read(
        "POLYGON ((0.9 0.9, 3.1 0.9, 3.1 3.1, 0.9 3.1, 0.9 0.9))"))
    zones = spark.createDataFrame([(7, bytearray(wkb))],
                                  "zone long, geom binary")
    got = zonal_stats(grid, zones, "zone", "geom",
                      0.0, 0.0, 4.0, 4.0, 4, 4).collect()
    assert len(got) == 1
    r = got[0]
    # centers (1.5,1.5),(1.5,2.5),(2.5,1.5),(2.5,2.5) -> cells (1,1),(1,2),(2,1),(2,2)
    want = [11.0, 12.0, 21.0, 22.0]
    assert r["n_cells"] == 4
    assert r["total"] == sum(want)
    assert r["mean_w"] == sum(want) / 4
    assert (r["min_w"], r["max_w"]) == (11.0, 22.0)
