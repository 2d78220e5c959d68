"""ECQL front-end: compile-and-evaluate truth cases against plain
pyspark-built expectations, bounds extraction semantics (AND intersect /
OR union / NOT unbounded / disjoint empty), and planner integration."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_spark.functions.cql import (
    CqlError, cql_filter, cql_to_sql, extract_bounds)


@pytest.fixture(scope="module")
def tbl(spark):
    from geomesa_spark.functions import register_functions

    register_functions(spark)
    rows = [(i,
             -10.0 + i,                       # lon: -10..9
             -5.0 + i * 0.5,                  # lat: -5..4.5
             ["alpha", "beta", "gamma"][i % 3],
             float(i * i),
             f"2020-01-{i + 1:02d}T00:00:00")
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "id long, lon double, lat double, kind string, v double, ts string")
    return (df.withColumn("ts", F.to_timestamp("ts"))
              .withColumn("geom", F.expr("st_makePoint(lon, lat)"))
              .cache())


def ids(df):
    return {r["id"] for r in df.select("id").collect()}


class TestCompile:
    def test_comparisons(self, tbl):
        assert ids(cql_filter(tbl, "v >= 100 AND v < 200")) == \
            ids(tbl.filter((F.col("v") >= 100) & (F.col("v") < 200)))
        assert ids(cql_filter(tbl, "kind = 'beta' OR kind = 'gamma'")) == \
            ids(tbl.filter(F.col("kind") != "alpha"))
        assert ids(cql_filter(tbl, "NOT (kind = 'beta')")) == \
            ids(tbl.filter(F.col("kind") != "beta"))
        assert ids(cql_filter(tbl, "v BETWEEN 4 AND 36")) == \
            ids(tbl.filter(F.col("v").between(4, 36)))
        assert ids(cql_filter(tbl, "kind IN ('alpha', 'gamma')")) == \
            ids(tbl.filter(F.col("kind").isin("alpha", "gamma")))
        assert ids(cql_filter(tbl, "kind LIKE 'al%'")) == \
            ids(tbl.filter(F.col("kind").startswith("al")))
        assert ids(cql_filter(tbl, "kind ILIKE 'AL%'")) == \
            ids(tbl.filter(F.col("kind").startswith("al")))
        assert ids(cql_filter(tbl, "kind IS NOT NULL")) == ids(tbl)
        assert ids(cql_filter(tbl, "EXCLUDE")) == set()
        assert ids(cql_filter(tbl, "INCLUDE")) == ids(tbl)

    def test_string_escape(self, tbl):
        assert ids(cql_filter(tbl, "kind = 'it''s'")) == set()

    def test_temporal(self, tbl):
        got = ids(cql_filter(
            tbl, "ts DURING 2020-01-05T00:00:00/2020-01-10T00:00:00"))
        want = ids(tbl.filter(
            (F.col("ts") > "2020-01-05") & (F.col("ts") < "2020-01-10")))
        assert got == want
        assert ids(cql_filter(tbl, "ts BEFORE 2020-01-03T00:00:00")) == \
            ids(tbl.filter(F.col("ts") < "2020-01-03"))
        assert ids(cql_filter(tbl, "ts AFTER 2020-01-18T00:00:00")) == \
            ids(tbl.filter(F.col("ts") > "2020-01-18"))

    def test_bbox_and_intersects(self, tbl):
        got = ids(cql_filter(tbl, "BBOX(geom, -5, -3, 2, 2)"))
        want = ids(tbl.filter((F.col("lon") >= -5) & (F.col("lon") <= 2)
                              & (F.col("lat") >= -3) & (F.col("lat") <= 2)))
        assert got == want and got
        poly = "POLYGON((-5 -3, -5 2, 2 2, 2 -3, -5 -3))"
        assert ids(cql_filter(tbl, f"INTERSECTS(geom, {poly})")) == want
        assert ids(cql_filter(tbl, f"WITHIN(geom, {poly})")) == \
            ids(tbl.filter((F.col("lon") > -5) & (F.col("lon") < 2)
                           & (F.col("lat") > -3) & (F.col("lat") < 2)))
        assert ids(cql_filter(tbl, f"DISJOINT(geom, {poly})")) == ids(tbl) - want

    def test_dwithin_geodesic(self, tbl):
        got = ids(cql_filter(tbl, "DWITHIN(geom, POINT(0 0), 300, kilometers)"))
        # independent haversine
        import numpy as np
        rows = tbl.select("id", "lon", "lat").collect()
        want = set()
        for r in rows:
            la, lo = np.radians(r["lat"]), np.radians(r["lon"])
            d = 2 * 6371008.7714 * np.arcsin(np.sqrt(
                np.sin(la / 2) ** 2 + np.cos(la) * np.cos(0.0) * np.sin(lo / 2) ** 2))
            if d < 300_000:
                want.add(r["id"])
        assert got == want and got

    def test_parse_errors(self):
        for bad in ("v ==", "BBOX(geom, 1, 2, 3)", "kind LIKE", "v IN 3",
                    "DWITHIN(geom, POINT(0 0), 5, parsecs)", "((v = 1)"):
            with pytest.raises(CqlError):
                cql_to_sql(bad)


class TestBounds:
    def test_and_intersection(self):
        b = extract_bounds(
            "BBOX(geom, 0, 0, 10, 10) AND BBOX(geom, 5, 5, 20, 20)", "geom")
        assert b == [(5.0, 5.0, 10.0, 10.0)]

    def test_disjoint_and_is_empty(self):
        assert extract_bounds(
            "BBOX(geom, 0, 0, 1, 1) AND BBOX(geom, 5, 5, 6, 6)", "geom") == []

    def test_or_union(self):
        b = extract_bounds(
            "BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6)", "geom")
        assert sorted(b) == [(0.0, 0.0, 1.0, 1.0), (5.0, 5.0, 6.0, 6.0)]

    def test_attribute_only_is_unbounded(self):
        assert extract_bounds("kind = 'a'", "geom") is None
        assert extract_bounds("NOT BBOX(geom, 0, 0, 1, 1)", "geom") is None
        assert extract_bounds(
            "BBOX(geom, 0, 0, 1, 1) OR kind = 'a'", "geom") is None

    def test_and_with_attribute_keeps_spatial(self):
        b = extract_bounds("BBOX(geom, 0, 0, 1, 1) AND kind = 'a'", "geom")
        assert b == [(0.0, 0.0, 1.0, 1.0)]

    def test_dwithin_expands(self):
        b = extract_bounds("DWITHIN(geom, POINT(10 40), 100, kilometers)", "geom")
        (x0, y0, x1, y1), = b
        assert x0 < 10 - 0.8 and x1 > 10 + 0.8   # ~1.17 deg lon at 41N
        assert y0 < 40 - 0.8 and y1 > 40 + 0.8

    def test_other_attr_unbounded(self):
        assert extract_bounds("BBOX(other, 0, 0, 1, 1)", "geom") is None


def test_planner_integration(spark, tmp_path):
    """extract_bounds drives the indexed store's partition pruning; the
    residual compiled filter reproduces the brute-force row set."""
    from geomesa_spark.functions import register_functions
    from geomesa_spark.functions.cql import cql_filter, extract_bounds
    from geomesa_spark.plans.store import bbox_query, write_indexed
    from geomesa_spark.sources.pages import generate_pages, geoparse

    register_functions(spark)
    pts = geoparse(generate_pages(spark, 4000, partitions=8)) \
        .select("url", "lon", "lat")
    path = str(tmp_path / "store")
    write_indexed(pts, path)

    cql = "BBOX(geom, -75, 39.5, -72, 41.5) AND url LIKE '%a%'"
    (bbox,) = extract_bounds(cql, "geom")
    pruned = bbox_query(spark, path, *bbox)
    got = (pruned.withColumn("geom", F.expr("st_makePoint(lon, lat)"))
                 .transform(lambda d: cql_filter(d, cql)))
    brute = pts.filter((F.col("lon") >= -75) & (F.col("lon") <= -72)
                       & (F.col("lat") >= 39.5) & (F.col("lat") <= 41.5)
                       & F.col("url").contains("a"))
    assert {r["url"] for r in got.collect()} == {r["url"] for r in brute.collect()}


class TestReviewRegressions:
    def test_dateline_bbox_splits(self, tbl):
        """BBOX with xmin > xmax is a dateline window: split, not crash."""
        b = extract_bounds("BBOX(geom, 170, 0, -170, 10)", "geom")
        assert sorted(b) == [(-180.0, 0.0, -170.0, 10.0),
                             (170.0, 0.0, 180.0, 10.0)]
        # the compiled filter runs (none of the fixture points qualify)
        assert ids(cql_filter(tbl, "BBOX(geom, 170, 0, -170, 10)")) == set()
        with pytest.raises(CqlError, match="ymin > ymax"):
            cql_to_sql("BBOX(geom, 0, 10, 10, 0)")

    def test_dateline_query_store_runs(self, spark, tmp_path):
        from geomesa_spark.plans.store import query_store, write_indexed

        pts = spark.createDataFrame(
            [(1, 175.0, 5.0), (2, -175.0, 5.0), (3, 0.0, 5.0)],
            "pid long, lon double, lat double")
        path = str(tmp_path / "idl_store")
        write_indexed(pts, path)
        got = {r["pid"] for r in
               query_store(spark, path, "BBOX(geom, 170, 0, -170, 10)").collect()}
        assert got == {1, 2}

    def test_dwithin_expansion_is_conservative(self):
        """The planner window must contain every point the exact geodesic
        predicate accepts (review finding: 0.1% under-expansion)."""
        import numpy as np

        (w,) = extract_bounds("DWITHIN(geom, POINT(0 0), 100, kilometers)", "geom")
        # point just inside 100 km due east
        lon = 0.89852
        la1 = la2 = 0.0
        lo = np.radians(lon)
        d = 2 * 6371008.7714 * np.arcsin(abs(np.sin(lo / 2)))
        assert d < 100_000
        assert w[0] <= lon <= w[2]


def test_dwithin_bounds_wrap_at_dateline(spark):
    """extract_bounds for a DWITHIN disk near +-180 must include a
    window on the far side (IDL split), or the store prefilter prunes
    true matches."""
    b = extract_bounds(
        "DWITHIN(geom, POINT(179.9 0), 100, kilometers)", "geom")
    assert len(b) == 2
    near = [w for w in b if w[2] == 180.0]
    far = [w for w in b if w[0] == -180.0]
    assert near and far
    # the far window covers the point at lon=-179.97 (~14.5 km away)
    fx = far[0]
    assert fx[0] <= -179.97 <= fx[2]


def test_dwithin_inclusive_boundary(spark):
    """CQL DWITHIN is inclusive (JTS isWithinDistance); BEYOND is its
    strict complement — the compiled SQL carries <= and >."""
    sql = cql_to_sql("DWITHIN(geom, POINT(0 0), 1000, meters)")
    assert "<=" in sql
    sql_b = cql_to_sql("BEYOND(geom, POINT(0 0), 1000, meters)")
    assert ">" in sql_b and "<=" not in sql_b
