"""Export sinks + histogram-driven salt recommendation."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from geomesa_spark.operators.sinks import bin_records, to_geojson_df, write_geojson
from geomesa_spark.operators.spatial_join import recommend_salt
from geomesa_spark.sources.pages import generate_points


def test_geojson_rows(spark, tmp_path):
    pts = generate_points(spark, 100, partitions=2)
    gj = to_geojson_df(pts, id_col="page_id", props=["page_id"])
    row = gj.filter(F.col("page_id") == 5).collect()[0]
    parsed = json.loads(row["geojson"])
    assert parsed["type"] == "Feature"
    assert parsed["geometry"]["type"] == "Point"
    assert parsed["properties"]["page_id"] == 5
    assert abs(parsed["geometry"]["coordinates"][0] - row["lon"]) < 1e-9

    out = str(tmp_path / "gj")
    write_geojson(pts, out, id_col="page_id")
    lines = spark.read.text(out).count()
    assert lines == 100


def test_bin_records_pack(spark):
    df = spark.createDataFrame([(7, 10.5, -20.25, 1700000000)],
                               "track long, lat double, lon double, dtg long")
    b = bin_records(df, "track", x="lon", y="lat", ts_col="dtg").collect()[0]["bin"]
    t, la, lo, d = struct.unpack("<iffi", bytes(b))
    assert (t, d) == (7, 1700000000)
    assert abs(la - 10.5) < 1e-6 and abs(lo + 20.25) < 1e-6


def test_recommend_salt_detects_hot_cells(spark):
    # the seeded corpus is 80% concentrated in 20 urban cells -> skewed
    pts = generate_points(spark, 50_000, partitions=4)
    salt = recommend_salt(pts, "lon", "lat", level=8, sample_rows=50_000)
    assert salt > 1  # hot cells found
    # uniform layer -> no salting needed
    uni = spark.range(50_000).select(
        (F.rand(seed=1) * 360 - 180).alias("lon"),
        (F.rand(seed=2) * 180 - 90).alias("lat"))
    assert recommend_salt(uni, "lon", "lat", level=4) <= 2


def test_heatmap_smooth(spark):
    from geomesa_spark.operators.tiling import density_points, heatmap

    pts = generate_points(spark, 5_000, partitions=2)
    grid = density_points(pts, "lon", "lat", -180.0, -90.0, 180.0, 90.0, 360, 180)
    surf = heatmap(grid, 360, 180, radius_px=5)
    assert surf.shape == (180, 360)
    # mass approximately preserved away from edges; hot cells spread
    raw_total = sum(r["weight"] for r in grid.collect())
    assert 0.7 * raw_total < surf.sum() <= raw_total + 1e-6
    assert (surf > 0).sum() > grid.count()  # smoothing spreads support


class TestConverterIngest:
    """Config-driven converter: SQL-expression field transforms, geometry
    constructors from the st_* surface, error modes."""

    def test_csv_convert_with_geometry(self, spark, tmp_path):
        from geomesa_spark.functions import register_functions
        from geomesa_spark.sources.converter import read_and_convert

        register_functions(spark)
        p = str(tmp_path / "src.csv")
        import os
        os.makedirs(p)
        with open(os.path.join(p, "part.csv"), "w") as f:
            f.write("name,x,y,when\n")
            f.write("a,10.5,20.25,2020-01-01T00:00:00\n")
            f.write("b,-3.0,4.0,2020-01-02T12:00:00\n")
        out = read_and_convert(spark, "csv", p, {
            "fid": "name",
            "geom": "st_makePoint(CAST(x AS DOUBLE), CAST(y AS DOUBLE))",
            "dtg": "to_timestamp(when)",
            "gh": "st_geoHash(st_makePoint(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), 20)",
        }, required=["fid", "geom"])
        rows = {r["fid"]: r for r in out.collect()}
        assert set(rows) == {"a", "b"}
        assert rows["a"]["geom"] is not None and len(rows["a"]["gh"]) == 4

    def test_error_modes(self, spark):
        import pytest

        from geomesa_spark.sources.converter import convert

        df = spark.createDataFrame([("a", 1), (None, 2)], "k string, v int")
        spec = {"fid": "k", "vv": "v * 10"}
        skipped = convert(df, spec, required=["fid"], error_mode="skip")
        assert {r["fid"] for r in skipped.collect()} == {"a"}
        logged = convert(df, spec, required=["fid"], error_mode="log")
        assert {r["fid"]: r["__bad__"] for r in logged.collect()} == \
            {"a": False, None: True}
        with pytest.raises(ValueError, match="required field null"):
            convert(df, spec, required=["fid"], error_mode="raise").collect()

    def test_bin_label_records(self, spark):
        import struct as st

        from geomesa_spark.operators.sinks import bin_records

        df = spark.createDataFrame([(7, 1.5, -2.5, 1000, 42)],
                                   "tid int, lat double, lon double, dtg int, lbl long")
        (row,) = bin_records(df, "tid", x="lon", y="lat", ts_col="dtg",
                             label_col="lbl").collect()
        t, la, lo, d, lb = st.unpack("<iffiq", bytes(row["bin"]))
        assert (t, la, lo, d, lb) == (7, 1.5, -2.5, 1000, 42)


def test_leaflet_export(spark, tmp_path):
    import json as _json
    import re

    from geomesa_spark.operators.sinks import write_leaflet

    df = spark.createDataFrame([(1, 10.0, 20.0), (2, -30.0, 40.0)],
                               "fid long, lon double, lat double")
    out = str(tmp_path / "map.html")
    write_leaflet(df, out, id_col="fid", props=["fid"])
    html = open(out).read()
    assert "L.geoJSON" in html and "leaflet" in html
    m = re.search(r'var data = (\{.*?\});\nvar layer', html, re.S)
    data = _json.loads(m.group(1))
    assert data["type"] == "FeatureCollection" and len(data["features"]) == 2
    coords = sorted(f["geometry"]["coordinates"] for f in data["features"])
    assert coords == [[-30.0, 40.0], [10.0, 20.0]]


def test_bin_records_rejects_out_of_range_int32(spark):
    """The BIN format writes true int32 fields — a 64-bit track id must
    fail loudly, never be bit-masked into a colliding value."""
    import pytest

    from pyspark.errors import PythonException

    df = spark.createDataFrame(
        [(1 << 40, 1.0, 2.0, 1_600_000_000)],
        "track long, lat double, lon double, ts long")
    with pytest.raises(PythonException, match="int32"):
        bin_records(df, "track", "lon", "lat", "ts").collect()


def test_arrow_ipc_roundtrip(spark, tmp_path):
    """write_arrow_ipc -> read_arrow_ipc preserves ints, doubles,
    strings, and binary exactly; manifest rows sum to the row count."""
    from geomesa_spark.operators.sinks import read_arrow_ipc, write_arrow_ipc

    df = spark.createDataFrame(
        [(i, float(i) / 4, f"s{i}", bytes([i, 255 - i])) for i in range(100)],
        "id long, v double, s string, b binary").repartition(4)
    out = str(tmp_path / "arrow")
    manifest = write_arrow_ipc(df, out)
    assert sum(r for _, r in manifest) == 100
    assert len(manifest) == 4 and all(f.endswith(".arrows") for f, _ in manifest)
    back = read_arrow_ipc(spark, out, "id long, v double, s string, b binary")
    got = sorted((r.id, r.v, r.s, bytes(r.b)) for r in back.collect())
    assert got == [(i, i / 4, f"s{i}", bytes([i, 255 - i])) for i in range(100)]
