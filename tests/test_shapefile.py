"""Shapefile source (sources/shapefile.py): synthesized .shp/.dbf bytes
from the public ESRI/dBase specs, parsed back and checked row-for-row."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geomesa_spark.geom.wkb import wkb_read
from geomesa_spark.sources.shapefile import (build_dbf, build_shp,
                                             multipoint_record,
                                             parse_dbf_bytes,
                                             parse_shp_bytes, point_record,
                                             poly_record, read_shapefile)


# rings: shapefile winding — shell CW (negative shoelace), hole CCW
SHELL_CW = [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]
HOLE_CCW = [(2, 2), (6, 2), (6, 6), (2, 6), (2, 2)]
SHELL2_CW = [(20, 20), (20, 24), (24, 24), (24, 20), (20, 20)]


def test_parse_shp_point_line_polygon():
    shp = build_shp([
        point_record(3.5, -7.25),
        poly_record(3, [np.array([(0, 0), (1, 1), (2, 0)], dtype=float)]),
        poly_record(5, [np.array(SHELL_CW, dtype=float),
                  np.array(HOLE_CCW, dtype=float)]),
        multipoint_record([(1, 2), (3, 4)]),
    ])
    recs = list(parse_shp_bytes(shp))
    assert [(fid, gt) for fid, _, gt in recs] == [
        (1, "Point"), (2, "LineString"), (3, "Polygon"), (4, "MultiPoint")]
    pt = wkb_read(recs[0][1])
    assert (pt.x, pt.y) == (3.5, -7.25)
    poly = wkb_read(recs[2][1])
    assert len(poly.holes) == 1
    assert np.allclose(poly.shell, np.array(SHELL_CW, dtype=float))


def test_parse_shp_multi_shell_hole_assignment():
    """Two shells + one hole in a single record -> MultiPolygon with the
    hole attached to the shell that contains it."""
    shp = build_shp([poly_record(5, [np.array(SHELL2_CW, dtype=float),
                          np.array(SHELL_CW, dtype=float),
                          np.array(HOLE_CCW, dtype=float)])])
    (fid, wkb, gt), = parse_shp_bytes(shp)
    assert gt == "MultiPolygon"
    mp = wkb_read(wkb)
    by_origin = {tuple(p.shell[0]): p for p in mp.geoms}
    assert len(by_origin[(0.0, 0.0)].holes) == 1
    assert len(by_origin[(20.0, 20.0)].holes) == 0


def test_parse_shp_null_skipped_and_zm_raises():
    shp = build_shp([struct.pack("<i", 0), point_record(1, 2)])
    recs = list(parse_shp_bytes(shp))
    assert [fid for fid, _, _ in recs] == [2]
    with pytest.raises(NotImplementedError, match="Z/M"):
        list(parse_shp_bytes(build_shp([struct.pack("<i4d", 11, 1, 2, 3, 4)])))
    with pytest.raises(ValueError, match="bad magic"):
        list(parse_shp_bytes(b"\x00" * 100))


def test_parse_dbf_rows_and_deletion():
    dbf = build_dbf([("NAME", 8), ("POP", 6)],
               [["alpha", "123"], ["beta", "45"], ["gone", "0"]])
    # mark the third record deleted
    rec_size = 1 + 8 + 6
    start = len(dbf) - 1 - rec_size
    dbf = dbf[:start] + b"*" + dbf[start + 1:]
    rows = list(parse_dbf_bytes(dbf))
    assert rows == [{"NAME": "alpha", "POP": "123"},
                    {"NAME": "beta", "POP": "45"}]


def test_read_shapefile_with_attributes(spark, tmp_path):
    (tmp_path / "towns.shp").write_bytes(
        build_shp([point_record(1.0, 2.0), point_record(3.0, 4.0)]))
    (tmp_path / "towns.dbf").write_bytes(
        build_dbf([("NAME", 8)], [["alpha"], ["beta"]]))
    # second shapefile without a .dbf sibling
    (tmp_path / "bare.shp").write_bytes(build_shp([point_record(9.0, 9.0)]))
    out = read_shapefile(spark, str(tmp_path)).orderBy("path", "fid")
    rows = out.collect()
    assert [(r.fid, r.geom_type, dict(r.attrs)) for r in rows] == [
        (1, "Point", {}),
        (1, "Point", {"NAME": "alpha"}), (2, "Point", {"NAME": "beta"})]
    p = wkb_read(rows[1].geom)
    assert (p.x, p.y) == (1.0, 2.0)


def test_read_shapefile_convert_spec(spark, tmp_path):
    from geomesa_spark.sources.converter import convert

    (tmp_path / "t.shp").write_bytes(build_shp([point_record(10.0, 20.0)]))
    (tmp_path / "t.dbf").write_bytes(build_dbf([("POP", 6)], [["314"]]))
    df = read_shapefile(spark, str(tmp_path))
    out = convert(df, {"pop": "cast(attrs['POP'] as int)",
                       "x": "st_x(st_geomfromwkb(geom))"})
    r = out.collect()[0]
    assert (r.pop, r.x) == (314, 10.0)
