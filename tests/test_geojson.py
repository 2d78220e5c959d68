"""GeoJSON converter ingest (sources/converter.read_geojson)."""

from __future__ import annotations

import json

import pytest

from geomesa_spark.geom.wkb import wkb_read
from geomesa_spark.sources.converter import read_and_convert, read_geojson


def _feature(geom, **props):
    return {"type": "Feature", "geometry": geom, "properties": props}


POINT = {"type": "Point", "coordinates": [10.0, 20.0]}
LINE = {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 2.0]]}
POLY = {"type": "Polygon", "coordinates": [
    [[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0], [0.0, 0.0]],
    [[0.2, 0.2], [0.2, 0.4], [0.4, 0.4], [0.4, 0.2], [0.2, 0.2]]]}
MPOLY = {"type": "MultiPolygon", "coordinates": [
    [[[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.0, 0.0]]],
    [[[5.0, 5.0], [5.0, 6.0], [6.0, 6.0], [5.0, 5.0]]]]}


def test_geojsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "feats.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in [
        _feature(POINT, name="a", rank=1),
        _feature(LINE, name="b"),
        _feature(POLY, name="c"),
        _feature(MPOLY, name="d"),
        _feature({"type": "GeometryCollection", "geometries": []}, name="bad"),
    ]) + "\nnot json at all\n")
    out = {r["properties"].get("name") if r["properties"] else None:
           r for r in read_geojson(spark, str(p)).collect()}
    assert set(out) == {"a", "b", "c", "d", "bad", None}
    ga = wkb_read(bytes(out["a"]["geom"]))
    assert (ga.x, ga.y) == (10.0, 20.0) and out["a"]["geom_type"] == "Point"
    assert out["a"]["properties"]["rank"] == "1"   # non-string -> JSON-encoded
    gc = wkb_read(bytes(out["c"]["geom"]))
    assert len(gc.rings) == 2                       # hole preserved
    gd = wkb_read(bytes(out["d"]["geom"]))
    assert len(gd.geoms) == 2
    assert out["bad"]["geom"] is None               # unsupported type
    assert out[None]["geom"] is None                # malformed line


def test_feature_collection_wholetext(spark, tmp_path):
    doc = {"type": "FeatureCollection",
           "features": [_feature(POINT, name="p1"),
                        _feature(LINE, name="p2")]}
    p = tmp_path / "fc.geojson"
    p.write_text(json.dumps(doc, indent=2))
    rows = read_geojson(spark, str(p), lines=False).collect()
    assert sorted(r["properties"]["name"] for r in rows) == ["p1", "p2"]


def test_read_and_convert_geojson_spec(spark, tmp_path):
    p = tmp_path / "f.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in [
        _feature(POINT, name="x", score=0.5),
        _feature({"type": "GeometryCollection", "geometries": []}, name="drop"),
    ]))
    out = read_and_convert(
        spark, "geojson", str(p),
        {"name": "properties['name']",
         "score": "CAST(properties['score'] AS DOUBLE)",
         "geom": "geom"},
        required=["geom"], error_mode="skip")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "x"
    assert rows[0]["score"] == 0.5
    with pytest.raises(ValueError):
        read_and_convert(spark, "geojson", str(p), {"geom": "geom"},
                         required=["geom"], error_mode="raise")
