"""Fixed-width and XML converter ingest (sources/converter.read_fixedwidth /
read_xml), mirroring the reference's geomesa-convert-fixedwidth
(FixedWidthConverter.scala:57-66) and geomesa-convert-xml
(XmlConverter.scala:38-52) semantics on Spark's own readers."""

from __future__ import annotations

import pytest

from geomesa_spark.sources.converter import (read_and_convert,
                                             read_fixedwidth, read_xml)

FW_FIELDS = [("id", 0, 4), ("name", 4, 8), ("lon", 12, 8), ("lat", 20, 8)]

FW_ROWS = [(1, "alpha", -122.42, 37.774), (2, "beta", 151.21, -33.868),
           (3, "gamma", 2.35, 48.857)]


def _fw_file(tmp_path):
    p = tmp_path / "fixed.txt"
    p.write_text("".join(f"{i:04d}{n:<8}{lon:>8}{lat:>8}\n"
                         for i, n, lon, lat in FW_ROWS))
    return str(p)


def test_fixedwidth_offsets_and_trim(spark, tmp_path):
    out = read_fixedwidth(spark, _fw_file(tmp_path), FW_FIELDS)
    rows = {r.id: (r.name, r.lon, r.lat)
            for r in out.orderBy("id").collect()}
    assert rows == {"0001": ("alpha", "-122.42", "37.774"),
                    "0002": ("beta", "151.21", "-33.868"),
                    "0003": ("gamma", "2.35", "48.857")}
    # trim=False keeps the pad spaces (significant-whitespace layouts)
    raw = read_fixedwidth(spark, _fw_file(tmp_path), [("name", 4, 8)],
                          trim=False).collect()
    assert sorted(r.name for r in raw) == ["alpha   ", "beta    ", "gamma   "]


def test_fixedwidth_short_line_routes_through_error_mode(spark, tmp_path):
    """Reference raises on short lines; here the short field parses to
    empty/truncated (null after try_cast) and convert() routes it
    (skip drops, log flags)."""
    p = tmp_path / "short.txt"
    p.write_text(f"{1:04d}{'alpha':<8}{-122.42:>8}{37.774:>8}\n0002beta\n")
    spec = {"id": "cast(id as int)", "lat": "try_cast(lat as double)"}
    kept = read_and_convert(
        spark, "fixedwidth", str(p), spec, required=["lat"],
        error_mode="skip", reader_options={"widths": FW_FIELDS})
    assert [r.id for r in kept.collect()] == [1]
    logged = read_and_convert(
        spark, "fixedwidth", str(p), spec, required=["lat"],
        error_mode="log", reader_options={"widths": FW_FIELDS})
    assert {r.id: r["__bad__"] for r in logged.collect()} == {1: False,
                                                              2: True}


def test_fixedwidth_bad_spec_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="empty field spec"):
        read_fixedwidth(spark, _fw_file(tmp_path), [])
    with pytest.raises(ValueError, match="bad \\(start, width\\)"):
        read_fixedwidth(spark, _fw_file(tmp_path), [("x", -1, 3)])
    with pytest.raises(ValueError, match="widths"):
        read_and_convert(spark, "fixedwidth", _fw_file(tmp_path), {"id": "id"})


XML_DOC = """<sightings>
  <sighting><id>1</id><name>fox</name><lon>-1.5</lon><lat>52.4</lat></sighting>
  <sighting><id>2</id><name>owl</name><lon>0.1</lon><lat>51.5</lat></sighting>
  <sighting><id>3</id><name>fox</name><lon>-2.2</lon><lat>53.5</lat></sighting>
</sightings>
"""


def test_xml_rowtag_pinned_schema(spark, tmp_path):
    p = tmp_path / "s.xml"
    p.write_text(XML_DOC)
    out = read_xml(spark, str(p), "sighting",
                   schema="id BIGINT, name STRING, lon DOUBLE, lat DOUBLE")
    rows = {r.id: (r.name, r.lon, r.lat) for r in out.collect()}
    assert rows == {1: ("fox", -1.5, 52.4), 2: ("owl", 0.1, 51.5),
                    3: ("fox", -2.2, 53.5)}


def test_xml_attributes_and_inference(spark, tmp_path):
    p = tmp_path / "a.xml"
    p.write_text('<root><pt x="1.0" y="2.0">here</pt>'
                 '<pt x="3.0" y="4.0">there</pt></root>')
    out = read_xml(spark, str(p), "pt")
    rows = sorted((r["_x"], r["_y"], r["_VALUE"]) for r in out.collect())
    assert rows == [(1.0, 2.0, "here"), (3.0, 4.0, "there")]


def test_xml_read_and_convert_to_geometry(spark, tmp_path):
    """Full converter path: rowTag scan -> st_point feature, the
    geomesa-convert-xml equivalent of an XPath-driven SFT mapping."""
    p = tmp_path / "s.xml"
    p.write_text(XML_DOC)
    out = read_and_convert(
        spark, "xml", str(p),
        {"id": "id", "name": "name", "geom": "st_point(lon, lat)"},
        required=["geom"],
        reader_options={"rowTag": "sighting",
                        "schema": "id BIGINT, name STRING, "
                                  "lon DOUBLE, lat DOUBLE"})
    got = out.selectExpr("id", "name", "st_x(geom) x", "st_y(geom) y").collect()
    assert sorted((r.id, r.name, r.x, r.y) for r in got) == [
        (1, "fox", -1.5, 52.4), (2, "owl", 0.1, 51.5), (3, "fox", -2.2, 53.5)]
    with pytest.raises(ValueError, match="rowTag"):
        read_and_convert(spark, "xml", str(p), {"id": "id"})


def test_xml_lines_fragments(spark, tmp_path):
    """LineMode.Single: root-less one-element-per-line feed via
    from_xml; malformed line -> all-null row (routable via convert)."""
    from geomesa_spark.sources.converter import convert, read_xml_lines

    p = tmp_path / "frag.xml"
    p.write_text('<ev id="1" t="a"><u>10</u></ev>\n'
                 '<ev id="2" t="b"><u>20</u></ev>\n'
                 'not xml at all\n')
    out = read_xml_lines(spark, str(p), "_id BIGINT, _t STRING, u BIGINT")
    rows = sorted((r["_id"], r["_t"], r.u) for r in out.collect()
                  if r["_id"] is not None)
    assert rows == [(1, "a", 10), (2, "b", 20)]
    kept = convert(out, {"id": "_id", "u": "u"}, required=["id"],
                   error_mode="skip")
    assert kept.count() == 2


def test_xpath_fields_in_convert_spec(spark, tmp_path):
    """The reference's per-field XPath style, for records that arrive as
    raw XML strings inside another table: built-in xpath_* SQL functions
    stay JVM-side inside a convert() spec."""
    from geomesa_spark.sources.converter import convert

    df = spark.createDataFrame(
        [('<r><id>7</id><tags><t>a</t><t>b</t></tags></r>',)], "xml string")
    out = convert(df, {
        "id": "cast(xpath_string(xml, 'r/id') as bigint)",
        "tags": "xpath(xml, 'r/tags/t/text()')"})
    r = out.collect()[0]
    assert (r.id, list(r.tags)) == (7, ["a", "b"])
