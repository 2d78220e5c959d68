"""Config-driven converter ingest: files -> typed feature DataFrame.

The Spark-first analog of the reference's converter framework
(geomesa-convert: a config maps source fields through transform
expressions to a typed SimpleFeature, with an error mode for bad
records; ConverterSpatialRDDProvider.scala:44-134, transform DSL
geomesa-convert-common/.../transforms/). Here the format reader is
Spark's own (csv/json/parquet — the reference's per-format readers) and
the transform DSL is Spark SQL: a converter spec is just

    {"out_field": "sql expression over the source columns", ...}

with geometry constructors coming from the registered ``st_*`` surface.
Error modes (the reference's ErrorMode): 'raise' fails the job on a
null-required row, 'skip' drops such rows, 'log' keeps them with a
``__bad__`` flag.
"""

from __future__ import annotations

import json as _json

import numpy as np  # noqa: F401  (pandas_udf resolution convention)
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["convert", "read_and_convert", "read_fixedwidth", "read_geojson",
           "read_xml", "read_xml_lines"]

_FORMATS = ("csv", "json", "parquet", "geojson", "fixedwidth", "xml")


def convert(df: DataFrame, fields: dict[str, str],
            required: list[str] | None = None,
            error_mode: str = "raise") -> DataFrame:
    """Apply a converter spec to an already-loaded source DataFrame.

    ``fields`` maps output column -> SQL expression over source columns;
    ``required`` lists output columns that must be non-null for the row
    to be a valid feature.
    """
    if error_mode not in ("raise", "skip", "log"):
        raise ValueError(f"error_mode must be raise|skip|log, got {error_mode}")
    req = list(required or [])
    unknown = [c for c in req if c not in fields]
    if unknown:
        raise ValueError(f"converter: required column(s) {unknown} not in the "
                         f"field spec {sorted(fields)}")
    out = df.select([F.expr(expr).alias(name) for name, expr in fields.items()])
    if not req:
        return out
    bad = None
    for c in req:
        b = F.col(c).isNull()
        bad = b if bad is None else (bad | b)
    if error_mode == "skip":
        return out.filter(~bad)
    if error_mode == "log":
        return out.withColumn("__bad__", bad)
    # raise: fail fast driver-side if any bad row exists (the reference's
    # default raise-on-error converter behavior); single scan
    sample = out.filter(bad).limit(5).collect()
    if sample:
        raise ValueError(f"converter: required field null in input, e.g. {sample}")
    return out


def _geojson_feature_rows(texts):
    """Yield (geom_wkb, geom_type, properties-as-str-map) per Feature in
    one GeoJSON document (Feature, FeatureCollection, or bare geometry)."""
    from ..geom.wkb import (LineString, MultiLineString, MultiPoint,
                            MultiPolygon, Point, Polygon, wkb_write)

    def build(g):
        if not g or "type" not in g:
            return None, None
        t, c = g["type"], g.get("coordinates")
        try:
            if t == "Point":
                return wkb_write(Point(float(c[0]), float(c[1]))), t
            if t == "LineString":
                return wkb_write(LineString(np.asarray(c, dtype=np.float64))), t
            if t == "Polygon":
                rings = [np.asarray(r, dtype=np.float64) for r in c]
                return wkb_write(Polygon(rings[0], rings[1:])), t
            if t == "MultiPoint":
                return wkb_write(MultiPoint(
                    [Point(float(p[0]), float(p[1])) for p in c])), t
            if t == "MultiLineString":
                return wkb_write(MultiLineString(
                    [LineString(np.asarray(l, dtype=np.float64)) for l in c])), t
            if t == "MultiPolygon":
                polys = [Polygon(np.asarray(p[0], dtype=np.float64),
                                 [np.asarray(r, dtype=np.float64) for r in p[1:]])
                         for p in c]
                return wkb_write(MultiPolygon(polys)), t
        except (TypeError, ValueError, IndexError):
            return None, None
        return None, None  # GeometryCollection etc: unsupported -> null

    for txt in texts:
        if txt is None or not txt.strip():
            continue
        try:
            doc = _json.loads(txt)
        except ValueError:
            yield None, None, None  # malformed record -> all-null row
            continue
        feats = (doc.get("features", []) if doc.get("type") == "FeatureCollection"
                 else [doc])
        for ft in feats:
            if ft.get("type") == "Feature":
                geom, gt = build(ft.get("geometry"))
                props = {str(k): (v if isinstance(v, str) else _json.dumps(v))
                         for k, v in (ft.get("properties") or {}).items()}
            else:  # bare geometry object
                geom, gt = build(ft)
                props = {}
            yield geom, gt, props


_GEOJSON_SCHEMA = ("geom binary, geom_type string, "
                   "properties map<string,string>")


def read_geojson(spark, path: str, lines: bool = True) -> DataFrame:
    """GeoJSON ingest (the reference's geomesa-convert-json GeoJSON mode,
    geomesa-convert-json/.../JsonConverter.scala): returns one row per
    Feature with ``geom`` (WKB), ``geom_type``, and ``properties`` as a
    string map (non-string property values stay JSON-encoded, so the
    schema is stable across heterogeneous files; cast in the converter
    spec). ``lines=True`` reads GeoJSONL — one Feature per line, the
    splittable web-scale layout; ``lines=False`` reads each file as one
    FeatureCollection document (wholetext — a non-splittable format, so
    parallelism is per FILE; fine for many small files, wrong for one
    giant collection, which should be converted to GeoJSONL first).

    Parsing runs in an Arrow-batched ``mapInPandas`` (Python json +
    wkb_write): Spark's json schema inference cannot hold GeoJSON's
    mixed-depth ``coordinates`` arrays across geometry types, so the
    document stays text until the UDF. Unsupported geometry types
    (GeometryCollection) and malformed records yield null ``geom`` —
    route them with convert()'s error modes.
    """
    txt = spark.read.text(path, wholetext=not lines)

    def parse(batches):
        for pdf in batches:
            rows = list(_geojson_feature_rows(pdf["value"]))
            yield pd.DataFrame(
                {"geom": [r[0] for r in rows],
                 "geom_type": [r[1] for r in rows],
                 "properties": [r[2] for r in rows]})

    return txt.mapInPandas(parse, _GEOJSON_SCHEMA)


def read_fixedwidth(spark, path: str,
                    fields: list[tuple[str, int, int]],
                    trim: bool = True) -> DataFrame:
    """Fixed-width text ingest (the reference's geomesa-convert-fixedwidth:
    each field is ``line.substring(start, start + width)`` —
    FixedWidthConverter.scala:57-66). ``fields`` is a list of
    ``(name, start, width)`` with 0-based ``start``; ``trim=True`` strips
    the pad spaces (the common layout; pass False for significant
    whitespace).

    Pure JVM ``substring`` chain over ``spark.read.text`` — map-only, no
    Python, and line-splittable, so a 100 TB fixed-width dump parallelizes
    by HDFS block like CSV. One semantic difference from the reference,
    which raises StringIndexOutOfBounds on short lines: Spark's
    ``substring`` yields a short/empty string instead — route short lines
    with ``convert(required=..., error_mode=...)`` (a null after a
    ``try_cast`` marks the bad row — under Spark 4's default ANSI mode a
    plain ``cast`` of a truncated field throws) rather than relying on an
    exception.
    """
    if not fields:
        raise ValueError("read_fixedwidth: empty field spec")
    for name, start, width in fields:
        if start < 0 or width <= 0:
            raise ValueError(f"read_fixedwidth: bad (start, width) for "
                             f"{name!r}: ({start}, {width})")
    lines = spark.read.text(path)
    cols = []
    for name, start, width in fields:
        c = F.substring(F.col("value"), start + 1, width)
        cols.append((F.trim(c) if trim else c).alias(name))
    return lines.select(cols)


def read_xml(spark, path: str, row_tag: str, schema: str | None = None,
             options: dict | None = None) -> DataFrame:
    """XML ingest (the reference's geomesa-convert-xml: a featurePath
    XPath selects the feature elements of each document and per-field
    XPaths evaluate inside them — XmlConverter.scala:38-52,
    XmlConverterFactory). Spark 4 bundles the XML source natively, so the
    Spark-first mapping is ``rowTag`` = the reference's featurePath leaf
    element, and field XPaths become nested-column access on the inferred
    struct — or, for genuinely XPath-shaped pulls over a raw string
    column, the built-in ``xpath_string``/``xpath_*`` SQL functions inside
    a ``convert()`` spec (both run JVM-side; no Python).

    Pass ``schema`` (DDL string) to skip inference — at 100 TB schema
    inference is a full extra pass over the data; a production ingest
    should always pin it.

    This path expects ROOTED documents (rowTag elements inside an
    enclosing root, the reference's multi-line parse mode); for
    root-less one-element-per-line feeds use ``read_xml_lines``, which
    is also the splittable layout to prefer at scale.
    """
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def read_xml_lines(spark, path: str, row_schema: str,
                   options: dict | None = None) -> DataFrame:
    """XML-fragment-per-line ingest — the reference's
    ``LineMode.Single`` (geomesa-convert-xml XmlOptions lineMode: each
    line is one self-contained feature element, no document root). This
    is the layout a 100 TB XML feed should be in: line-splittable, so it
    parallelizes by block, unlike a rooted document which the rowTag
    source must scan per file. ``spark.read.text`` + ``from_xml`` under
    a PINNED struct schema — all JVM-side, no Python, no inference pass.
    Malformed lines yield a null struct (all-null row): route them with
    ``convert(required=..., error_mode=...)``.
    """
    df = spark.read.text(path)
    parsed = df.select(
        F.from_xml(F.col("value"), row_schema, options or {}).alias("r"))
    return parsed.select("r.*")


def read_and_convert(spark, fmt: str, path: str, fields: dict[str, str],
                     required: list[str] | None = None,
                     error_mode: str = "raise",
                     reader_options: dict | None = None) -> DataFrame:
    """Read ``path`` with Spark's ``fmt`` reader and apply the spec."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt}")
    if fmt == "geojson":
        lines = True
        if reader_options:
            lines = bool(reader_options.get("lines", True))
        df = read_geojson(spark, path, lines=lines)
        return convert(df, fields, required, error_mode)
    if fmt == "fixedwidth":
        opts = dict(reader_options or {})
        widths = opts.pop("widths", None)
        if not widths:
            raise ValueError("fixedwidth needs reader_options={'widths': "
                             "[(name, start, width), ...]}")
        df = read_fixedwidth(spark, path, widths, trim=opts.pop("trim", True))
        return convert(df, fields, required, error_mode)
    if fmt == "xml":
        opts = dict(reader_options or {})
        row_tag = opts.pop("rowTag", None)
        if not row_tag:
            raise ValueError("xml needs reader_options={'rowTag': ...}")
        df = read_xml(spark, path, row_tag, schema=opts.pop("schema", None),
                      options=opts)
        return convert(df, fields, required, error_mode)
    reader = spark.read
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv":
        reader = reader.option("header", reader_options.get("header", True)
                               if reader_options else True)
    df = getattr(reader, fmt)(path)
    return convert(df, fields, required, error_mode)
