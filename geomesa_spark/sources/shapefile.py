"""ESRI shapefile ingest: .shp geometry + sibling .dbf attributes.

Spark-first analog of the reference's shapefile converter
(geomesa-convert/geomesa-convert-shp/.../ShapefileConverter.scala, which
delegates to GeoTools' ShapefileDataStore and likewise processes one
shapefile per task): files arrive through Spark's ``binaryFile`` source —
the format is NOT block-splittable, so parallelism is per FILE; a
100 TB-scale dataset should be many shapefiles (or converted to parquet
once at ingest, which is what the reference's ingest tooling does too).
Byte parsing is a numpy ``frombuffer`` pass inside ``mapInPandas`` over
whole-file contents — no per-row Python, one Arrow batch per file.

Format references are the public specs: ESRI Shapefile Technical
Description (July 1998) for .shp, dBase III for .dbf.

Supported shapes: Null (skipped), Point, PolyLine, Polygon, MultiPoint
(XY forms). Z/M variants raise NotImplementedError — an honest capability
limit, same convention as the EWKB Z/M paths in geom/wkb.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geom.kernels import pip_rings
from ..geom.wkb import (LineString, MultiLineString, MultiPoint,
                        MultiPolygon, Point, Polygon, wkb_write)

__all__ = ["read_shapefile", "parse_shp_bytes", "parse_dbf_bytes",
           "build_shp", "build_dbf", "point_record", "poly_record",
           "multipoint_record"]

_XY_TYPES = {0: "Null", 1: "Point", 3: "LineString", 5: "Polygon",
             8: "MultiPoint"}
_ZM_TYPES = {11, 13, 15, 18, 21, 23, 25, 28}


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _assemble_polygons(rings: list[np.ndarray]):
    """Shapefile polygons store all rings of all polygons in one record:
    exterior rings wind clockwise (negative shoelace area), holes
    counter-clockwise. Reassemble: each hole attaches to the first shell
    that strictly contains its first vertex (spec guarantees containment
    and non-overlap of shells, so first-match is unambiguous)."""
    shells = [r for r in rings if _signed_area(r) <= 0.0]
    holes = [r for r in rings if _signed_area(r) > 0.0]
    if not shells:  # degenerate: treat every ring as a shell
        shells, holes = rings, []
    if len(shells) == 1:
        return Polygon(shells[0], holes)
    polys = [Polygon(s, []) for s in shells]
    for h in holes:
        px, py = np.array([h[0, 0]]), np.array([h[0, 1]])
        target = 0
        for i, s in enumerate(shells):
            if pip_rings(px, py, [s])[0] == 1:
                target = i
                break
        polys[target].holes.append(h)
    return MultiPolygon(polys)


def parse_shp_bytes(buf: bytes):
    """Yield ``(fid, wkb, geom_type)`` per record of one .shp file."""
    if len(buf) < 100:
        raise ValueError("shapefile: truncated header")
    code = struct.unpack(">i", buf[0:4])[0]
    if code != 9994:
        raise ValueError(f"shapefile: bad magic {code} (want 9994)")
    flen = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words -> bytes
    off = 100
    while off + 8 <= min(flen, len(buf)):
        fid, clen = struct.unpack(">ii", buf[off:off + 8])
        off += 8
        content = buf[off:off + clen * 2]
        off += clen * 2
        stype = struct.unpack("<i", content[0:4])[0]
        if stype in _ZM_TYPES:
            raise NotImplementedError(
                f"shapefile: Z/M shape type {stype} not supported (XY only)")
        name = _XY_TYPES.get(stype)
        if name is None:
            raise ValueError(f"shapefile: unknown shape type {stype}")
        if name == "Null":
            continue
        if name == "Point":
            x, y = struct.unpack("<dd", content[4:20])
            yield fid, wkb_write(Point(x, y)), "Point"
            continue
        # PolyLine / Polygon / MultiPoint share the box + counts layout
        if name == "MultiPoint":
            (npts,) = struct.unpack("<i", content[36:40])
            pts = np.frombuffer(content, dtype="<f8", count=npts * 2,
                                offset=40).reshape(-1, 2)
            geom = MultiPoint([Point(p[0], p[1]) for p in pts])
            yield fid, wkb_write(geom), "MultiPoint"
            continue
        nparts, npts = struct.unpack("<ii", content[36:44])
        parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(content, dtype="<f8", count=npts * 2,
                            offset=44 + 4 * nparts).reshape(-1, 2)
        bounds = np.append(parts, npts)
        seqs = [np.array(pts[bounds[i]:bounds[i + 1]], dtype=np.float64)
                for i in range(nparts)]
        if name == "LineString":
            geom = (LineString(seqs[0]) if len(seqs) == 1
                    else MultiLineString([LineString(s) for s in seqs]))
            yield fid, wkb_write(geom), type(geom).__name__
        else:  # Polygon
            geom = _assemble_polygons(seqs)
            yield fid, wkb_write(geom), type(geom).__name__


def parse_dbf_bytes(buf: bytes, encoding: str = "latin-1"):
    """Yield one ``{field: trimmed-string}`` dict per live record of a
    dBase III .dbf file (deleted rows — flag 0x2A — are skipped). All
    values stay strings; type them in a convert() spec."""
    if len(buf) < 32:
        return
    n_rec = struct.unpack("<I", buf[4:8])[0]
    hdr_size, rec_size = struct.unpack("<HH", buf[8:12])
    fields = []
    off = 32
    while off + 32 <= hdr_size and buf[off] != 0x0D:
        raw = buf[off:off + 32]
        name = raw[0:11].split(b"\x00", 1)[0].decode(encoding).strip()
        length = raw[16]
        fields.append((name, length))
        off += 32
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break
        rec = buf[pos:pos + rec_size]
        pos += rec_size
        if rec[0:1] == b"*":
            continue
        vals, o = {}, 1
        for name, length in fields:
            vals[name] = rec[o:o + length].decode(encoding, "replace").strip()
            o += length
        yield vals


# --------------------------------------------------------------------------
# record-level writers (the inverse of the parsers above): used to
# synthesize fixtures and to export small driver-sized feature sets —
# a shapefile is a single sequential file, so a distributed writer makes
# no sense; large exports belong in parquet (sinks.py)

def point_record(x: float, y: float) -> bytes:
    return struct.pack("<i2d", 1, x, y)


def poly_record(shape_type: int, rings: list[np.ndarray]) -> bytes:
    """PolyLine (3) / Polygon (5) record from part arrays."""
    pts = np.vstack(rings)
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    env = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
    return (struct.pack("<i4d", shape_type, *env)
            + struct.pack("<ii", len(rings), len(pts))
            + parts.tobytes() + pts.astype("<f8").tobytes())


def multipoint_record(pts) -> bytes:
    a = np.asarray(pts, dtype="<f8")
    env = (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
    return (struct.pack("<i4d", 8, *env)
            + struct.pack("<i", len(a)) + a.tobytes())


def build_shp(records: list[bytes]) -> bytes:
    """Assemble a .shp file: 100-byte header + (record header, content)*."""
    body = b""
    for i, content in enumerate(records, start=1):
        body += struct.pack(">ii", i, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    hdr = (struct.pack(">i", 9994) + b"\x00" * 20
           + struct.pack(">i", total_words) + struct.pack("<ii", 1000, 1)
           + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0))
    return hdr + body


def build_dbf(fields: list[tuple[str, int]], rows: list[list[str]],
              encoding: str = "latin-1") -> bytes:
    """Assemble a dBase III .dbf with character fields only."""
    desc = b""
    for name, length in fields:
        desc += (name.encode(encoding).ljust(11, b"\x00") + b"C"
                 + b"\x00" * 4 + bytes([length]) + b"\x00" * 15)
    hdr_size = 32 + len(desc) + 1
    rec_size = 1 + sum(w for _, w in fields)
    hdr = (bytes([0x03, 26, 8, 19]) + struct.pack("<I", len(rows))
           + struct.pack("<HH", hdr_size, rec_size) + b"\x00" * 20)
    body = b""
    for row in rows:
        body += b" " + b"".join(v.encode(encoding).ljust(w)
                                for v, (_, w) in zip(row, fields))
    return hdr + desc + b"\x0d" + body + b"\x1a"


_SHP_SCHEMA = ("path string, fid bigint, geom binary, geom_type string, "
               "attrs map<string,string>")


def read_shapefile(spark, path: str) -> DataFrame:
    """Read every ``*.shp`` under ``path`` (glob ok) with sibling
    ``*.dbf`` attributes when present. Returns one row per feature:
    ``(path, fid, geom WKB, geom_type, attrs map<string,string>)``.

    Plan shape: two binaryFile scans (.shp, .dbf) joined on the file
    stem — one tiny per-FILE row each, so the join is trivially
    broadcastable and the only heavy movement is the file bytes Spark
    must read anyway; then one mapInPandas pass parses each file's bytes
    with numpy. Parallelism is per file (format limit, same as the
    reference's per-shapefile tasks).
    """
    shp = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.shp").load(path)
           .select(F.regexp_replace("path", r"\.shp$", "").alias("stem"),
                   F.col("path"), F.col("content")))
    dbf = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.dbf").load(path)
           .select(F.regexp_replace("path", r"\.dbf$", "").alias("stem"),
                   F.col("content").alias("dbf")))
    both = shp.join(dbf, "stem", "left").drop("stem")

    def parse(batches):
        for pdf in batches:
            out = {"path": [], "fid": [], "geom": [], "geom_type": [],
                   "attrs": []}
            for path_, content, dbfc in zip(pdf["path"], pdf["content"],
                                            pdf["dbf"]):
                recs = list(parse_dbf_bytes(dbfc)) if dbfc is not None else []
                for i, (fid, wkb, gt) in enumerate(parse_shp_bytes(content)):
                    out["path"].append(path_)
                    out["fid"].append(fid)
                    out["geom"].append(wkb)
                    out["geom_type"].append(gt)
                    out["attrs"].append(recs[i] if i < len(recs) else {})
            yield pd.DataFrame(out)

    return both.mapInPandas(parse, _SHP_SCHEMA)
