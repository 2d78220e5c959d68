"""Minimal geometry model + WKB/WKT codecs (no external geo libs).

The engine's physical convention matches the reference: geometry columns are
BinaryType holding ISO WKB (the reference Catalyst encoding of every geometry
UDT is WKB bytes — geomesa-spark-jts AbstractGeometryUDT.scala:61-75). This
module gives us a tiny geometry object model over numpy coordinate arrays and
little-endian WKB/WKT codecs. Parsing happens once per Arrow batch inside
pandas UDFs; all heavy math downstream is vectorized.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7


@dataclass
class Geometry:
    def is_empty(self) -> bool:
        raise NotImplementedError

    @property
    def geom_type(self) -> str:
        return type(self).__name__

    def envelope(self) -> tuple[float, float, float, float]:
        """(xmin, ymin, xmax, ymax)"""
        raise NotImplementedError


@dataclass
class Point(Geometry):
    x: float
    y: float

    def is_empty(self) -> bool:
        return np.isnan(self.x)

    def envelope(self):
        return (self.x, self.y, self.x, self.y)

    @property
    def coords(self) -> np.ndarray:
        return np.array([[self.x, self.y]])


@dataclass
class LineString(Geometry):
    coords: np.ndarray  # (n, 2)

    def __post_init__(self):
        self.coords = np.asarray(self.coords, dtype=np.float64).reshape(-1, 2)

    def is_empty(self) -> bool:
        return len(self.coords) == 0

    def envelope(self):
        c = self.coords
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    @property
    def is_closed(self) -> bool:
        return len(self.coords) > 0 and bool(np.all(self.coords[0] == self.coords[-1]))


@dataclass
class Polygon(Geometry):
    shell: np.ndarray  # (n, 2), closed ring
    holes: list = field(default_factory=list)  # list of (m, 2) closed rings

    def __post_init__(self):
        self.shell = np.asarray(self.shell, dtype=np.float64).reshape(-1, 2)
        self.holes = [np.asarray(h, dtype=np.float64).reshape(-1, 2) for h in self.holes]

    def is_empty(self) -> bool:
        return len(self.shell) == 0

    def envelope(self):
        c = self.shell
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())

    @property
    def rings(self) -> list:
        return [self.shell] + self.holes


@dataclass
class MultiGeometry(Geometry):
    geoms: list

    def is_empty(self) -> bool:
        return all(g.is_empty() for g in self.geoms)

    def envelope(self):
        envs = [g.envelope() for g in self.geoms if not g.is_empty()]
        if not envs:
            return (np.nan,) * 4
        e = np.array(envs)
        return (e[:, 0].min(), e[:, 1].min(), e[:, 2].max(), e[:, 3].max())


class MultiPoint(MultiGeometry):
    pass


class MultiLineString(MultiGeometry):
    pass


class MultiPolygon(MultiGeometry):
    pass


class GeometryCollection(MultiGeometry):
    pass


_TYPE_IDS = {
    Point: WKB_POINT,
    LineString: WKB_LINESTRING,
    Polygon: WKB_POLYGON,
    MultiPoint: WKB_MULTIPOINT,
    MultiLineString: WKB_MULTILINESTRING,
    MultiPolygon: WKB_MULTIPOLYGON,
    GeometryCollection: WKB_GEOMETRYCOLLECTION,
}


# --------------------------------------------------------------------------
# WKB
# --------------------------------------------------------------------------

def wkb_write(geom: Geometry) -> bytes:
    """Serialize to little-endian ISO WKB."""
    out = bytearray()
    _wkb_write_into(geom, out)
    return bytes(out)


def _wkb_write_into(geom: Geometry, out: bytearray) -> None:
    out.append(1)  # little-endian
    tid = _TYPE_IDS[type(geom)]
    out += struct.pack("<I", tid)
    if isinstance(geom, Point):
        out += struct.pack("<2d", geom.x, geom.y)
    elif isinstance(geom, LineString):
        out += struct.pack("<I", len(geom.coords))
        out += geom.coords.astype("<f8").tobytes()
    elif isinstance(geom, Polygon):
        rings = geom.rings
        out += struct.pack("<I", len(rings))
        for r in rings:
            out += struct.pack("<I", len(r))
            out += np.asarray(r, dtype="<f8").tobytes()
    else:  # multi / collection
        out += struct.pack("<I", len(geom.geoms))
        for g in geom.geoms:
            _wkb_write_into(g, out)


def wkb_read(buf: bytes) -> Geometry:
    geom, _ = _wkb_read_at(memoryview(buf), 0)
    return geom


def _wkb_read_at(mv: memoryview, off: int):
    big = mv[off] == 0
    endian = ">" if big else "<"
    (tid,) = struct.unpack_from(endian + "I", mv, off + 1)
    off += 5
    if tid & 0xC0000000:
        # EWKB Z (0x80000000) / M (0x40000000): extra coordinates per
        # vertex — silently reading 2 of 3 doubles would corrupt shapes
        raise NotImplementedError("EWKB Z/M coordinates are not supported")
    if tid & 0x20000000:
        off += 4  # EWKB SRID flag: a 4-byte SRID payload precedes coords
    tid = tid & 0xFF  # strip consumed flag bits (2D only)
    if tid == WKB_POINT:
        x, y = struct.unpack_from(endian + "2d", mv, off)
        return Point(x, y), off + 16
    if tid == WKB_LINESTRING:
        (n,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        coords = np.frombuffer(mv, dtype=endian + "f8", count=2 * n, offset=off).reshape(-1, 2)
        return LineString(coords.copy()), off + 16 * n
    if tid == WKB_POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "I", mv, off)
            off += 4
            coords = np.frombuffer(mv, dtype=endian + "f8", count=2 * n, offset=off).reshape(-1, 2)
            rings.append(coords.copy())
            off += 16 * n
        if not rings:
            return Polygon(np.zeros((0, 2))), off
        return Polygon(rings[0], rings[1:]), off
    if tid in (WKB_MULTIPOINT, WKB_MULTILINESTRING, WKB_MULTIPOLYGON, WKB_GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(endian + "I", mv, off)
        off += 4
        geoms = []
        for _ in range(n):
            g, off = _wkb_read_at(mv, off)
            geoms.append(g)
        cls = {WKB_MULTIPOINT: MultiPoint, WKB_MULTILINESTRING: MultiLineString,
               WKB_MULTIPOLYGON: MultiPolygon, WKB_GEOMETRYCOLLECTION: GeometryCollection}[tid]
        return cls(geoms), off
    raise ValueError(f"unsupported WKB type id {tid}")


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_coord_seq(s: str) -> np.ndarray:
    pts = []
    for pair in s.split(","):
        xy = pair.split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64)


def _split_parens(s: str) -> list[str]:
    """Split a top-level comma-separated list of parenthesized groups."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def wkt_read(wkt: str) -> Geometry:
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(EMPTY|\(.*\))\s*$", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {wkt!r}")
    typ = m.group(1).upper()
    body = m.group(2)
    empty = body == "EMPTY"
    inner = body[1:-1].strip() if not empty else ""
    if typ == "POINT":
        if empty:
            return Point(np.nan, np.nan)
        xy = inner.split()
        return Point(float(xy[0]), float(xy[1]))
    if typ == "LINESTRING":
        return LineString(np.zeros((0, 2)) if empty else _parse_coord_seq(inner))
    if typ == "POLYGON":
        if empty:
            return Polygon(np.zeros((0, 2)))
        rings = [_parse_coord_seq(g) for g in _split_parens(inner)]
        return Polygon(rings[0], rings[1:])
    if typ == "MULTIPOINT":
        if empty:
            return MultiPoint([])
        if "(" in inner:
            pts = [_parse_coord_seq(g)[0] for g in _split_parens(inner)]
        else:
            pts = _parse_coord_seq(inner)
        return MultiPoint([Point(p[0], p[1]) for p in pts])
    if typ == "MULTILINESTRING":
        if empty:
            return MultiLineString([])
        return MultiLineString([LineString(_parse_coord_seq(g)) for g in _split_parens(inner)])
    if typ == "MULTIPOLYGON":
        if empty:
            return MultiPolygon([])
        polys = []
        depth, start = 0, None
        groups = []
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    groups.append(inner[start : i + 1])
        for g in groups:
            rings = [_parse_coord_seq(r) for r in _split_parens(g[1:-1])]
            polys.append(Polygon(rings[0], rings[1:]))
        return MultiPolygon(polys)
    if typ == "GEOMETRYCOLLECTION":
        if empty:
            return GeometryCollection([])
        geoms, depth, start = [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                geoms.append(wkt_read(inner[start:i]))
                start = i + 1
        geoms.append(wkt_read(inner[start:]))
        return GeometryCollection(geoms)
    raise ValueError(f"unsupported WKT type {typ}")


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _coords_wkt(coords: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in coords)


def wkt_write(geom: Geometry) -> str:
    if isinstance(geom, Point):
        if geom.is_empty():
            return "POINT EMPTY"
        return f"POINT ({_fmt(geom.x)} {_fmt(geom.y)})"
    if isinstance(geom, LineString):
        if geom.is_empty():
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_coords_wkt(geom.coords)})"
    if isinstance(geom, Polygon):
        if geom.is_empty():
            return "POLYGON EMPTY"
        rings = ", ".join(f"({_coords_wkt(r)})" for r in geom.rings)
        return f"POLYGON ({rings})"
    if isinstance(geom, MultiPoint):
        if geom.is_empty():
            return "MULTIPOINT EMPTY"
        return "MULTIPOINT (" + ", ".join(f"({_fmt(g.x)} {_fmt(g.y)})" for g in geom.geoms) + ")"
    if isinstance(geom, MultiLineString):
        if geom.is_empty():
            return "MULTILINESTRING EMPTY"
        return "MULTILINESTRING (" + ", ".join(f"({_coords_wkt(g.coords)})" for g in geom.geoms) + ")"
    if isinstance(geom, MultiPolygon):
        if geom.is_empty():
            return "MULTIPOLYGON EMPTY"
        parts = []
        for p in geom.geoms:
            rings = ", ".join(f"({_coords_wkt(r)})" for r in p.rings)
            parts.append(f"({rings})")
        return "MULTIPOLYGON (" + ", ".join(parts) + ")"
    if isinstance(geom, GeometryCollection):
        if geom.is_empty():
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(wkt_write(g) for g in geom.geoms) + ")"
    raise ValueError(f"unsupported geometry {geom}")


# --------------------------------------------------------------------------
# GeoJSON (output only; no CRS, matching st_asGeoJSON)
# --------------------------------------------------------------------------

def geojson_write(geom: Geometry) -> str:
    import json

    def coords(g):
        if isinstance(g, Point):
            return [g.x, g.y]
        if isinstance(g, LineString):
            return g.coords.tolist()
        if isinstance(g, Polygon):
            return [r.tolist() for r in g.rings]
        if isinstance(g, (MultiPoint, MultiLineString, MultiPolygon)):
            return [coords(x) for x in g.geoms]
        raise ValueError(g)

    if isinstance(geom, GeometryCollection):
        return json.dumps(
            {"type": "GeometryCollection", "geometries": [
                __import__("json").loads(geojson_write(g)) for g in geom.geoms]},
            separators=(",", ":"),
        )
    name = {Point: "Point", LineString: "LineString", Polygon: "Polygon",
            MultiPoint: "MultiPoint", MultiLineString: "MultiLineString",
            MultiPolygon: "MultiPolygon"}[type(geom)]
    return __import__("json").dumps({"type": name, "coordinates": coords(geom)},
                                    separators=(",", ":"))


def wkb_batch_envrect(bufs):
    """Vectorized envelope + axis-rect extraction for a BATCH of WKB
    buffers — the refine-side fast path that avoids building one Python
    Geometry object per row.

    Returns ``(env, rect, ok)``: ``env`` is an (n, 4) float64 array of
    (xmin, ymin, xmax, ymax); ``rect[i]`` is True iff buffer i is a
    closed 5-point single-ring polygon whose xs/ys take only the
    envelope values (the `_is_axis_rect` rule, degenerate rects
    included); ``ok[i]`` is False when buffer i is None or not a plain
    little-endian single-ring 2D POLYGON — those rows carry no data here
    and need :func:`wkb_read`.

    Buffers are grouped by byte length; each uniform group decodes with
    a handful of whole-group numpy ops (stack bytes -> verify the twelve
    structural header bytes -> view the coordinate doubles), so the cost
    is ~O(total bytes) with no per-row Python beyond the grouping
    itself.
    """
    n = len(bufs)
    env = np.zeros((n, 4), dtype=np.float64)
    rect = np.zeros(n, dtype=bool)
    ok = np.zeros(n, dtype=bool)
    if n == 0:
        return env, rect, ok
    lens = np.fromiter((len(b) if b is not None else -1 for b in bufs),
                       dtype=np.int64, count=n)
    order = np.argsort(lens, kind="stable")
    slens = lens[order]
    cuts = np.r_[0, np.where(slens[1:] != slens[:-1])[0] + 1, n]
    for s, e in zip(cuts[:-1], cuts[1:]):
        ln = int(slens[s])
        if ln < 13 + 16 * 4 or (ln - 13) % 16:
            continue  # too short for a ring, or not a single-ring layout
        nv = (ln - 13) // 16
        idx = order[s:e]
        mat = np.frombuffer(b"".join(bufs[i] for i in idx),
                            dtype=np.uint8).reshape(len(idx), ln)
        hdr = np.zeros(13, dtype=np.uint8)
        hdr[0] = 1                                   # little-endian
        hdr[1:5] = np.frombuffer(struct.pack("<I", WKB_POLYGON), np.uint8)
        hdr[5:9] = np.frombuffer(struct.pack("<I", 1), np.uint8)   # 1 ring
        hdr[9:13] = np.frombuffer(struct.pack("<I", nv), np.uint8)
        good = (mat[:, :13] == hdr[None, :]).all(axis=1)
        if not good.any():
            continue
        coords = mat[:, 13:].copy().view("<f8").reshape(len(idx), nv, 2)
        xs, ys = coords[:, :, 0], coords[:, :, 1]
        genv = np.column_stack([xs.min(axis=1), ys.min(axis=1),
                                xs.max(axis=1), ys.max(axis=1)])
        env[idx[good]] = genv[good]
        ok[idx[good]] = True
        if nv == 5:
            # exact mirror of _is_axis_rect: every x is xmin or xmax and
            # every y is ymin or ymax (no closure requirement)
            x_ok = ((xs == genv[:, 0:1]) | (xs == genv[:, 2:3])).all(axis=1)
            y_ok = ((ys == genv[:, 1:2]) | (ys == genv[:, 3:4])).all(axis=1)
            isr = good & x_ok & y_ok
            rect[idx[isr]] = True
    return env, rect, ok
