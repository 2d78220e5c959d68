"""(E)CQL front-end: parse an ECQL filter string, compile it to a Spark
SQL expression over the registered ``st_*`` surface, and extract the
spatial/temporal bounds the store planner prefilters with.

The reference's query front door is GeoTools (E)CQL; its planner pulls
per-attribute geometry bounds and time intervals out of the filter tree
(geomesa-filter FilterHelper.scala:101-135 geometries with OR->union /
AND->intersection, :146-197 intervals) before any index scan. This module
is that surface for Spark: a reference user's filter string runs
unchanged —

    cql_filter(df, "BBOX(geom, -75, 39, -72, 41) AND kind IN ('a','b')")

Supported grammar (the subset the reference's docs/tests exercise):

- comparisons  =  <>  <  <=  >  >=, BETWEEN..AND, IN (...), LIKE/ILIKE,
  IS [NOT] NULL on attributes vs literals
- logical AND / OR / NOT, parentheses, INCLUDE / EXCLUDE
- spatial: BBOX(attr, x0, y0, x1, y1), INTERSECTS / DISJOINT / CONTAINS /
  WITHIN / TOUCHES / CROSSES / OVERLAPS / EQUALS / COVERS / COVEREDBY
  (attr, <WKT>), DWITHIN / BEYOND (attr, <WKT>, dist, units)
- temporal: attr DURING t1/t2, attr BEFORE t, attr AFTER t  (ISO-8601)

DWITHIN compiles to geodesic meters (``st_distanceSphere``) matching the
reference's CQL DWITHIN semantics (GeometryProcessing.scala:143-146);
units meters/kilometers/feet accepted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..geom.wkb import wkt_read

__all__ = ["parse_cql", "cql_to_sql", "cql_filter", "extract_bounds",
           "CqlError"]


class CqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer

_GEOM_KEYWORDS = ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
                  "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")
_SPATIAL_FNS = ("BBOX", "INTERSECTS", "DISJOINT", "CONTAINS", "WITHIN",
                "TOUCHES", "CROSSES", "OVERLAPS", "EQUALS", "COVERS",
                "COVEREDBY", "DWITHIN", "BEYOND")
_KEYWORDS = ("AND", "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN", "IS",
             "NULL", "INCLUDE", "EXCLUDE", "DURING", "BEFORE", "AFTER",
             "TRUE", "FALSE")

_TS_RE = r"\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?)?"
_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<ts>""" + _TS_RE + r""")
  | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<op><>|<=|>=|[=<>(),/])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
""", re.VERBOSE)


@dataclass
class _Tok:
    kind: str   # ts num str op ident kw geomkw spatialfn
    text: str


def _tokenize(s: str) -> list[_Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise CqlError(f"bad character at {i}: {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident":
            up = text.upper()
            if up in _GEOM_KEYWORDS:
                kind, text = "geomkw", up
            elif up in _SPATIAL_FNS:
                kind, text = "spatialfn", up
            elif up in _KEYWORDS:
                kind, text = "kw", up
        out.append(_Tok(kind, text))
    return out


# ---------------------------------------------------------------------------
# AST

@dataclass
class Node:
    pass


@dataclass
class Logic(Node):
    op: str                  # AND | OR | NOT
    args: list = field(default_factory=list)


@dataclass
class Cmp(Node):
    op: str                  # = <> < <= > >= LIKE ILIKE IN BETWEEN ISNULL ISNOTNULL
    attr: str = ""
    values: list = field(default_factory=list)


@dataclass
class Spatial(Node):
    fn: str                  # BBOX INTERSECTS ... DWITHIN BEYOND
    attr: str = ""
    wkt: str = ""            # literal geometry WKT (BBOX stores the poly)
    bbox: tuple | None = None
    meters: float | None = None


@dataclass
class Temporal(Node):
    op: str                  # DURING BEFORE AFTER
    attr: str = ""
    t0: str = ""
    t1: str = ""


@dataclass
class Const(Node):
    value: bool = True


_UNITS = {"meters": 1.0, "metre": 1.0, "metres": 1.0, "m": 1.0,
          "kilometers": 1000.0, "km": 1000.0, "feet": 0.3048}


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise CqlError("unexpected end of filter")
        self.i += 1
        return t

    def expect(self, text: str) -> _Tok:
        t = self.next()
        if t.text.upper() != text:
            raise CqlError(f"expected {text}, got {t.text!r}")
        return t

    # --- grammar ---------------------------------------------------------

    def parse(self) -> Node:
        n = self.or_expr()
        if self.peek() is not None:
            raise CqlError(f"trailing input at {self.peek().text!r}")
        return n

    def or_expr(self) -> Node:
        args = [self.and_expr()]
        while self.peek() and self.peek().text == "OR":
            self.next()
            args.append(self.and_expr())
        return args[0] if len(args) == 1 else Logic("OR", args)

    def and_expr(self) -> Node:
        args = [self.not_expr()]
        while self.peek() and self.peek().text == "AND":
            self.next()
            args.append(self.not_expr())
        return args[0] if len(args) == 1 else Logic("AND", args)

    def not_expr(self) -> Node:
        if self.peek() and self.peek().text == "NOT":
            self.next()
            return Logic("NOT", [self.not_expr()])
        return self.primary()

    def primary(self) -> Node:
        t = self.peek()
        if t is None:
            raise CqlError("unexpected end of filter")
        if t.text == "(":
            self.next()
            n = self.or_expr()
            self.expect(")")
            return n
        if t.kind == "kw" and t.text in ("INCLUDE", "EXCLUDE"):
            self.next()
            return Const(t.text == "INCLUDE")
        if t.kind == "spatialfn":
            return self.spatial()
        if t.kind == "ident":
            return self.attr_predicate()
        raise CqlError(f"unexpected token {t.text!r}")

    def attr_predicate(self) -> Node:
        attr = self.next().text
        t = self.next()
        up = t.text.upper()
        if up in ("=", "<>", "<", "<=", ">", ">="):
            return Cmp(up, attr, [self.literal()])
        if up in ("LIKE", "ILIKE"):
            return Cmp(up, attr, [self.literal()])
        if up == "IN":
            self.expect("(")
            vals = [self.literal()]
            while self.peek() and self.peek().text == ",":
                self.next()
                vals.append(self.literal())
            self.expect(")")
            return Cmp("IN", attr, vals)
        if up == "BETWEEN":
            lo = self.literal()
            self.expect("AND")
            hi = self.literal()
            return Cmp("BETWEEN", attr, [lo, hi])
        if up == "IS":
            if self.peek() and self.peek().text == "NOT":
                self.next()
                self.expect("NULL")
                return Cmp("ISNOTNULL", attr)
            self.expect("NULL")
            return Cmp("ISNULL", attr)
        if up == "DURING":
            t0 = self.next()
            self.expect("/")
            t1 = self.next()
            return Temporal("DURING", attr, t0.text, t1.text)
        if up in ("BEFORE", "AFTER"):
            return Temporal(up, attr, self.next().text)
        raise CqlError(f"unexpected operator {t.text!r} after {attr!r}")

    def literal(self):
        t = self.next()
        if t.kind == "num":
            return float(t.text) if ("." in t.text or "e" in t.text.lower()) \
                else int(t.text)
        if t.kind == "str":
            return t.text[1:-1].replace("''", "'")
        if t.kind == "ts":
            return ("ts", t.text)
        if t.kind == "kw" and t.text in ("TRUE", "FALSE"):
            return t.text == "TRUE"
        raise CqlError(f"expected literal, got {t.text!r}")

    def spatial(self) -> Node:
        fn = self.next().text
        self.expect("(")
        attr = self.next().text
        self.expect(",")
        if fn == "BBOX":
            vals = []
            for k in range(4):
                vals.append(float(self.next().text))
                if k < 3:
                    self.expect(",")
            if self.peek() and self.peek().text == ",":  # optional CRS
                self.next()
                self.next()
            self.expect(")")
            x0, y0, x1, y1 = vals
            if y0 > y1:
                raise CqlError(f"BBOX ymin > ymax: {y0} > {y1}")

            def box(a, b):
                wkt = (f"POLYGON(({a} {y0}, {a} {y1}, {b} {y1}, "
                       f"{b} {y0}, {a} {y0}))")
                return Spatial("INTERSECTS", attr, wkt, bbox=(a, y0, b, y1))

            if x0 > x1:
                # dateline-crossing window: split at the antimeridian
                # (the reference's addWayPointsToBBOX / IDL handling)
                return Logic("OR", [box(x0, 180.0), box(-180.0, x1)])
            return box(x0, x1)
        wkt = self.wkt_literal()
        if fn in ("DWITHIN", "BEYOND"):
            self.expect(",")
            dist = float(self.next().text)
            self.expect(",")
            unit = self.next().text.lower()
            if unit not in _UNITS:
                raise CqlError(f"unknown DWITHIN unit {unit!r}")
            self.expect(")")
            g = wkt_read(wkt)
            return Spatial(fn, attr, wkt, bbox=g.envelope(),
                           meters=dist * _UNITS[unit])
        self.expect(")")
        g = wkt_read(wkt)  # validates
        return Spatial(fn, attr, wkt, bbox=g.envelope())

    def wkt_literal(self) -> str:
        t = self.next()
        if t.kind != "geomkw":
            raise CqlError(f"expected a WKT geometry, got {t.text!r}")
        parts = [t.text]
        depth = 0
        self.expect("(")
        parts.append("(")
        depth = 1
        while depth > 0:
            nt = self.next()
            if nt.text == "(":
                depth += 1
            elif nt.text == ")":
                depth -= 1
            parts.append(nt.text)
        # re-space: numbers separated by space, punctuation tight
        out = []
        for p in parts:
            if out and p not in ("(", ")", ",") and out[-1] not in ("(", ","):
                out.append(" ")
            out.append(p)
        return "".join(out)


def parse_cql(s: str) -> Node:
    return _Parser(_tokenize(s)).parse()


# ---------------------------------------------------------------------------
# compile -> Spark SQL

_SPATIAL_SQL = {
    "INTERSECTS": "st_intersects",
    "DISJOINT": "st_disjoint",
    "CONTAINS": "st_contains",
    "WITHIN": "st_within",
    "TOUCHES": "st_touches",
    "CROSSES": "st_crosses",
    "OVERLAPS": "st_overlaps",
    "EQUALS": "st_equals",
    "COVERS": "st_covers",
    "COVEREDBY": "st_coveredBy",
}


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, tuple) and v[0] == "ts":
        return f"TIMESTAMP '{v[1].replace('T', ' ').rstrip('Z')}'"
    return "'" + str(v).replace("'", "''") + "'"


def _to_sql(n: Node) -> str:
    if isinstance(n, Const):
        return "TRUE" if n.value else "FALSE"
    if isinstance(n, Logic):
        if n.op == "NOT":
            return f"(NOT {_to_sql(n.args[0])})"
        return "(" + f" {n.op} ".join(_to_sql(a) for a in n.args) + ")"
    if isinstance(n, Cmp):
        a = n.attr
        if n.op in ("=", "<>", "<", "<=", ">", ">="):
            return f"({a} {n.op} {_sql_lit(n.values[0])})"
        if n.op == "LIKE":
            return f"({a} LIKE {_sql_lit(n.values[0])})"
        if n.op == "ILIKE":
            return f"(lower({a}) LIKE lower({_sql_lit(n.values[0])}))"
        if n.op == "IN":
            return f"({a} IN (" + ", ".join(_sql_lit(v) for v in n.values) + "))"
        if n.op == "BETWEEN":
            return (f"({a} BETWEEN {_sql_lit(n.values[0])} "
                    f"AND {_sql_lit(n.values[1])})")
        if n.op == "ISNULL":
            return f"({a} IS NULL)"
        if n.op == "ISNOTNULL":
            return f"({a} IS NOT NULL)"
    if isinstance(n, Spatial):
        lit = f"st_geomFromWKT('{n.wkt}')"
        # inclusive <=, matching st_dwithin / JTS isWithinDistance;
        # BEYOND is its exact complement so the two are exhaustive at
        # the boundary distance
        if n.fn == "DWITHIN":
            return f"(st_distanceSphere({n.attr}, {lit}) <= {n.meters!r})"
        if n.fn == "BEYOND":
            return f"(st_distanceSphere({n.attr}, {lit}) > {n.meters!r})"
        return f"({_SPATIAL_SQL[n.fn]}({n.attr}, {lit}))"
    if isinstance(n, Temporal):
        if n.op == "DURING":
            return (f"({n.attr} > {_sql_lit(('ts', n.t0))} AND "
                    f"{n.attr} < {_sql_lit(('ts', n.t1))})")
        op = "<" if n.op == "BEFORE" else ">"
        return f"({n.attr} {op} {_sql_lit(('ts', n.t0))})"
    raise CqlError(f"cannot compile {n!r}")


def cql_to_sql(cql: str) -> str:
    """ECQL filter string -> Spark SQL boolean expression (uses the
    registered st_* functions for spatial predicates)."""
    return _to_sql(parse_cql(cql))


def cql_filter(df, cql: str):
    """df.filter(<compiled ECQL>). Requires register_functions(spark) when
    the filter uses spatial predicates."""
    from pyspark.sql import functions as F

    return df.filter(F.expr(cql_to_sql(cql)))


# ---------------------------------------------------------------------------
# planner bounds extraction (FilterHelper.extractGeometries/intervals)

_WORLD = (-180.0, -90.0, 180.0, 90.0)


def _bbox_intersect(a, b):
    if a is None or b is None:
        return None
    r = (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))
    return r if r[0] <= r[2] and r[1] <= r[3] else None


def _expand_for_dwithin(bbox, meters):
    """Conservative window expansion — reuses the join cover's rule so
    both prefilters over-cover the same spherical disk (an under-expanded
    window silently drops rows the exact predicate accepts).

    Returns a LIST of windows: a disk whose expansion crosses the
    antimeridian splits into the two wrapped windows (the same IDL
    handling the BBOX parser applies) — clamping at +-180 would prune
    rows on the far side of the dateline that the exact predicate
    accepts."""
    import numpy as np

    from ..operators.spatial_join import sphere_expand_degrees

    x0, y0, x1, y1 = bbox
    phi_edge = max(abs(y0), abs(y1))
    dlon, dlat = sphere_expand_degrees(np.array([phi_edge]), float(meters))
    dlon, dlat = float(dlon[0]), float(dlat[0])
    ylo, yhi = max(y0 - dlat, -90.0), min(y1 + dlat, 90.0)
    xlo, xhi = x0 - dlon, x1 + dlon
    if xhi - xlo >= 360.0:
        return [(-180.0, ylo, 180.0, yhi)]
    out = [(max(xlo, -180.0), ylo, min(xhi, 180.0), yhi)]
    if xlo < -180.0:
        out.append((xlo + 360.0, ylo, 180.0, yhi))
    if xhi > 180.0:
        out.append((-180.0, ylo, xhi - 360.0, yhi))
    return out


def extract_bounds(cql: str, geom_attr: str):
    """Conservative per-attribute bbox windows for the scan prefilter.

    Returns a list of (xmin, ymin, xmax, ymax) windows whose union covers
    every row the filter can accept, or None when the filter is unbounded
    for ``geom_attr`` (whole-world scan). AND intersects windows, OR
    unions them, NOT/negative predicates are unbounded — the reference's
    FilterHelper semantics. An empty list means provably-empty (disjoint
    AND), the planner's empty-scan short-circuit.
    """
    def walk(n) -> list | None:      # None = unbounded
        if isinstance(n, Const):
            return None if n.value else []
        if isinstance(n, Spatial) and n.attr == geom_attr:
            if n.fn in ("DISJOINT", "BEYOND"):
                return None
            if n.fn == "DWITHIN":
                return _expand_for_dwithin(n.bbox, n.meters)
            return [tuple(n.bbox)]
        if isinstance(n, Logic):
            if n.op == "NOT":
                return None
            parts = [walk(a) for a in n.args]
            if n.op == "OR":
                if any(p is None for p in parts):
                    return None
                return [w for p in parts for w in p]
            # AND: intersect every bounded part pairwise (cross product of
            # OR-unions); unbounded parts drop out
            bounded = [p for p in parts if p is not None]
            if not bounded:
                return None
            acc = bounded[0]
            for p in bounded[1:]:
                acc = [w for a in acc for b in p
                       if (w := _bbox_intersect(a, b)) is not None]
                if not acc:
                    return []
            return acc
        return None

    return walk(parse_cql(cql))
