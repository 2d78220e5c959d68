"""General simple-polygon intersection by boundary stitching.

Closes the documented st_intersection convex-clip limitation
(functions/registry.py) for NON-convex simple polygons: the boundary of
A ∩ B is (∂A clipped to inside-B) ∪ (∂B clipped to inside-A), and with
both shells oriented CCW and all crossings transversal, every crossing
point has exactly one incoming and one outgoing boundary piece — so the
result rings stitch together by walking endpoint-to-endpoint (the
tracing phase of Greiner-Hormann, "Efficient clipping of arbitrary
polygons", ACM TOG 1998, operating on pre-clipped pieces).

Reference parity: JTS OverlayNG semantics for POLYGON/POLYGON
intersection of simple shells (geomesa relies on JTS overlay via
st_intersection, geomesa-spark-jts SpatialRelationFunctions.scala).

Degenerate inputs raise NotImplementedError instead of risking a wrong
answer: holes, collinear-overlapping edges, and non-transversal
tangencies (stitch nodes with degree != 2). Touch-only contact (single
point / shared vertex, no interior overlap) returns [] — the area-0
intersection is reported empty rather than as a degenerate geometry.

Every coordinate that two pieces must share is computed ONCE
(_seg_intersections per segment pair; piece endpoints reuse the stored
cut coordinate, never a re-interpolation), so stitch keys match
bit-exactly with no tolerance machinery.
"""

from __future__ import annotations

import numpy as np

from . import kernels as K
from .measures import ring_area
from .wkb import Polygon

__all__ = ["poly_poly_intersection", "poly_poly_difference"]


def _ccw_shell(poly: Polygon) -> np.ndarray:
    s = poly.shell
    return s[::-1].copy() if ring_area(s) < 0 else s


def _segment_cuts(ra: np.ndarray, rb: np.ndarray):
    """All transversal cut points between two closed rings.

    Returns (cuts_a, cuts_b): dicts mapping segment index -> list of cut
    coordinate tuples (shared objects between the two dicts). Raises on
    collinear overlap.
    """
    cuts_a: dict[int, list] = {}
    cuts_b: dict[int, list] = {}
    for i in range(len(ra) - 1):
        for j in range(len(rb) - 1):
            kind, pts = K._seg_intersections(ra[i], ra[i + 1], rb[j], rb[j + 1])
            if kind == "overlap":
                raise NotImplementedError(
                    "st_intersection: polygons share collinear boundary")
            if kind == "point":
                p = (float(pts[0][0]), float(pts[0][1]))
                cuts_a.setdefault(i, []).append(p)
                cuts_b.setdefault(j, []).append(p)
    return cuts_a, cuts_b


def _inside_pieces(ring: np.ndarray, cuts: dict[int, list],
                   other: Polygon, keep_inside: bool = True) -> list[list[tuple]]:
    """Maximal runs of ``ring``'s boundary strictly inside (or, with
    ``keep_inside=False``, strictly outside) ``other``.

    Each piece is a list of (x, y) tuples; endpoints are original ring
    vertices or stored cut coordinates (exact shared objects).
    """
    sub = []  # flat list of kept subsegments in traversal order, or None
    for i in range(len(ring) - 1):
        a = (float(ring[i, 0]), float(ring[i, 1]))
        b = (float(ring[i + 1, 0]), float(ring[i + 1, 1]))
        dx, dy = b[0] - a[0], b[1] - a[1]
        L2 = dx * dx + dy * dy
        if L2 == 0:
            continue
        pts = [a, b] + list(cuts.get(i, ()))
        ts = [((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / L2 for p in pts]
        order = sorted(range(len(pts)), key=lambda k: ts[k])
        seq = []
        for k in order:  # dedupe identical coordinates (cut == vertex)
            if not seq or pts[k] != seq[-1]:
                seq.append(pts[k])
        for p0, p1 in zip(seq[:-1], seq[1:]):
            mx, my = (p0[0] + p1[0]) / 2.0, (p0[1] + p1[1]) / 2.0
            loc = K._locate_point_in_polys(mx, my, [other])
            if loc == 0:
                raise NotImplementedError(
                    "overlay: boundary-tangent subsegment")
            keep = (loc > 0) if keep_inside else (loc < 0)
            sub.append((p0, p1) if keep else None)
    # merge consecutive kept subsegments into maximal pieces
    pieces: list[list[tuple]] = []
    for seg in sub:
        if seg is None:
            pieces.append(None)  # type: ignore[arg-type]
            continue
        if pieces and pieces[-1] is not None and pieces[-1][-1] == seg[0]:
            pieces[-1].append(seg[1])
        else:
            pieces.append([seg[0], seg[1]])
    pieces = [p for p in pieces if p is not None]
    # wrap-around: last piece may continue into the first (ring closure)
    if len(pieces) > 1 and pieces[-1][-1] == pieces[0][0]:
        pieces[0] = pieces.pop()[:-1] + pieces[0]
    return pieces


def poly_poly_intersection(pa: Polygon, pb: Polygon) -> list[np.ndarray]:
    """Intersection region of two simple polygons (no holes).

    Returns a list of closed CCW rings (possibly several for non-convex
    inputs whose overlap is disconnected); [] when the intersection has
    no interior. See module docstring for the raised degenerate cases.
    """
    if pa.holes or pb.holes:
        raise NotImplementedError("st_intersection: polygons with holes")
    ra, rb = _ccw_shell(pa), _ccw_shell(pb)
    qa, qb = Polygon(ra), Polygon(rb)
    if K.covered_by(qa, qb):
        return [ra]
    if K.covered_by(qb, qa):
        return [rb]
    if K.disjoint(qa, qb):
        return []
    cuts_a, cuts_b = _segment_cuts(ra, rb)
    pieces = _inside_pieces(ra, cuts_a, qb) + _inside_pieces(rb, cuts_b, qa)
    if not pieces:
        return []  # touch-only contact: no interior overlap
    rings = []
    for ring in _stitch(pieces):
        a = ring_area(ring)
        if a < 0:
            raise NotImplementedError(
                "st_intersection: inconsistent overlay orientation")
        if a > 0:
            rings.append(ring)
    return rings


def _stitch(pieces: list[list[tuple]]) -> list[np.ndarray]:
    """Walk boundary pieces endpoint-to-endpoint into closed rings."""
    starts: dict[tuple, list[int]] = {}
    for idx, p in enumerate(pieces):
        starts.setdefault(p[0], []).append(idx)
    used = [False] * len(pieces)
    rings: list[np.ndarray] = []
    for idx in range(len(pieces)):
        if used[idx]:
            continue
        coords = list(pieces[idx])
        used[idx] = True
        while coords[-1] != coords[0]:
            nxt = [k for k in starts.get(coords[-1], ()) if not used[k]]
            if len(nxt) != 1:
                raise NotImplementedError(
                    "overlay: non-transversal tangency")
            used[nxt[0]] = True
            coords.extend(pieces[nxt[0]][1:])
        rings.append(np.asarray(coords, dtype=np.float64))
    return rings


def poly_poly_difference(pa: Polygon, pb: Polygon) -> list[Polygon]:
    """Difference A \\ B of two simple polygons (no holes in inputs).

    Boundary of A \\ B = (∂A strictly outside B, forward) ∪ (∂B strictly
    inside A, REVERSED). Stitched cycles with positive area are result
    shells (CCW); negative cycles are holes (CW) and attach to the shell
    whose interior contains them — e.g. B strictly inside A yields A
    with hole B. Returns a list of Polygons; [] when A ⊆ B. Same
    degenerate-input behavior as poly_poly_intersection.
    """
    if pa.holes or pb.holes:
        raise NotImplementedError("st_difference: polygons with holes")
    ra, rb = _ccw_shell(pa), _ccw_shell(pb)
    qa, qb = Polygon(ra), Polygon(rb)
    if K.disjoint(qa, qb):
        return [qa]
    if K.covered_by(qa, qb):
        return []
    cuts_a, cuts_b = _segment_cuts(ra, rb)
    if not cuts_a:
        # no boundary crossings: B strictly inside A (other cases were
        # short-circuited above)
        return [Polygon(ra, holes=[rb[::-1].copy()])]
    pieces = _inside_pieces(ra, cuts_a, qb, keep_inside=False)
    pieces += [p[::-1] for p in _inside_pieces(rb, cuts_b, qa)]
    if not pieces:
        return []
    shells: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    for ring in _stitch(pieces):
        a = ring_area(ring)
        if a == 0:
            continue  # collinear-cut sliver: no interior either way
                      # (the intersection path drops these identically)
        (shells if a > 0 else holes).append(ring)
    out = [Polygon(s) for s in shells]
    for h in holes:
        owner = [p for p in out
                 if K._locate_point_in_polys(
                     *_ring_interior_probe(h), [p]) == 1]
        if len(owner) != 1:
            raise NotImplementedError(
                "st_difference: ambiguous hole assignment")
        owner[0].holes.append(h)
    return out


def _ring_interior_probe(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside the region a CW hole ring bounds."""
    from .kernels import _interior_point
    return _interior_point(Polygon(ring[::-1].copy()))
