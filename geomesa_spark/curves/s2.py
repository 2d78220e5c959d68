"""S2 cell ids: cube-face Hilbert curve over the sphere.

Alternate cell scheme to Z2 (the reference's S2SFC,
geomesa-z3/.../curve/S2SFC.scala:17-78, wraps the S2 library; this is a
from-scratch pure-numpy implementation of the public S2 cell-id scheme:
unit sphere -> cube face (u,v) -> quadratic (s,t) -> leaf (i,j) ->
face<<61 | 2*hilbert_pos | 1, parents by trailing-bit truncation).

Vectorized: Hilbert position built 4 bits of (i,j) at a time through the
standard lookup tables.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4

_SWAP = 1
_INVERT = 2
# canonical sub-cell traversal: position -> (i, j) within a 2x2 block
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],  # canonical order
    [0, 2, 3, 1],  # swap
    [3, 2, 0, 1],  # invert
    [3, 1, 0, 2],  # swap | invert
], dtype=np.int64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


def _build_lookup():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)

    def rec(level, i, j, orig_orient, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        for sub_pos in range(4):
            ij = _POS_TO_IJ[orient][sub_pos]
            rec(level + 1, (i << 1) + (ij >> 1), (j << 1) + (ij & 1),
                orig_orient, (pos << 2) + sub_pos,
                orient ^ _POS_TO_ORIENT[sub_pos])

    for o in range(4):
        rec(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookup()


def _xyz_from_lonlat(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2)).astype(np.int64)
    face = face + np.where(
        (face == 0) & (x < 0), 3, np.where(
            (face == 1) & (y < 0), 3, np.where((face == 2) & (z < 0), 3, 0)))
    # u/v per face (s2geometry face conventions)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
        (lambda: y / x, lambda: z / x, None),        # face 0: +x
        (lambda: -x / y, lambda: z / y, None),       # face 1: +y
        (lambda: -x / z, lambda: -y / z, None),      # face 2: +z
        (lambda: z / x, lambda: y / x, None),        # face 3: -x
        (lambda: z / y, lambda: -x / y, None),       # face 4: -y
        (lambda: -y / z, lambda: -x / z, None),      # face 5: -z
    ]):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _st_from_uv(u):
    # clamp both branch args: np.where evaluates both sides, and the
    # unused branch would take sqrt of a negative for |u| > 1/3
    return np.where(u >= 0, 0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def _ij_from_st(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def cell_id_from_lonlat(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """(lon, lat) arrays -> int64 S2 cell ids at ``level``."""
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))

    n = np.zeros(np.shape(i), dtype=np.uint64)
    bits = (face & _SWAP).astype(np.int64)  # initial orientation
    pos = np.zeros(np.shape(i), dtype=np.uint64)
    # 30 bits of i/j in 4-bit blocks, MSB first (8 blocks covering 32 bits,
    # top 2 bits are zero)
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        ib = (i >> (k * _LOOKUP_BITS)) & mask
        jb = (j >> (k * _LOOKUP_BITS)) & mask
        key = (((ib << _LOOKUP_BITS) + jb) << 2) + bits
        val = _LOOKUP_POS[key]
        pos = (pos << np.uint64(2 * _LOOKUP_BITS)) | (val >> 2).astype(np.uint64)
        bits = val & 3
    # pos currently has 2*32 bits worth of curve position; top 4 are zero;
    # keep the 2*MAX_LEVEL significant bits
    pos &= np.uint64((1 << (2 * MAX_LEVEL)) - 1)

    cell = (face.astype(np.uint64) << np.uint64(2 * MAX_LEVEL + 1)) | (pos << np.uint64(1)) | np.uint64(1)
    if level < MAX_LEVEL:
        lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        cell = (cell & (~(lsb - np.uint64(1)))) | lsb
    return cell.astype(np.int64)


def cell_level(cell_id) -> np.ndarray:
    """Level of a cell id (position of lowest set bit)."""
    c = np.asarray(cell_id).astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # level = MAX_LEVEL - log2(lsb)/2
    out = np.zeros(c.shape, dtype=np.int64)
    flat_l = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - flat_l // 2


def parent(cell_id, level: int) -> np.ndarray:
    """Parent cell id at the given (coarser) level."""
    c = np.asarray(cell_id).astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((c & (~(lsb - np.uint64(1)))) | lsb).astype(np.int64)


def _uv_from_st(s):
    """Inverse of _st_from_uv (the S2 quadratic projection)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


_FACE_XYZ = [
    # face -> xyz from (u, v): x,y,z as linear combos of (1, u, v)
    lambda u, v: (np.ones_like(u), u, v),          # 0: +x
    lambda u, v: (-u, np.ones_like(u), v),         # 1: +y
    lambda u, v: (-u, -v, np.ones_like(u)),        # 2: +z
    lambda u, v: (-np.ones_like(u), -v, -u),       # 3: -x
    lambda u, v: (v, -np.ones_like(u), -u),        # 4: -y
    lambda u, v: (v, u, -np.ones_like(u)),         # 5: -z
]


def _lonlat_from_face_ij(face: int, i, j):
    """(face, leaf i, leaf j) sample points -> (lon, lat) degrees."""
    s = np.asarray(i, dtype=np.float64) / float(1 << MAX_LEVEL)
    t = np.asarray(j, dtype=np.float64) / float(1 << MAX_LEVEL)
    u, v = _uv_from_st(s), _uv_from_st(t)
    x, y, z = _FACE_XYZ[face](u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / r, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


def _cell_id_from_face_ij(face: int, i: int, j: int, level: int) -> int:
    """(face, top-left leaf ij, level) -> cell id (python int, unsigned)."""
    bits = face & _SWAP
    pos = 0
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        ib = (i >> (k * _LOOKUP_BITS)) & mask
        jb = (j >> (k * _LOOKUP_BITS)) & mask
        val = int(_LOOKUP_POS[(((ib << _LOOKUP_BITS) + jb) << 2) + bits])
        pos = (pos << (2 * _LOOKUP_BITS)) | (val >> 2)
        bits = val & 3
    pos &= (1 << (2 * MAX_LEVEL)) - 1
    cell = (face << (2 * MAX_LEVEL + 1)) | (pos << 1) | 1
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return (cell & ~(lsb - 1)) | lsb


_BOUND_M = 8  # boundary samples per cell edge


def _cell_lonlat_bound(face: int, i0: int, j0: int, size: int):
    """Conservative (lon-interval-or-None, latmin, latmax) of a cell.

    Airtight construction: lat/lon extremes of a spherical region lie on
    its boundary (no interior critical points except the poles, handled
    explicitly). The boundary is 4 great-circle arcs; sampling each with
    _BOUND_M points puts every boundary point within half the max
    consecutive-sample arc of a sample, so padding the sample bbox by
    that half-arc is a true superset. lon None = full circle."""
    m = _BOUND_M
    t = np.unique(np.r_[(np.arange(m) * size) // m, size])
    ii = np.concatenate([i0 + t, np.full(len(t), i0 + size), i0 + size - t,
                         np.full(len(t), i0)])
    jj = np.concatenate([np.full(len(t), j0), j0 + t,
                         np.full(len(t), j0 + size), j0 + size - t])
    lon, lat = _lonlat_from_face_ij(face, ii, jj)

    # interior pole: faces 2 (+z) / 5 (-z) contain a pole at their center
    half = 1 << (MAX_LEVEL - 1)
    has_np = face == 2 and i0 <= half <= i0 + size and j0 <= half <= j0 + size
    has_sp = face == 5 and i0 <= half <= i0 + size and j0 <= half <= j0 + size

    c = np.radians(lat)
    x = np.cos(c) * np.cos(np.radians(lon))
    y = np.cos(c) * np.sin(np.radians(lon))
    z = np.sin(c)
    xyz = np.stack([x, y, z], axis=1)
    dots = np.clip(np.sum(xyz[:-1] * xyz[1:], axis=1), -1.0, 1.0)
    pad_deg = np.degrees(float(np.arccos(dots.min())) / 2.0) + 1e-9

    latmin = -90.0 if has_sp else max(lat.min() - pad_deg, -90.0)
    latmax = 90.0 if has_np else min(lat.max() + pad_deg, 90.0)
    if has_np or has_sp or latmax >= 89.999 or latmin <= -89.999:
        return None, latmin, latmax
    spread = lon.max() - lon.min()
    if spread > 180.0:  # likely wraps the antimeridian: treat as full
        return None, latmin, latmax
    cosedge = np.cos(np.radians(max(abs(latmin), abs(latmax))))
    if cosedge < 1e-3:
        return None, latmin, latmax
    lpad = pad_deg / cosedge
    if lpad >= 180.0:
        return None, latmin, latmax
    return (lon.min() - lpad, lon.max() + lpad), latmin, latmax


def region_coverer(xmin: float, ymin: float, xmax: float, ymax: float,
                   max_cells: int = 64, min_level: int = 0,
                   max_level: int = MAX_LEVEL, level_mod: int = 1) -> list[int]:
    """Approximate covering of a lon/lat bbox by S2 cell ids — the
    S2RegionCoverer analog (reference S2SFC.scala:17-78 /
    S2IndexKeySpace.scala coverings; minLevel/maxLevel/levelMod/maxCells
    knobs). Guaranteed SUPERSET: every point of the box lies in some
    returned cell (conservative intersection test, see
    _cell_lonlat_bound). Caller splits antimeridian-crossing boxes."""
    from collections import deque

    n = 1 << MAX_LEVEL

    def probe(face, i0, j0, level):
        """None if provably disjoint from the box, else True/False = the
        conservative fully-inside flag."""
        loniv, latmin, latmax = _cell_lonlat_bound(face, i0, j0, n >> level)
        if latmax < ymin or latmin > ymax:
            return None
        if loniv is not None and (loniv[1] < xmin or loniv[0] > xmax):
            return None
        return (latmin >= ymin and latmax <= ymax and loniv is not None
                and loniv[0] >= xmin and loniv[1] <= xmax)

    out: list[int] = []
    q: deque = deque()
    for f in range(6):
        ins = probe(f, 0, 0, 0)
        if ins is not None:
            q.append((f, 0, 0, 0, ins))
    while q:
        face, i0, j0, level, inside = q.popleft()  # breadth-first: coarse first
        at_floor = level >= max_level
        aligned = level >= min_level and (level - min_level) % level_mod == 0
        budget = len(out) + len(q) + 3 >= max_cells
        if at_floor or (aligned and (inside or budget)):
            out.append(_cell_id_from_face_ij(face, i0, j0, level))
            continue
        h = (n >> level) // 2
        nl = level + 1
        for ci, cj in ((i0, j0), (i0 + h, j0), (i0, j0 + h), (i0 + h, j0 + h)):
            ins = probe(face, ci, cj, nl)
            if ins is not None:
                q.append((face, ci, cj, nl, ins))
    return out


def s2_ranges(cells: list[int]) -> list[tuple[int, int]]:
    """Covering cells -> sorted, merged [range_min, range_max] unsigned
    id ranges (the reference's per-cell scan ranges: id +/- (lsb - 1))."""
    raw = []
    for c in cells:
        lsb = c & (-c & ((1 << 64) - 1))
        raw.append((c - lsb + 1, c + lsb - 1))
    raw.sort()
    merged: list[list[int]] = []
    for lo, hi in raw:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def token(cell_id) -> np.ndarray:
    """Hex token: cell id with trailing zero nibbles stripped."""
    c = np.atleast_1d(np.asarray(cell_id).astype(np.uint64))
    out = []
    for v in c:
        h = format(int(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out, dtype=object)
