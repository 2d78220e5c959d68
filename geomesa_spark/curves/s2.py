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


def token(cell_id) -> np.ndarray:
    """Hex token: cell id with trailing zero nibbles stripped."""
    c = np.atleast_1d(np.asarray(cell_id).astype(np.uint64))
    out = []
    for v in c:
        h = format(int(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return np.array(out, dtype=object)
