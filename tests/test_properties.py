"""Hypothesis property tests for the kernel layer: randomized invariants
that complement the vendored reference-value tests (round-trips,
monotonicity, containment, cross-implementation equivalence). Pure
numpy — no Spark session needed."""

from __future__ import annotations

import os
import sys

import numpy as np
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geomesa_spark.curves.geohash import geohash_decode_bbox, geohash_encode
from geomesa_spark.curves.norm import normalized_lat, normalized_lon
from geomesa_spark.curves.sfc import Z2SFC
from geomesa_spark.curves.xz2 import XZ2SFC
from geomesa_spark.curves.zorder import z2_decode, z2_encode, z3_decode, z3_encode

_SET = settings(max_examples=200, deadline=None)

u31 = st.integers(min_value=0, max_value=(1 << 31) - 1)
u21 = st.integers(min_value=0, max_value=(1 << 21) - 1)
lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@_SET
@given(u31, u31)
def test_z2_roundtrip(x, y):
    z = z2_encode(np.array([x], dtype=np.int64), np.array([y], dtype=np.int64))
    rx, ry = z2_decode(z)
    assert int(rx[0]) == x and int(ry[0]) == y


@_SET
@given(u21, u21, u21)
def test_z3_roundtrip(x, y, t):
    z = z3_encode(np.array([x], dtype=np.int64), np.array([y], dtype=np.int64),
                  np.array([t], dtype=np.int64))
    rx, ry, rt = z3_decode(z)
    assert (int(rx[0]), int(ry[0]), int(rt[0])) == (x, y, t)


@_SET
@given(lon_s, lat_s, lon_s, lat_s)
def test_z2_hex_order_matches_numeric(x1, y1, x2, y2):
    """hexEncode preserves ordering: lexicographic == numeric (the
    property the partition-prefix planner relies on)."""
    sfc = Z2SFC()
    za = int(sfc.index(np.array([x1]), np.array([y1]), lenient=True)[0])
    zb = int(sfc.index(np.array([x2]), np.array([y2]), lenient=True)[0])
    ha = str(sfc.hex_encode(np.array([za]))[0])
    hb = str(sfc.hex_encode(np.array([zb]))[0])
    assert (za < zb) == (ha < hb) or za == zb


@_SET
@given(lon_s, lat_s)
def test_normalize_cell_contains_value(x, y):
    """normalize floors into a cell; denormalize returns that cell's
    center; the value lies within half a cell of the center."""
    lon, lat = normalized_lon(31), normalized_lat(31)
    for dim, v in ((lon, x), (lat, y)):
        i = int(np.asarray(dim.normalize(np.array([v])))[0])
        assert 0 <= i <= dim.max_index
        c = float(np.asarray(dim.denormalize(np.array([i])))[0])
        assert abs(c - v) <= dim.denormalizer * 0.5 + 1e-9


@_SET
@given(lon_s, lat_s, st.integers(min_value=1, max_value=12))
def test_geohash_decode_contains_point(x, y, chars):
    gh = str(geohash_encode(np.array([x]), np.array([y]), 5 * chars)[0])
    assert len(gh) == chars
    x0, y0, x1, y1 = geohash_decode_bbox(gh)
    assert x0 - 1e-9 <= x <= x1 + 1e-9 and y0 - 1e-9 <= y <= y1 + 1e-9


@_SET
@given(st.floats(min_value=-179.0, max_value=178.0, allow_nan=False),
       st.floats(min_value=-89.0, max_value=88.0, allow_nan=False),
       st.floats(min_value=1e-6, max_value=1.0),
       st.floats(min_value=1e-6, max_value=1.0))
def test_xz2_index_inside_containing_window_ranges(cx, cy, w, h):
    """A geometry's xz2 index always falls inside the ranges of any
    window containing it (the XZ2SFCTest property, randomized)."""
    sfc = XZ2SFC()
    x0, y0 = cx, cy
    x1 = min(cx + w, 180.0)
    y1 = min(cy + h, 90.0)
    z = int(sfc.index(np.array([x0]), np.array([y0]),
                      np.array([x1]), np.array([y1]))[0])
    win = (max(x0 - 0.5, -180.0), max(y0 - 0.5, -90.0),
           min(x1 + 0.5, 180.0), min(y1 + 0.5, 90.0))
    ranges = sfc.ranges([win])
    assert any(lo <= z <= hi for lo, hi, _ in ranges)


@_SET
@given(st.text(min_size=0, max_size=300))
def test_fingerprint_vectorized_equals_scalar(txt):
    """The Mersenne-folded vectorized Rabin-Karp == the definitional
    per-byte loop, for arbitrary unicode text."""
    import pandas as pd

    from geomesa_spark.operators.text import _MASK53, _mersenne61_reduce

    p = (1 << 61) - 1
    h_ref = 0
    for b in txt.encode():
        h_ref = (h_ref * 257 + b) % p

    # replicate the UDF's inner math
    enc = np.char.encode(np.array([txt], dtype=object).astype(str), "utf-8")
    padded = enc.astype(np.bytes_)
    width = max(padded.dtype.itemsize, 1)
    mat = padded.view(np.uint8).reshape(1, width)
    length = int(np.char.str_len(padded)[0])
    h = np.zeros(1, dtype=np.uint64)
    for j in range(min(width, length)):
        hl = h
        h256 = (hl >> np.uint64(53)) + ((hl & _MASK53) << np.uint64(8))
        x = _mersenne61_reduce(h256 + hl) + mat[:, j].astype(np.uint64)
        h = _mersenne61_reduce(x)
    if "\x00" not in txt:  # NUL truncates the S-dtype length (documented)
        assert int(h[0]) == h_ref


@_SET
@given(st.lists(st.tuples(lon_s, lat_s), min_size=3, max_size=40))
def test_wkb_roundtrip_polygon(coords):
    from geomesa_spark.geom.wkb import Polygon, wkb_read, wkb_write

    ring = np.array(coords + [coords[0]], dtype=np.float64)
    g = Polygon(ring)
    back = wkb_read(wkb_write(g))
    assert isinstance(back, Polygon)
    assert np.array_equal(back.rings[0], g.rings[0])


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


@given(st.text(alphabet="ab", max_size=16), st.text(alphabet="ab", max_size=16),
       st.integers(min_value=0, max_value=2))
def test_edit_pairs_qgram_filter_is_complete(a, b, d):
    """The exactness of dedup.edit_pairs rests on the Gravano 2001 count
    filter: any pair within edit distance d either (long case) shares a
    character q-gram when max(len) >= q*(d+1), or (short case) has both
    sides < q*(d+1) and lands in the all-pairs band join. The two-letter
    alphabet maximizes adversarial gram collisions/disjointness."""
    q = 3
    if _lev(a, b) > d:
        return
    assert abs(len(a) - len(b)) <= d          # the band filter is sound
    lim = q * (d + 1)
    if max(len(a), len(b)) >= lim:
        ga = {a[i:i + q] for i in range(len(a) - q + 1)}
        gb = {b[i:i + q] for i in range(len(b) - q + 1)}
        assert ga & gb, (a, b, d)             # the gram join finds it
    # else: both sides < lim -> covered by the short-slice cross join
