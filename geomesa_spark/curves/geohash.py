"""GeoHash encode/decode (base-32, interleaved lon/lat bisection).

Semantics match the reference st_geoHash surface
(/root/reference/geomesa-spark/geomesa-spark-jts/src/main/scala/org/locationtech/geomesa/spark/jts/util/GeoHashUtils.scala:25-35
and geomesa-utils geohash package): standard Niemeyer geohash, precision in
*bits*; even bit indexes bisect longitude first. Vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_INV = {c: i for i, c in enumerate(_BASE32)}


def geohash_encode(lon, lat, prec_bits: int) -> np.ndarray:
    """Encode lon/lat arrays to geohash strings of ``prec_bits`` bits.

    prec_bits must be a multiple of 5 to render whole base-32 chars
    (the reference requires the same for string geohashes).
    """
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    n = lon.shape[0]
    lo_x = np.full(n, -180.0)
    hi_x = np.full(n, 180.0)
    lo_y = np.full(n, -90.0)
    hi_y = np.full(n, 90.0)
    bits = np.zeros(n, dtype=np.uint64)
    for b in range(prec_bits):
        if b % 2 == 0:  # longitude
            mid = (lo_x + hi_x) / 2
            is_hi = lon >= mid
            lo_x = np.where(is_hi, mid, lo_x)
            hi_x = np.where(is_hi, hi_x, mid)
        else:  # latitude
            mid = (lo_y + hi_y) / 2
            is_hi = lat >= mid
            lo_y = np.where(is_hi, mid, lo_y)
            hi_y = np.where(is_hi, hi_y, mid)
        bits = (bits << np.uint64(1)) | is_hi.astype(np.uint64)
    nchars = prec_bits // 5
    out = np.empty(n, dtype=object)
    for i in range(n):
        v = int(bits[i])
        out[i] = "".join(_BASE32[(v >> (5 * (nchars - 1 - k))) & 31] for k in range(nchars))
    return out


def geohash_decode_bbox(gh: str, max_bits: int | None = None):
    """geohash string → (xmin, ymin, xmax, ymax).

    ``max_bits`` truncates the decode to the first N interleaved bits —
    precision in the reference GeoHash API is bit-granular, not
    restricted to whole base-32 characters."""
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    even = True
    used = 0
    for c in gh:
        v = _BASE32_INV[c]
        for shift in range(4, -1, -1):
            if max_bits is not None and used >= max_bits:
                return lo_x, lo_y, hi_x, hi_y
            used += 1
            bit = (v >> shift) & 1
            if even:
                mid = (lo_x + hi_x) / 2
                if bit:
                    lo_x = mid
                else:
                    hi_x = mid
            else:
                mid = (lo_y + hi_y) / 2
                if bit:
                    lo_y = mid
                else:
                    hi_y = mid
            even = not even
    return lo_x, lo_y, hi_x, hi_y


def geohash_decode_point(gh: str):
    """geohash string → (lon, lat) cell center."""
    xmin, ymin, xmax, ymax = geohash_decode_bbox(gh)
    return (xmin + xmax) / 2, (ymin + ymax) / 2
