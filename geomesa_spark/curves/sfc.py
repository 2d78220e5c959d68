"""Z2 / Z3 space-filling curves over lon/lat(/time).

Semantics from the reference Z2SFC / Z3SFC
(/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/Z2SFC.scala:30-82,
Z3SFC.scala:37-99):

- Z2: lon in [-180,180], lat in [-90,90], 31 bits per dimension.
- Z3: 21 bits per dimension; time is normalized within a BinnedTime bucket.
- ``lenient`` clamps out-of-bounds values instead of raising.
- hex encoding shifts z left 2 bits (Z2) so lexicographic prefix order equals
  numeric order; 16 hex digits.

Vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

from .binnedtime import MAX_OFFSET, time_to_binned
from .norm import BitNormalizedDimension, normalized_lat, normalized_lon, normalized_time
from .zorder import z2_decode, z2_encode, z3_decode, z3_encode


class Z2SFC:
    def __init__(self, precision: int = 31):
        self.precision = precision
        self.lon = normalized_lon(precision)
        self.lat = normalized_lat(precision)

    def _check_bounds(self, x, y, lenient: bool):
        if lenient:
            x = np.clip(x, self.lon.min, self.lon.max)
            y = np.clip(y, self.lat.min, self.lat.max)
            return x, y
        bad = (x < self.lon.min) | (x > self.lon.max) | (y < self.lat.min) | (y > self.lat.max)
        if np.any(bad):
            raise ValueError("Value(s) out of bounds ([-180,180], [-90,90])")
        return x, y

    def index(self, x, y, lenient: bool = False) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        x, y = self._check_bounds(x, y, lenient)
        return z2_encode(self.lon.normalize(x), self.lat.normalize(y))

    def invert(self, z):
        x, y = z2_decode(z)
        return self.lon.denormalize(x), self.lat.denormalize(y)

    def hex_encode(self, z) -> np.ndarray:
        """z << 2, 16 lowercase hex digits (prefix order == numeric order)."""
        z = np.asarray(z, dtype=np.uint64) << np.uint64(2)
        if z.ndim == 0:
            return format(int(z), "016x")
        return np.array([format(int(v), "016x") for v in z])

    def hex_decode(self, hexstr):
        if isinstance(hexstr, str):
            return int(hexstr, 16) >> 2
        return np.array([int(h, 16) >> 2 for h in hexstr], dtype=np.int64)


class Z3SFC:
    def __init__(self, period: str = "week", precision: int = 21):
        if not (0 < precision < 22):
            raise ValueError("Precision (bits) per dimension must be in [1,21]")
        self.period = period
        self.precision = precision
        self.lon: BitNormalizedDimension = normalized_lon(precision)
        self.lat: BitNormalizedDimension = normalized_lat(precision)
        self.time: BitNormalizedDimension = normalized_time(precision, float(MAX_OFFSET[period]))

    def index(self, x, y, t, lenient: bool = False) -> np.ndarray:
        """(lon, lat, offset-within-bin) → z. ``t`` is the bin offset, not epoch."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        if lenient:
            x = np.clip(x, self.lon.min, self.lon.max)
            y = np.clip(y, self.lat.min, self.lat.max)
            t = np.clip(t, self.time.min, self.time.max)
        else:
            bad = (
                (x < self.lon.min) | (x > self.lon.max)
                | (y < self.lat.min) | (y > self.lat.max)
                | (t < self.time.min) | (t > self.time.max)
            )
            if np.any(bad):
                raise ValueError("Value(s) out of bounds")
        return z3_encode(self.lon.normalize(x), self.lat.normalize(y), self.time.normalize(t))

    def index_millis(self, x, y, millis, lenient: bool = False):
        """(lon, lat, epoch-millis) → (bin:int64, z:int64)."""
        bins, offsets = time_to_binned(millis, self.period)
        return bins, self.index(x, y, offsets, lenient=lenient)

    def invert(self, z):
        x, y, t = z3_decode(z)
        return self.lon.denormalize(x), self.lat.denormalize(y), self.time.denormalize(t).astype(np.int64)
