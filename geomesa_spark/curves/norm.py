"""Dimension normalization: map a double in [min, max] to an int in [0, 2^p).

Semantics from the reference BitNormalizedDimension
(/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/NormalizedDimension.scala:56-78):

- ``normalize(x) = maxIndex            if x >= max``
- ``normalize(x) = floor((x-min) * 2^p / (max-min))  otherwise``
- ``denormalize(i)`` returns the *center* of cell ``min(i, maxIndex)``.

Vectorized; used from pandas UDFs only.
"""

from __future__ import annotations

import numpy as np


class BitNormalizedDimension:
    def __init__(self, lo: float, hi: float, precision: int):
        if not (0 < precision < 32):
            raise ValueError("Precision (bits) must be in [1,31]")
        self.min = float(lo)
        self.max = float(hi)
        self.precision = precision
        self.bins = 1 << precision
        self.normalizer = self.bins / (self.max - self.min)
        self.denormalizer = (self.max - self.min) / self.bins
        self.max_index = self.bins - 1

    def normalize(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        out = np.floor((x - self.min) * self.normalizer).astype(np.int64)
        # the min() clamp matters even for x < max: within ~1 ulp of the
        # top, (x - min) * normalizer can round up to ``bins`` — the
        # reference gets the same clamp implicitly from Scala's
        # saturating Double.toInt (NormalizedDimension.scala:56-72)
        out = np.minimum(out, np.int64(self.max_index))
        return np.where(x >= self.max, np.int64(self.max_index), out)

    def denormalize(self, i) -> np.ndarray:
        i = np.asarray(i, dtype=np.int64)
        i = np.minimum(i, self.max_index)
        return self.min + (i.astype(np.float64) + 0.5) * self.denormalizer


def normalized_lon(precision: int) -> BitNormalizedDimension:
    return BitNormalizedDimension(-180.0, 180.0, precision)


def normalized_lat(precision: int) -> BitNormalizedDimension:
    return BitNormalizedDimension(-90.0, 90.0, precision)


def normalized_time(precision: int, max_offset: float) -> BitNormalizedDimension:
    return BitNormalizedDimension(0.0, max_offset, precision)
