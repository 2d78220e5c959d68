"""Space-filling-curve kernels: Z2/Z3 Morton, XZ2 extended objects, time bins,
geohash, and driver-side range decomposition. All row-level math is numpy-
vectorized; range planning is driver-side pure Python."""

from .binnedtime import MAX_OFFSET, binned_to_time, max_bin_millis, time_to_binned
from .geohash import geohash_decode_bbox, geohash_decode_point, geohash_encode
from .norm import BitNormalizedDimension, normalized_lat, normalized_lon, normalized_time
from .sfc import Z2SFC, Z3SFC
from .xz2 import XZ2SFC
from .zorder import (
    z2_combine,
    z2_decode,
    z2_encode,
    z2_split,
    z3_combine,
    z3_decode,
    z3_encode,
    z3_split,
)
from .zranges import ZRange, z2_bounds_to_zbound, z2_ranges, z3_bounds_to_zbound, z3_ranges

__all__ = [
    "MAX_OFFSET", "binned_to_time", "max_bin_millis", "time_to_binned",
    "geohash_decode_bbox", "geohash_decode_point", "geohash_encode",
    "BitNormalizedDimension", "normalized_lat", "normalized_lon", "normalized_time",
    "Z2SFC", "Z3SFC", "XZ2SFC",
    "z2_combine", "z2_decode", "z2_encode", "z2_split",
    "z3_combine", "z3_decode", "z3_encode", "z3_split",
    "ZRange", "z2_bounds_to_zbound", "z2_ranges", "z3_bounds_to_zbound", "z3_ranges",
]
