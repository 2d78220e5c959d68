"""Z-order range decomposition (driver-side query planning only).

Port of the BFS quad/oct-tree prefix search of the reference ZN.zranges
(/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/zorder/sfcurve/ZN.scala:110-242)
plus the Tropf LITMAX/BIGMIN split (ZN.scala:309-361). Planner defaults mirror
the reference: range target 2000 (QueryProperties.scala:24), max recursion 7
(ZN.scala:293).

These run once per query on the driver — never per row — to turn a query
window into (a) a set of z ranges for predicate pushdown on the z column and
(b) a set of covering cell prefixes for the cell-cover equi-join.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from .zorder import z2_decode, z2_encode, z3_decode, z3_encode

M64 = (1 << 64) - 1
DEFAULT_RECURSE = 7
DEFAULT_MAX_RANGES = 2000


@dataclass(frozen=True)
class ZRange:
    lower: int
    upper: int
    contained: bool = True


class _ZDims:
    """Dimension plumbing for the generic BFS (Z2 or Z3)."""

    def __init__(self, dims: int, bits_per_dim: int):
        self.dims = dims
        self.bits_per_dim = bits_per_dim
        self.total_bits = dims * bits_per_dim
        self.quadrants = 1 << dims

    def decode(self, z: int) -> tuple:
        raise NotImplementedError

    def contains(self, rng: tuple[int, int], value: tuple[int, int]) -> bool:
        """True iff the dim windows of ``value`` lie within those of ``rng``."""
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(value[0]), self.decode(value[1])
        return all(
            vmin[d] >= rmin[d] and vmax[d] <= rmax[d] for d in range(self.dims)
        )

    def overlaps(self, rng: tuple[int, int], value: tuple[int, int]) -> bool:
        rmin, rmax = self.decode(rng[0]), self.decode(rng[1])
        vmin, vmax = self.decode(value[0]), self.decode(value[1])
        return all(
            max(rmin[d], vmin[d]) <= min(rmax[d], vmax[d]) for d in range(self.dims)
        )


class _Z2Dims(_ZDims):
    def __init__(self):
        super().__init__(2, 31)

    def decode(self, z: int):
        x, y = z2_decode(z)
        return int(x), int(y)


class _Z3Dims(_ZDims):
    def __init__(self):
        super().__init__(3, 21)

    def decode(self, z: int):
        x, y, t = z3_decode(z)
        return int(x), int(y), int(t)


_Z2 = _Z2Dims()
_Z3 = _Z3Dims()


def _longest_common_prefix(dims: _ZDims, values: list[int]) -> tuple[int, int]:
    """(common prefix, number of common bits) — ZN.scala:269-280."""
    bit_shift = dims.total_bits - dims.dims
    # mirrors JVM shift-mod-64 semantics on negative counts
    head = values[0] >> (bit_shift % 64)
    while all((v >> (bit_shift % 64)) == head for v in values[1:]) and bit_shift > -1:
        bit_shift -= dims.dims
        head = values[0] >> (bit_shift % 64)
    bit_shift += dims.dims
    prefix = values[0] & ((0x7FFFFFFFFFFFFFFF << bit_shift) & M64)
    return prefix, 64 - bit_shift


def _zranges(dims: _ZDims, zbounds: list[tuple[int, int]], precision: int = 64,
             max_ranges: int | None = None, max_recurse: int | None = DEFAULT_RECURSE) -> list[ZRange]:
    ranges: list[ZRange] = []
    remaining: deque = deque()
    TERMINATOR = ("T",)

    prefix, common_bits = _longest_common_prefix(dims, [b for pair in zbounds for b in pair])
    offset = 64 - common_bits

    def is_contained(rng):
        return any(dims.contains(zb, rng) for zb in zbounds)

    def is_overlapped(rng):
        return any(dims.overlaps(zb, rng) for zb in zbounds)

    def check_value(pfx: int, quadrant: int, off: int):
        if off >= 64:
            zmin = pfx
            zmax = pfx
        else:
            zmin = pfx | (quadrant << off)
            zmax = zmin | ((1 << off) - 1)
        rng = (zmin, zmax)
        if is_contained(rng) or off < 64 - precision:
            ranges.append(ZRange(zmin, zmax, True))
        elif is_overlapped(rng):
            remaining.append((zmin, zmax))

    def bottom_out():
        while remaining:
            mm = remaining.popleft()
            if mm is not TERMINATOR:
                ranges.append(ZRange(mm[0], mm[1], False))

    check_value(prefix, 0, offset)
    remaining.append(TERMINATOR)
    offset -= dims.dims

    level = 0
    range_stop = max_ranges if max_ranges is not None else 1 << 62
    recurse_stop = max_recurse if max_recurse is not None else DEFAULT_RECURSE

    while True:
        nxt = remaining.popleft()
        if nxt is TERMINATOR:
            if remaining:
                level += 1
                offset -= dims.dims
                if level >= recurse_stop or offset < 0:
                    bottom_out()
                else:
                    remaining.append(TERMINATOR)
        else:
            pfx = nxt[0]
            for quadrant in range(dims.quadrants):
                check_value(pfx, quadrant, offset)
            if len(ranges) + len(remaining) - 1 >= range_stop:
                bottom_out()
        if not remaining:
            break

    ranges.sort(key=lambda r: (r.lower, r.upper))
    result = []
    cur = ranges[0]
    for r in ranges[1:]:
        if r.lower <= cur.upper + 1:
            cur = ZRange(cur.lower, max(cur.upper, r.upper), cur.contained and r.contained)
        else:
            result.append(cur)
            cur = r
    result.append(cur)
    return result


def z2_ranges(zbounds: list[tuple[int, int]], precision: int = 64,
              max_ranges: int | None = DEFAULT_MAX_RANGES,
              max_recurse: int | None = DEFAULT_RECURSE) -> list[ZRange]:
    """zbounds: [(zmin, zmax)] from Z2 of (xmin,ymin) and (xmax,ymax)."""
    return _zranges(_Z2, zbounds, precision, max_ranges, max_recurse)


def z3_ranges(zbounds: list[tuple[int, int]], precision: int = 64,
              max_ranges: int | None = DEFAULT_MAX_RANGES,
              max_recurse: int | None = DEFAULT_RECURSE) -> list[ZRange]:
    return _zranges(_Z3, zbounds, precision, max_ranges, max_recurse)


def z2_bounds_to_zbound(xmin: int, ymin: int, xmax: int, ymax: int) -> tuple[int, int]:
    """Normalized-int window corners → (zmin, zmax)."""
    return int(z2_encode(xmin, ymin)), int(z2_encode(xmax, ymax))


def z3_bounds_to_zbound(xmin, ymin, tmin, xmax, ymax, tmax) -> tuple[int, int]:
    return int(z3_encode(xmin, ymin, tmin)), int(z3_encode(xmax, ymax, tmax))
