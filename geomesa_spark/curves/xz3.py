"""XZ3 space-filling curve: XZ-ordering extended to 3D (x, y, time).

Semantics re-derived from the reference XZ3SFC
(/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/XZ3SFC.scala:26-357):

- normalize (x, y, z) into [0,1]^3 over (lon, lat, time-bin-offset)
  bounds; default z bounds are (0, BinnedTime.maxOffset(period)).
- sequence length l1 = floor(log(maxDim)/log(0.5)) over the max of the
  three extents; bumped to l1+1 when the box fits within 2 cells of the
  finer resolution on ALL three axes (:60-73).
- sequence code = base-8 positional sum over octant choices with
  octant = (x>=c) + 2*(y>=c) + 4*(z>=c), step 1 + oct*(8^(g-i)-1)/7
  (:275-305).
- full-match interval = [min, min + (8^(g-length+1)-1)/7] (:315-327).
- default g=12 (the sft XZ precision default), time period week.

``index`` is vectorized (one numpy pass per octree level); ``ranges``
is driver-side BFS planning over the octree, identical structure to the
XZ2 planner.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .binnedtime import MAX_OFFSET, time_to_binned

DEFAULT_G = 12


class XZ3SFC:
    def __init__(self, g: int = DEFAULT_G, period: str = "week",
                 x_bounds=(-180.0, 180.0), y_bounds=(-90.0, 90.0),
                 z_bounds=None):
        self.g = g
        self.period = period
        self.x_lo, self.x_hi = map(float, x_bounds)
        self.y_lo, self.y_hi = map(float, y_bounds)
        if z_bounds is None:
            z_bounds = (0.0, float(MAX_OFFSET[period]))
        self.z_lo, self.z_hi = map(float, z_bounds)
        self.x_size = self.x_hi - self.x_lo
        self.y_size = self.y_hi - self.y_lo
        self.z_size = self.z_hi - self.z_lo
        self._pow8 = np.array([8 ** (g - i) for i in range(g)], dtype=np.int64)

    def _normalize(self, xmin, ymin, zmin, xmax, ymax, zmax, lenient: bool):
        arrs = [np.asarray(a, dtype=np.float64)
                for a in (xmin, ymin, zmin, xmax, ymax, zmax)]
        xmin, ymin, zmin, xmax, ymax, zmax = arrs
        if np.any(xmin > xmax) or np.any(ymin > ymax) or np.any(zmin > zmax):
            raise ValueError("Bounds must be ordered")
        if lenient:
            xmin = np.clip(xmin, self.x_lo, self.x_hi)
            xmax = np.clip(xmax, self.x_lo, self.x_hi)
            ymin = np.clip(ymin, self.y_lo, self.y_hi)
            ymax = np.clip(ymax, self.y_lo, self.y_hi)
            zmin = np.clip(zmin, self.z_lo, self.z_hi)
            zmax = np.clip(zmax, self.z_lo, self.z_hi)
        else:
            bad = ((xmin < self.x_lo) | (xmax > self.x_hi)
                   | (ymin < self.y_lo) | (ymax > self.y_hi)
                   | (zmin < self.z_lo) | (zmax > self.z_hi))
            if np.any(bad):
                raise ValueError("Values out of bounds")
        return ((xmin - self.x_lo) / self.x_size, (ymin - self.y_lo) / self.y_size,
                (zmin - self.z_lo) / self.z_size, (xmax - self.x_lo) / self.x_size,
                (ymax - self.y_lo) / self.y_size, (zmax - self.z_lo) / self.z_size)

    def index(self, xmin, ymin, zmin, xmax, ymax, zmax,
              lenient: bool = False) -> np.ndarray:
        nxmin, nymin, nzmin, nxmax, nymax, nzmax = self._normalize(
            xmin, ymin, zmin, xmax, ymax, zmax, lenient)
        nxmin, nymin, nzmin, nxmax, nymax, nzmax = np.atleast_1d(
            nxmin, nymin, nzmin, nxmax, nymax, nzmax)

        max_dim = np.maximum(np.maximum(nxmax - nxmin, nymax - nymin), nzmax - nzmin)
        with np.errstate(divide="ignore"):
            l1 = np.floor(np.log(max_dim) / np.log(0.5))
        l1 = np.where(np.isfinite(l1), l1, np.float64(self.g)).astype(np.int64)

        w2 = np.power(0.5, (l1 + 1).astype(np.float64))

        def predicate(lo, hi):
            return hi <= (np.floor(lo / w2) * w2) + 2 * w2

        bump = (predicate(nxmin, nxmax) & predicate(nymin, nymax)
                & predicate(nzmin, nzmax))
        length = np.where(l1 >= self.g, np.int64(self.g), np.where(bump, l1 + 1, l1))
        return self._sequence_code(nxmin, nymin, nzmin, length)

    def index_binned(self, lon, lat, millis):
        """(lon, lat, epoch-millis point data) -> (bin, xz3) as point boxes."""
        bins, offsets = time_to_binned(np.asarray(millis, dtype=np.int64), self.period)
        o = offsets.astype(np.float64)
        return bins, self.index(lon, lat, o, lon, lat, o, lenient=True)

    def _sequence_code(self, x, y, z, length) -> np.ndarray:
        """Vectorized octant-sum sequence code (XZ3SFC.scala:275-305)."""
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        z = np.atleast_1d(np.asarray(z, dtype=np.float64))
        length = np.atleast_1d(np.asarray(length, dtype=np.int64))
        xmin = np.zeros_like(x)
        ymin = np.zeros_like(y)
        zmin = np.zeros_like(z)
        xmax = np.ones_like(x)
        ymax = np.ones_like(y)
        zmax = np.ones_like(z)
        cs = np.zeros(x.shape, dtype=np.int64)

        for i in range(self.g):
            active = i < length
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            zc = (zmin + zmax) / 2.0
            x_lt = x < xc
            y_lt = y < yc
            z_lt = z < zc
            octant = (np.where(x_lt, 0, 1) + np.where(y_lt, 0, 2)
                      + np.where(z_lt, 0, 4)).astype(np.int64)
            step = 1 + octant * ((self._pow8[i] - 1) // 7)
            cs = np.where(active, cs + step, cs)
            xmax = np.where(active & x_lt, xc, xmax)
            xmin = np.where(active & ~x_lt, xc, xmin)
            ymax = np.where(active & y_lt, yc, ymax)
            ymin = np.where(active & ~y_lt, yc, ymin)
            zmax = np.where(active & z_lt, zc, zmax)
            zmin = np.where(active & ~z_lt, zc, zmin)
        return cs

    # ---- range planning (driver-side, pure python) ----------------------

    def ranges(self, queries, max_ranges: int | None = None):
        """queries: [(xmin, ymin, zmin, xmax, ymax, zmax)] in user space ->
        merged (lower, upper, contained) list. BFS port of XZ3SFC:140-260."""
        windows = []
        for (xmin, ymin, zmin, xmax, ymax, zmax) in queries:
            n = self._normalize(xmin, ymin, zmin, xmax, ymax, zmax, lenient=False)
            windows.append(tuple(float(v) for v in n))

        range_stop = max_ranges if max_ranges is not None else 1 << 62
        ranges: list[tuple[int, int, bool]] = []

        def children(el):
            x0, y0, z0, x1, y1, z1, ln = el
            xc, yc, zc = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
            half = ln / 2.0
            out = []
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        out.append((
                            xc if dx else x0, yc if dy else y0, zc if dz else z0,
                            x1 if dx else xc, y1 if dy else yc, z1 if dz else zc,
                            half))
            return out

        def is_contained(el):
            x0, y0, z0, x1, y1, z1, ln = el
            xe, ye, ze = x1 + ln, y1 + ln, z1 + ln
            return any(w[0] <= x0 and w[1] <= y0 and w[2] <= z0
                       and w[3] >= xe and w[4] >= ye and w[5] >= ze for w in windows)

        def is_overlapped(el):
            x0, y0, z0, x1, y1, z1, ln = el
            xe, ye, ze = x1 + ln, y1 + ln, z1 + ln
            return any(w[3] >= x0 and w[4] >= y0 and w[5] >= z0
                       and w[0] <= xe and w[1] <= ye and w[2] <= ze for w in windows)

        pow8 = [int(p) for p in self._pow8]

        def seq_code_scalar(x, y, z, length):
            x0 = y0 = z0 = 0.0
            x1 = y1 = z1 = 1.0
            cs = 0
            for i in range(length):
                xc, yc, zc = (x0 + x1) / 2, (y0 + y1) / 2, (z0 + z1) / 2
                o = (0 if x < xc else 1) + (0 if y < yc else 2) + (0 if z < zc else 4)
                cs += 1 + o * ((pow8[i] - 1) // 7)
                if x < xc: x1 = xc
                else: x0 = xc
                if y < yc: y1 = yc
                else: y0 = yc
                if z < zc: z1 = zc
                else: z0 = zc
            return cs

        def seq_interval(x, y, z, length, partial):
            lo = seq_code_scalar(x, y, z, length)
            if partial:
                return lo, lo
            return lo, lo + (8 ** (self.g - length + 1) - 1) // 7

        TERMINATOR = None
        remaining = deque(children((0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0)))
        remaining.append(TERMINATOR)
        level = 1

        while level < self.g and remaining and len(ranges) < range_stop:
            nxt = remaining.popleft()
            if nxt is TERMINATOR:
                if remaining:
                    level += 1
                    remaining.append(TERMINATOR)
            else:
                if is_contained(nxt):
                    lo, hi = seq_interval(nxt[0], nxt[1], nxt[2], level, partial=False)
                    ranges.append((lo, hi, True))
                elif is_overlapped(nxt):
                    lo, hi = seq_interval(nxt[0], nxt[1], nxt[2], level, partial=True)
                    ranges.append((lo, hi, False))
                    remaining.extend(children(nxt))

        while remaining:
            el = remaining.popleft()
            if el is TERMINATOR:
                level += 1
            else:
                lo, hi = seq_interval(el[0], el[1], el[2], level, partial=False)
                ranges.append((lo, hi, False))

        ranges.sort(key=lambda r: (r[0], r[1]))
        result = []
        cur = ranges[0]
        for r in ranges[1:]:
            if r[0] <= cur[1] + 1:
                cur = (cur[0], max(cur[1], r[1]), cur[2] and r[2])
            else:
                result.append(cur)
                cur = r
        result.append(cur)
        return result
