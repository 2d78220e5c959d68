"""XZ2 space-filling curve for extended objects (bounding boxes).

Based on "XZ-Ordering: A Space-Filling Curve for Objects with Spatial
Extension" (Böhm, Klump, Kriegel). Semantics re-derived from the reference
XZ2SFC (/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/XZ2SFC.scala:93-357):

- sequence length l1 = floor(log(maxDim)/log(0.5)); bumped to l1+1 when the
  box fits within 2 cells of the finer resolution on both axes (:105-113).
- sequence code = base-4 positional sum over quadrant choices (:315-337).
- full-match interval = [min, min + (4^(g-l+1)-1)/3] (lemma 3, :348-357).
- default g=12, bounds (-180..180, -90..90) (XZSFC.scala:13, XZ2SFC.scala:404).

``index`` is fully vectorized (one numpy pass per quadtree level); ``ranges``
is driver-side planning (pure Python BFS over the quadtree).
"""

from __future__ import annotations

import numpy as np

DEFAULT_G = 12


class XZ2SFC:
    def __init__(self, g: int = DEFAULT_G, x_bounds=(-180.0, 180.0), y_bounds=(-90.0, 90.0)):
        self.g = g
        self.x_lo, self.x_hi = map(float, x_bounds)
        self.y_lo, self.y_hi = map(float, y_bounds)
        self.x_size = self.x_hi - self.x_lo
        self.y_size = self.y_hi - self.y_lo
        self.max_z = (4 ** (g + 1) - 1) // 3
        # number of bits to shift hex values left for prefix matching
        nlz = 64 - self.max_z.bit_length()
        self.hex_bit_offset = nlz % 4
        self.hex_digits = (64 - nlz) // 4 + (0 if self.hex_bit_offset == 0 else 1)
        # 4^(g-i) per level, precomputed
        self._pow4 = np.array([4 ** (g - i) for i in range(g)], dtype=np.int64)

    # ---- normalization -------------------------------------------------

    def _normalize(self, xmin, ymin, xmax, ymax, lenient: bool):
        xmin = np.asarray(xmin, dtype=np.float64)
        ymin = np.asarray(ymin, dtype=np.float64)
        xmax = np.asarray(xmax, dtype=np.float64)
        ymax = np.asarray(ymax, dtype=np.float64)
        if np.any(xmin > xmax) or np.any(ymin > ymax):
            raise ValueError("Bounds must be ordered")
        if lenient:
            xmin = np.clip(xmin, self.x_lo, self.x_hi)
            xmax = np.clip(xmax, self.x_lo, self.x_hi)
            ymin = np.clip(ymin, self.y_lo, self.y_hi)
            ymax = np.clip(ymax, self.y_lo, self.y_hi)
        else:
            bad = (xmin < self.x_lo) | (xmax > self.x_hi) | (ymin < self.y_lo) | (ymax > self.y_hi)
            if np.any(bad):
                raise ValueError("Values out of bounds")
        return (
            (xmin - self.x_lo) / self.x_size,
            (ymin - self.y_lo) / self.y_size,
            (xmax - self.x_lo) / self.x_size,
            (ymax - self.y_lo) / self.y_size,
        )

    # ---- indexing (vectorized) ----------------------------------------

    def index(self, xmin, ymin, xmax, ymax, lenient: bool = False) -> np.ndarray:
        nxmin, nymin, nxmax, nymax = self._normalize(xmin, ymin, xmax, ymax, lenient)
        nxmin, nymin, nxmax, nymax = np.atleast_1d(nxmin, nymin, nxmax, nymax)

        max_dim = np.maximum(nxmax - nxmin, nymax - nymin)
        with np.errstate(divide="ignore"):
            l1 = np.floor(np.log(max_dim) / np.log(0.5))
        # maxDim == 0 (points) → log(0) = -inf → l1 = +inf → capped at g below
        l1 = np.where(np.isfinite(l1), l1, np.float64(self.g)).astype(np.int64)

        w2 = np.power(0.5, (l1 + 1).astype(np.float64))  # width at resolution l1+1

        def predicate(lo, hi):
            return hi <= (np.floor(lo / w2) * w2) + 2 * w2

        bump = predicate(nxmin, nxmax) & predicate(nymin, nymax)
        length = np.where(l1 >= self.g, np.int64(self.g), np.where(bump, l1 + 1, l1))

        return self._sequence_code(nxmin, nymin, length)

    def _sequence_code(self, x, y, length) -> np.ndarray:
        """Vectorized port of the quadrant-sum sequence code (XZ2SFC.scala:315-337)."""
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        length = np.atleast_1d(np.asarray(length, dtype=np.int64))
        xmin = np.zeros_like(x)
        ymin = np.zeros_like(y)
        xmax = np.ones_like(x)
        ymax = np.ones_like(y)
        cs = np.zeros(x.shape, dtype=np.int64)

        for i in range(self.g):
            active = i < length
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            x_lt = x < xc
            y_lt = y < yc
            quadrant = np.where(x_lt, 0, 1) + np.where(y_lt, 0, 2)
            step = 1 + quadrant.astype(np.int64) * ((self._pow4[i] - 1) // 3)
            cs = np.where(active, cs + step, cs)
            xmax = np.where(active & x_lt, xc, xmax)
            xmin = np.where(active & ~x_lt, xc, xmin)
            ymax = np.where(active & y_lt, yc, ymax)
            ymin = np.where(active & ~y_lt, yc, ymin)
        return cs

    # ---- hex ------------------------------------------------------------

    def hex_encode(self, z) -> np.ndarray:
        z = np.asarray(z, dtype=np.uint64) << np.uint64(self.hex_bit_offset)
        fmt = f"0{self.hex_digits}x"
        if z.ndim == 0:
            return format(int(z), fmt)
        return np.array([format(int(v), fmt) for v in z])

    def hex_decode(self, hexstr):
        if isinstance(hexstr, str):
            return int(hexstr, 16) >> self.hex_bit_offset
        return np.array([int(h, 16) >> self.hex_bit_offset for h in hexstr], dtype=np.int64)

    # ---- range planning (driver-side, pure python) ----------------------

    def ranges(self, queries, max_ranges: int | None = None):
        """Cover normalized query windows with curve ranges.

        ``queries``: list of (xmin, ymin, xmax, ymax) in user space.
        Returns list of (lower, upper, contained) tuples, merged/sorted.
        Port of the BFS in XZ2SFC.scala:197-303.
        """
        windows = []
        for (xmin, ymin, xmax, ymax) in queries:
            n = self._normalize(xmin, ymin, xmax, ymax, lenient=False)
            windows.append((float(n[0]), float(n[1]), float(n[2]), float(n[3])))

        range_stop = max_ranges if max_ranges is not None else 1 << 62
        ranges: list[tuple[int, int, bool]] = []
        # element: (xmin, ymin, xmax, ymax, length-of-non-extended-side)
        from collections import deque

        def children(el):
            xmin, ymin, xmax, ymax, ln = el
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            half = ln / 2.0
            return [
                (xmin, ymin, xc, yc, half),
                (xc, ymin, xmax, yc, half),
                (xmin, yc, xc, ymax, half),
                (xc, yc, xmax, ymax, half),
            ]

        def is_contained(el):
            xmin, ymin, xmax, ymax, ln = el
            xext, yext = xmax + ln, ymax + ln
            return any(w[0] <= xmin and w[1] <= ymin and w[2] >= xext and w[3] >= yext for w in windows)

        def is_overlapped(el):
            xmin, ymin, xmax, ymax, ln = el
            xext, yext = xmax + ln, ymax + ln
            return any(w[2] >= xmin and w[3] >= ymin and w[0] <= xext and w[1] <= yext for w in windows)

        pow4 = [int(p) for p in self._pow4]

        def seq_code_scalar(x, y, length):
            # scalar fast path of _sequence_code for driver-side planning
            xmin = ymin = 0.0
            xmax = ymax = 1.0
            cs = 0
            for i in range(length):
                xc = (xmin + xmax) / 2.0
                yc = (ymin + ymax) / 2.0
                q = (0 if x < xc else 1) + (0 if y < yc else 2)
                cs += 1 + q * ((pow4[i] - 1) // 3)
                if x < xc:
                    xmax = xc
                else:
                    xmin = xc
                if y < yc:
                    ymax = yc
                else:
                    ymin = yc
            return cs

        def seq_interval(x, y, length, partial):
            lo = seq_code_scalar(x, y, length)
            if partial:
                return lo, lo
            return lo, lo + (4 ** (self.g - length + 1) - 1) // 3

        TERMINATOR = None
        remaining = deque(children((0.0, 0.0, 1.0, 1.0, 1.0)))
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
                    lo, hi = seq_interval(nxt[0], nxt[1], level, partial=False)
                    ranges.append((lo, hi, True))
                elif is_overlapped(nxt):
                    lo, hi = seq_interval(nxt[0], nxt[1], level, partial=True)
                    ranges.append((lo, hi, False))
                    remaining.extend(children(nxt))

        # bottom out: remaining partial elements become full intervals
        while remaining:
            el = remaining.popleft()
            if el is TERMINATOR:
                level += 1
            else:
                lo, hi = seq_interval(el[0], el[1], level, partial=False)
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
