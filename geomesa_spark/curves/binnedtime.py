"""Epoch time binning: (bin, offset) pairs per time period.

Semantics from the reference BinnedTime
(/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/BinnedTime.scala:148-292):

- day:   bin = days since 1970-01-01Z,   offset = millis into day
- week:  bin = weeks since epoch,        offset = seconds into week (default)
- month: bin = calendar months since epoch, offset = seconds into month
- year:  bin = calendar years since epoch,  offset = minutes into year

max offsets: day -> 86400000 ms, week -> 604800 s, month -> 86400*31 s,
year -> 1440*366 + 10 minutes (leap-second fudge).

All functions vectorized over int64 epoch-millis arrays using numpy
datetime64 calendar arithmetic (months/years are calendar units, matching
java.time ChronoUnit.between on UTC dates).
"""

from __future__ import annotations

import numpy as np

DAY_MS = 86_400_000
WEEK_S = 604_800

MAX_OFFSET = {
    "day": 86_400_000,          # millis in a day
    "week": 604_800,            # seconds in a week
    "month": 86_400 * 31,       # seconds in 31 days
    "year": 1_440 * 366 + 10,   # minutes in 366 days + 10min fudge
}

PERIODS = ("day", "week", "month", "year")


def time_to_binned(millis, period: str = "week"):
    """epoch-millis → (bin:int16-range int64, offset:int64), vectorized."""
    ms = np.asarray(millis, dtype=np.int64)
    if period == "day":
        return ms // DAY_MS, ms % DAY_MS
    if period == "week":
        s = ms // 1000
        return s // WEEK_S, s % WEEK_S
    dt = ms.astype("datetime64[ms]")
    if period == "month":
        months = dt.astype("datetime64[M]")
        bins = months.astype(np.int64)  # months since 1970-01
        start_s = months.astype("datetime64[s]").astype(np.int64)
        return bins, ms // 1000 - start_s
    if period == "year":
        years = dt.astype("datetime64[Y]")
        bins = years.astype(np.int64)  # years since 1970
        start_s = years.astype("datetime64[s]").astype(np.int64)
        return bins, (ms // 1000 - start_s) // 60
    raise ValueError(f"unknown period: {period}")


def binned_to_time(bins, offsets, period: str = "week"):
    """(bin, offset) → epoch-millis, vectorized (inverse of time_to_binned)."""
    b = np.asarray(bins, dtype=np.int64)
    o = np.asarray(offsets, dtype=np.int64)
    if period == "day":
        return b * DAY_MS + o
    if period == "week":
        return (b * WEEK_S + o) * 1000
    if period == "month":
        start = b.astype("datetime64[M]").astype("datetime64[s]").astype(np.int64)
        return (start + o) * 1000
    if period == "year":
        start = b.astype("datetime64[Y]").astype("datetime64[s]").astype(np.int64)
        return (start + o * 60) * 1000
    raise ValueError(f"unknown period: {period}")


def max_bin_millis(period: str = "week") -> int:
    """Exclusive max indexable epoch-millis (bin must fit a signed short)."""
    n = 32_768  # Short.MaxValue + 1
    if period == "day":
        return n * DAY_MS
    if period == "week":
        return n * WEEK_S * 1000
    if period == "month":
        return np.int64(n).astype("datetime64[M]").astype("datetime64[ms]").astype(np.int64)
    if period == "year":
        return np.int64(n).astype("datetime64[Y]").astype("datetime64[ms]").astype(np.int64)
    raise ValueError(f"unknown period: {period}")
