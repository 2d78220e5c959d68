"""Streaming temporal joins: the Structured-Streaming counterpart of
`operators/temporal.interval_join` for live feeds.

Spark's stream-stream inner join already implements the hard part
(state kept per side, pruned by watermark); what a pipeline needs on
top is the temporal-proximity condition spelled so the state bound is
actually derivable — both a time-range condition AND watermarks on both
sides, else the join buffers forever (the documented requirement for
stream-stream joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(left: DataFrame, right: DataFrame,
                         l_ts: str, r_ts: str, tol_s: int,
                         watermark: str = "2 minutes",
                         on: tuple | None = None) -> DataFrame:
    """Pairs of left/right stream rows with ``|l_ts - r_ts| <= tol_s``
    seconds (and optionally equal keys ``on=(l_key, r_key)``) — the
    enrichment join of live feeds ("ad impression within 10s of the
    click"). Column names must be disjoint across the two streams.

    Both sides get the same ``watermark``; with the two-sided range
    condition Spark derives a finite state bound (each side's buffer
    holds ~watermark + tol of data per key). Inner join: matches emit
    as soon as both rows arrive; state evicts as watermarks advance.
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"column names must be disjoint, got: {sorted(dup)}")
    l = left.withWatermark(l_ts, watermark)
    r = right.withWatermark(r_ts, watermark)
    iv = F.expr(f"INTERVAL {int(tol_s)} SECONDS")
    cond = ((F.col(l_ts) >= F.col(r_ts) - iv)
            & (F.col(l_ts) <= F.col(r_ts) + iv))
    if on is not None:
        lk, rk = on
        cond = (F.col(lk) == F.col(rk)) & cond
    return l.join(r, cond)
