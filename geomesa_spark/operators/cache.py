"""Persisted-intermediate bookkeeping for lazy operator results.

Several operators persist() intermediates that multiple branches of the
returned (still lazy) plan reference — without it Spark would recompute
the expensive stage per branch. The caches can only be freed AFTER the
caller materializes the result, so the operator attaches them to the
returned DataFrame and the caller releases them explicitly:

    pairs = minhash_dedup_pairs(docs, "id", "text")
    pairs.write.parquet(out)          # action materializes
    release(pairs)                    # frees executor storage
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["attach_cached", "release"]


def attach_cached(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record persisted intermediates on the result for ``release``."""
    out._geomesa_cached = list(cached)  # type: ignore[attr-defined]
    return out


def release(df: DataFrame) -> None:
    """Unpersist the intermediates an operator cached (call after an
    action has materialized the result — the counterpart of
    PreparedPipPolys.release for long-lived sessions)."""
    for c in getattr(df, "_geomesa_cached", []):
        c.unpersist()
