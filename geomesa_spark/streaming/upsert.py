"""Streaming feature cache: upsert-by-id with event-time ordering + TTL.

Re-expresses the reference Kafka datastore's live view (SURVEY.md §2.9)
as Structured Streaming:

- KafkaFeatureCache upsert-by-feature-id, latest state wins
  (geomesa-kafka .../index/KafkaFeatureCache.scala:24-31),
- event-time ordering — stale updates (older event time than the
  current state) are rejected (KafkaDataStoreParams.scala:227-276),
- TTL expiry (KafkaDataStoreParams.scala:208-226) via state timeout,
- deletes as tombstone rows (null geometry).

Implementation: ``applyInPandasWithState`` keyed by feature id. Each
micro-batch updates per-id state {lon, lat, ts}; output rows are the
current live state after the batch. Downstream spatial ops (cell join
against a polygon set, windowed density) consume the emitted updates —
the per-micro-batch analog of the reference's spatially-indexed cache.

``windowed_density`` is the watermarked tumbling-window tile count —
streaming raster aggregation with late-data handling (not in the
reference, which has no windowed aggregation; included because any
100 TB ingest pipeline needs it).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

__all__ = ["upsert_cache", "windowed_density", "streaming_sessions",
           "ttl_by_cql_expr"]

_STATE_SCHEMA = "ts LONG, lon DOUBLE, lat DOUBLE, ttl LONG"
_OUT_SCHEMA = StructType([
    StructField("feature_id", StringType()),
    StructField("ts", LongType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
    StructField("op", StringType()),     # upsert | reject_stale | delete
])


def ttl_by_cql_expr(rules: list[tuple[str, int]],
                    default_ms: int | None = None):
    """[(cql_predicate, ttl_ms), ...] -> per-row TTL Column; first match
    wins, else ``default_ms``.

    The reference's per-CQL-predicate dynamic expiry
    (KafkaDataStoreParams.scala:208-226: an ordered list of CQL filters,
    each with its own expiry; features matching none use the default).
    Predicates compile through functions/cql.py; spatial ones reference a
    ``geom`` column (``upsert_cache`` builds it from lon/lat when rules
    are passed — requires ``register_functions(spark)``).
    """
    from ..functions.cql import cql_to_sql

    col = None
    for cql, ttl in rules:
        cond = F.expr(cql_to_sql(cql))
        col = F.when(cond, F.lit(ttl)) if col is None else col.when(cond, F.lit(ttl))
    default = F.lit(default_ms).cast("long")
    return default if col is None else col.otherwise(default).cast("long")


def upsert_cache(updates: DataFrame, ttl_ms: int | None = None,
                 id_col: str = "feature_id", ts_col: str = "ts",
                 x_col: str = "lon", y_col: str = "lat",
                 ttl_by_cql: list[tuple[str, int]] | None = None,
                 order_col: str | None = None) -> DataFrame:
    """updates (streaming) -> live-state change feed.

    Emits one row per input update: op='upsert' when it advanced the
    state, 'reject_stale' when an older event arrived after a newer one
    (event-time ordering — applies to UPDATES; deletes are unconditional,
    matching KafkaFeatureCacheImpl.remove which ignores feature time, so
    a replayed pre-delete update CAN resurrect a feature — the reference's
    own at-least-once semantics), 'delete' for tombstones (null lon or
    null lat).

    Within a micro-batch, rows fold in ARRIVAL order (the reference
    consumes the Kafka partition log in offset order; event-time
    ordering means arrivals older than the current state are rejected,
    not that the batch is re-sorted). applyInPandasWithState preserves
    the source order for a single-partition source but gives no
    guaranteed cross-shuffle order in general — pass ``order_col`` (a
    per-message sequence/offset column) to pin a deterministic fold
    order when the source has one.

    ``ttl_ms`` is the uniform state TTL; ``ttl_by_cql`` is the reference's
    dynamic-expiry list — per-update TTL resolved by the first matching
    CQL predicate (see :func:`ttl_by_cql_expr`), falling back to
    ``ttl_ms``. The resolved TTL re-arms the state timeout on each
    accepted upsert only — a batch of rejected stale replays must NOT
    keep a feature alive past its expiry.
    """

    def update_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (fid,) = key
        if state.hasTimedOut:
            state.remove()
            return
        cur_ts = state.get[0] if state.exists else None
        live_ttl = state.get[3] if state.exists else None
        accepted = False
        rows = []
        for pdf in pdfs:
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="stable")
            for _, row in pdf.iterrows():
                ts = int(row[ts_col])
                ttl = row["__ttl__"]
                ttl = None if pd.isna(ttl) else int(ttl)
                x, y = row[x_col], row[y_col]
                tomb = (x is None or pd.isna(x) or y is None or pd.isna(y))
                rows.append((ts, tomb, None if tomb else float(x),
                             None if tomb else float(y), ttl))
        out = []
        for ts, tomb, x, y, ttl in rows:
            if tomb:
                if state.exists:
                    state.remove()
                cur_ts = None
                live_ttl = None
                out.append((fid, ts, None, None, "delete"))
                continue
            if cur_ts is not None and ts < cur_ts:
                out.append((fid, ts, x, y, "reject_stale"))
                continue
            cur_ts = ts
            live_ttl = ttl
            accepted = True
            state.update((ts, x, y, ttl))
            out.append((fid, ts, x, y, "upsert"))
        if accepted and state.exists and live_ttl is not None:
            state.setTimeoutDuration(live_ttl)
        yield pd.DataFrame(out, columns=["feature_id", "ts", "lon", "lat", "op"])

    any_ttl = ttl_ms is not None or bool(ttl_by_cql)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if any_ttl
               else GroupStateTimeout.NoTimeout)
    if ttl_by_cql:
        # resolve the TTL BEFORE narrowing the columns: the expiry rules
        # may reference any source attribute (the reference's CQL list is
        # attribute-based as often as spatial)
        src = updates.withColumn("geom", F.expr(f"st_makePoint({x_col}, {y_col})"))
        src = src.withColumn("__ttl__", ttl_by_cql_expr(ttl_by_cql, ttl_ms))
    else:
        src = updates.withColumn("__ttl__", F.lit(ttl_ms).cast("long"))
    keyed = src.select(
        F.col(id_col).alias("feature_id"),
        F.col(ts_col).cast("long").alias(ts_col) if ts_col != "ts" else F.col("ts").cast("long"),
        F.col(x_col), F.col(y_col), "__ttl__",
        *([F.col(order_col)] if order_col else []))
    return (keyed.groupBy("feature_id")
                 .applyInPandasWithState(update_fn, _OUT_SCHEMA, _STATE_SCHEMA,
                                         "append", timeout))


def windowed_density(points: DataFrame, window: str = "1 minute",
                     watermark: str = "2 minutes",
                     ts_col: str = "event_time",
                     x_col: str = "lon", y_col: str = "lat",
                     xmin: float = -180.0, ymin: float = -90.0,
                     xmax: float = 180.0, ymax: float = 90.0,
                     w: int = 360, h: int = 180) -> DataFrame:
    """Streaming tile density: tumbling event-time windows + watermark.

    Same GridSnap tile assignment as the batch operator, all built-in
    expressions — late rows beyond the watermark are dropped by Spark.
    """
    dx = (xmax - xmin) / w
    dy = (ymax - ymin) / h
    i = F.least(F.floor((F.col(x_col) - xmin) / dx), F.lit(w - 1)).cast("int")
    j = F.least(F.floor((F.col(y_col) - ymin) / dy), F.lit(h - 1)).cast("int")
    return (points.withWatermark(ts_col, watermark)
            .filter((F.col(x_col) >= xmin) & (F.col(x_col) <= xmax)
                    & (F.col(y_col) >= ymin) & (F.col(y_col) <= ymax))
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     i.alias("i"), j.alias("j"))
            .agg(F.count("*").alias("weight")))


def streaming_sessions(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "event_time",
                       gap: str = "30 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Streaming gap-based sessionization: Spark's native session_window
    (dynamic-gap event-time windows that merge as events arrive) + a
    watermark to bound state — the streaming twin of
    operators/temporal.sessionize. Emits one row per closed session:
    (key, session start/end, n_events). State per key is one open
    window; late rows beyond the watermark drop, exactly the policy a
    100 TB clickstream needs to keep state finite.
    """
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.col(key_col),
                     F.session_window(F.col(ts_col), gap).alias("session"))
            .agg(F.count("*").alias("n_events"))
            .select(key_col, F.col("session.start").alias("t_start"),
                    F.col("session.end").alias("t_end"), "n_events"))
