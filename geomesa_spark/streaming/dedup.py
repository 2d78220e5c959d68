"""Streaming ingest dedup: exact content dedup over an unbounded
document stream — the ingest-time guard of a crawl pipeline (recrawls
and mirror fetches are the bulk of raw-crawl duplication; the batch
line/minhash passes in operators/ run later over the accumulated
corpus).

The stateful operator is Spark's dropDuplicatesWithinWatermark keyed
by a 256-bit content digest: state holds one (digest, event-time)
entry per distinct document inside the watermark horizon, so executor
state is bounded by the dedup window and the arrival rate, not corpus
size, and shards by digest across the cluster. sha256 (not a 64-bit
hash) because at web scale a birthday collision on 64 bits is a real
probability and a collision here silently DROPS a document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_dedup"]


def stream_dedup(stream: DataFrame, content_cols: list[str],
                 ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Drop every document whose content digest was already seen within
    the watermark horizon. The digest covers ``content_cols`` as a JSON
    struct — NOT concat_ws, which silently skips NULL columns and would
    hash ('x', NULL, 'y') and ('x', 'y', NULL) identically, silently
    dropping a distinct document. The first arrival wins and later
    copies are suppressed until the watermark passes ``delay`` beyond
    their event time.
    """
    key = F.sha2(F.to_json(F.struct(*[F.col(c) for c in content_cols]),
                           {"ignoreNullFields": "false"}), 256)
    return (stream.withColumn("__key__", key)
                  .withWatermark(ts_col, delay)
                  .dropDuplicatesWithinWatermark(["__key__"])
                  .drop("__key__"))
