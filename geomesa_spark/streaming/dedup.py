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
    the watermark horizon. The digest is operators/dedup.content_digest —
    THE shared exact-dedup key (null-safe length-prefixed encoding for
    multi-column content), so the stream's implicit digest state speaks
    the same language as the batch index: a corpus deduped at ingest can
    later be probed/merged by exact_dedup / corpus.incremental_dedup
    without re-hashing under a second convention. The first arrival wins
    and later copies are suppressed until the watermark passes ``delay``
    beyond their event time.
    """
    from ..operators.dedup import content_digest

    key = content_digest(*content_cols)
    return (stream.withColumn("__key__", key)
                  .withWatermark(ts_col, delay)
                  .dropDuplicatesWithinWatermark(["__key__"])
                  .drop("__key__"))
