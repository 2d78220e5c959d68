"""Streaming ingest into the z2-indexed store — the write half of the
reference's live pipeline (KafkaDataStore feeding a persistent store /
the Lambda store's persistence tier: geomesa-lambda/.../stream/
TransientStore.scala persists expired entries to the durable store).

``stream_ingest_indexed`` runs a micro-batch ``foreachBatch`` sink:
each batch is z2-keyed exactly like plans/store.write_indexed (same
hex key, same hive partitions, so ALL existing store queries —
bbox_query, query_store, compact_store — run unmodified over a store
that is still being appended to) and lands append-mode with a
per-batch manifest JSON recording row_count, the z2_p cell histogram
(the skew metric), and wall time — the same lineage+metrics discipline
as plans/checkpoint.py, per micro-batch.

Exactly-once: Spark replays a micro-batch after failure with the SAME
batch_id; the sink is idempotent by a batch-id manifest guard (a batch
whose manifest exists is skipped wholesale). This is the standard
foreachBatch idempotence contract, and the manifest doubles as the
resume/lineage record. The guard is checked on the driver (foreachBatch
runs driver-side), so there is no distributed race.

At 100 TB scale the same code runs against object storage: appends are
new files in existing hive partitions (no rewrite), and compaction
(plans/store.compact_store) bin-packs the accumulated small files on
whatever cadence the operator chooses.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

__all__ = ["stream_ingest_indexed", "ingest_manifests"]

_MANIFEST_DIR = "_stream_manifests"


def _batch_writer(path: str, x: str, y: str, digits: int, hist_top: int):
    from ..plans.store import z2_hex_udf

    mdir = os.path.join(path, _MANIFEST_DIR)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        mpath = os.path.join(mdir, f"batch-{batch_id}.json")
        if os.path.exists(mpath):  # replayed batch -> idempotent skip
            return
        t0 = time.monotonic()
        enc = z2_hex_udf()
        out = (batch_df.withColumn("z2_hex", enc(F.col(x), F.col(y)))
                       .withColumn("z2_p", F.substring("z2_hex", 1, digits)))
        out.persist()
        try:
            hist = (out.groupBy("z2_p").count()
                       .orderBy(F.col("count").desc(), "z2_p")
                       .limit(hist_top).collect())
            n = sum(r["count"] for r in hist) if len(hist) < hist_top else \
                out.count()
            (out.write.mode("append").partitionBy("z2_p").parquet(path))
        finally:
            out.unpersist()
        os.makedirs(mdir, exist_ok=True)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "row_count": n,
                       "cell_histogram": {r["z2_p"]: r["count"]
                                          for r in hist},
                       "wall_s": round(time.monotonic() - t0, 3),
                       "written_at": time.time()}, f)
        os.replace(tmp, mpath)  # manifest commits the batch atomically

    return write_batch


def stream_ingest_indexed(stream: DataFrame, path: str, checkpoint: str,
                          x: str = "lon", y: str = "lat", digits: int = 2,
                          hist_top: int = 64, trigger: dict | None = None):
    """Start a streaming query appending ``stream`` (point rows) into
    the z2-partitioned store at ``path``. Returns the StreamingQuery.

    The result is a live plans/store store: bbox_query/query_store
    prune its partitions exactly as for a batch-written one."""
    writer = (stream.writeStream
              .foreachBatch(_batch_writer(path, x, y, digits, hist_top))
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def ingest_manifests(path: str) -> list[dict]:
    """Read back the per-batch lineage manifests, batch order."""
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir),
                       key=lambda s: int(s.split("-")[1].split(".")[0])):
        with open(os.path.join(mdir, name)) as f:
            out.append(json.load(f))
    return out
