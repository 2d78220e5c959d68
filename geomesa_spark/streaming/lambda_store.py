"""Lambda store: transient updates merged over a persistent tier.

The reference LambdaDataStore (geomesa-lambda/.../data/LambdaDataStore
.scala, stream/TransientStore.scala) serves queries from a Kafka-backed
transient tier merged with a long-term store, persisting transient
features periodically. Batch-level re-expression:

Note: compaction physically drops tombstones, so a later update with an
event time OLDER than a dropped tombstone would resurrect the feature —
matching at-compaction-boundary semantics; keep tombstones in the
transient tier for the out-of-orderness window if that matters.

- persistent tier: parquet directory (append-only update files),
- ``merged_view``: persistent ∪ transient with latest-wins per feature
  id (event-time, ties broken by the transient side), tombstones (null
  payload) delete,
- ``persist``: fold the transient batch into the persistent tier and
  compact to one latest-state file set (the reference's periodic
  persistence + metadata compaction, FileSystemStorage.scala:311-331).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["LambdaStore"]


class LambdaStore:
    def __init__(self, spark, path: str, id_col: str = "feature_id",
                 ts_col: str = "ts"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.ts_col = ts_col

    def _persistent(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def _latest(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.id_col).orderBy(
            F.col(self.ts_col).desc(), F.col("__tier__").desc())
        return (df.withColumn("__rn__", F.row_number().over(w))
                  .filter(F.col("__rn__") == 1)
                  .drop("__rn__", "__tier__"))

    def merged_view(self, transient: DataFrame | None = None) -> DataFrame:
        """Latest state per feature id across both tiers; tombstones
        (rows whose payload columns are all null apart from id/ts) are
        dropped from the view after winning."""
        pers = self._persistent()
        parts = []
        if pers is not None:
            parts.append(pers.withColumn("__tier__", F.lit(0)))
        if transient is not None:
            parts.append(transient.withColumn("__tier__", F.lit(1)))
        if not parts:
            raise ValueError("empty lambda store: no persistent or transient data")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        latest = self._latest(df)
        payload = [c for c in latest.columns if c not in (self.id_col, self.ts_col)]
        alive = latest
        if payload:
            cond = None
            for c in payload:
                nn = F.col(c).isNotNull()
                cond = nn if cond is None else (cond | nn)
            alive = latest.filter(cond)
        return alive

    def persist(self, transient: DataFrame) -> None:
        """Fold transient into the persistent tier and compact to the
        latest state (tombstones physically removed).

        Atomic-by-rename (same commit discipline as plans/checkpoint):
        the compacted state lands in a scratch directory while the live
        tier is still readable, then swaps in via rename — an in-place
        overwrite would delete the ONLY copy before the new write
        commits, so a crash mid-persist would destroy the store.
        """
        import shutil
        import uuid

        merged = self.merged_view(transient)
        token = uuid.uuid4().hex[:8]
        tmp = f"{self.path}.compact-{token}"
        try:
            merged.write.mode("overwrite").parquet(tmp)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        old = f"{self.path}.old-{token}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
