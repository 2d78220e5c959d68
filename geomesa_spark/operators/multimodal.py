"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
mapInPandas signatures, partition sizing. The actual media decode is
STUBBED: the container has no image/audio libraries, so ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (splitmix of the bytes) produces stable
"features" so the pipeline is end-to-end testable.

Scale notes: media rows are large — ``maxRecordsPerBatch`` should be
lowered (128-512) so Arrow batches stay under executor memory; the
repartition helper spreads rows by byte size so one partition doesn't
get all the 100 MB videos.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA", "media_metadata", "decode_image_features",
    "sample_video_frames", "repartition_by_bytes",
]

# the engine's canonical multimodal row
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), True),      # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])


def media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata: byte length + sha256 (no decode)."""
    return df.withColumn("n_bytes", F.length(F.col(content_col))) \
             .withColumn("content_sha", F.sha2(F.col(content_col), 256))


_FEAT_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def decode_image_features(df: DataFrame, dim: int = 64, fake: bool = False,
                          id_col: str = "media_id",
                          content_col: str = "content") -> DataFrame:
    """image bytes -> feature vector via mapInPandas.

    Real decode path (PIL/torchvision) is NOT available in this container:
    raises NotImplementedError unless ``fake=True``. The fake path hashes
    the bytes into a deterministic unit vector — pipeline-identical batch
    shape, so downstream ANN/dedup stages are fully exercised.
    """

    def run(iterator):
        for pdf in iterator:
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append(None)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image decode requires PIL/torchvision (not in container); "
                        "pass fake=True for the deterministic test decoder")
                digest = hashlib.sha256(bytes(b)).digest()
                seed = int.from_bytes(digest[:8], "little")
                rng = np.random.RandomState(seed % (2**32))
                v = rng.standard_normal(dim).astype(np.float32)
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.mapInPandas(run, _FEAT_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_video_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False,
                        id_col: str = "media_id", content_col: str = "content",
                        duration_col: str = "duration_ms") -> DataFrame:
    """video bytes -> sampled frames (one row per frame) via mapInPandas.

    Frame decode is stubbed like decode_image_features; the fake path
    emits one deterministic 16-byte pseudo-frame per sample instant so
    the explode/repartition shape is real.
    """

    def run(iterator):
        for pdf in iterator:
            ids, idxs, frames = [], [], []
            for mid, b, dur in zip(pdf[id_col], pdf[content_col], pdf[duration_col]):
                if b is None or dur is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg/av (not in container); "
                        "pass fake=True for the deterministic test decoder")
                n = max(1, int(dur) // every_ms)
                base = hashlib.sha256(bytes(b)).digest()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.sha256(base + i.to_bytes(4, "little")).digest()[:16])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, _FRAME_SCHEMA)


def repartition_by_bytes(df: DataFrame, content_col: str = "content",
                         target_partition_bytes: int = 256 << 20) -> DataFrame:
    """Spread media rows so each partition holds ~target bytes.

    Salted key = cumulative-free approximation: hash spread weighted by
    ceil(row_bytes / 4 MB) so huge blobs get their own partitions.
    """
    chunks = F.ceil(F.length(F.col(content_col)) / F.lit(4 << 20))
    key = F.xxhash64(F.col(content_col)) + chunks
    n = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    return df.repartition(n, key)
