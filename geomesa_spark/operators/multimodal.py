"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
mapInPandas signatures, partition sizing. The DECODE step is a pluggable
seam: ``decode_image_features``/``sample_video_frames`` take a
``decoder`` callable that runs per row inside the Arrow batch loop;
production injects a PIL/torchvision/ffmpeg-backed callable there.
REAL decoders exist for PNG and WAV (operators/media.py — stdlib zlib +
wave, cross-engine oracle-checked by the image_feats/audio_feats gate
queries); formats needing absent codecs (JPEG/MP4) default to the
documented deterministic fake (sha256-seeded features / pseudo-frames):
byte-stable, pipeline-identical batch shape.

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
    "fake_image_decoder", "fake_frame_decoder",
]


def fake_image_decoder(dim: int = 64):
    """The default decode seam: bytes -> deterministic unit vector
    (sha256-seeded). Stable across runs/engines; replace with a real
    codec callable in production."""

    def decode(b: bytes):
        digest = hashlib.sha256(bytes(b)).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.RandomState(seed % (2 ** 32))
        v = rng.standard_normal(dim).astype(np.float32)
        return (v / np.linalg.norm(v)).tolist()

    return decode


def fake_frame_decoder(every_ms: int = 1000):
    """Default frame seam: one deterministic 16-byte pseudo-frame per
    sample instant."""

    def decode(b: bytes, duration_ms: int):
        n = max(1, int(duration_ms) // every_ms)
        base = hashlib.sha256(bytes(b)).digest()
        return [(i, hashlib.sha256(base + i.to_bytes(4, "little")).digest()[:16])
                for i in range(n)]

    return decode

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
                          content_col: str = "content",
                          decoder=None) -> DataFrame:
    """image bytes -> feature vector via mapInPandas.

    ``decoder`` is the pluggable seam: a picklable callable
    ``bytes -> sequence[float] | None`` executed per row inside the Arrow
    batch loop (inject a PIL/torchvision-backed callable in production).
    Default (and ``fake=True``, kept for compatibility): the deterministic
    sha256-seeded fake — pipeline-identical batch shape so downstream
    ANN/dedup stages are fully exercised; the codec itself is NOT
    verified in this container (no media libraries).
    """
    del fake  # the deterministic fake IS the default decoder
    if decoder is None:
        decoder = fake_image_decoder(dim)

    def run(iterator):
        for pdf in iterator:
            feats = [None if b is None else decoder(bytes(b))
                     for b in pdf[content_col]]
            yield pd.DataFrame({"media_id": pdf[id_col], "features": feats})

    return df.mapInPandas(run, _FEAT_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_video_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False,
                        id_col: str = "media_id", content_col: str = "content",
                        duration_col: str = "duration_ms",
                        decoder=None) -> DataFrame:
    """video bytes -> sampled frames (one row per frame) via mapInPandas.

    ``decoder`` seam: a picklable callable
    ``(bytes, duration_ms) -> [(frame_idx, frame_bytes), ...]`` (inject an
    ffmpeg/av-backed callable in production). Default: the deterministic
    pseudo-frame fake — the explode/repartition shape is real, the codec
    is not verified in this container.
    """
    del fake
    if decoder is None:
        decoder = fake_frame_decoder(every_ms)

    def run(iterator):
        for pdf in iterator:
            ids, idxs, frames = [], [], []
            for mid, b, dur in zip(pdf[id_col], pdf[content_col], pdf[duration_col]):
                if b is None or dur is None:
                    continue
                for i, fr in decoder(bytes(b), int(dur)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
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
