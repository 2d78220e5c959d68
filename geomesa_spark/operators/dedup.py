"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators over a documents table (id + text). All
hot-path math is either JVM built-ins or Arrow-batched numpy; shuffles move
only (key, id) pairs — never document text.

Scale notes (100 TB corpus):
- exact: shuffle key is a 256-bit content hash, not the text; map-side
  partial aggregation collapses duplicates before the shuffle.
- minhash: signature computation is embarrassingly parallel; the band
  buckets are the only shuffle key. Hot buckets (boilerplate pages) are
  the skew risk -> ``max_bucket`` caps candidate fanout per bucket, the
  same guard the reference applies to scan ranges
  (geomesa-index-api QueryProperties.scala:24 range cap).
- verification joins re-read text but only for candidate pairs (a tiny
  fraction of n^2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "exact_dedup", "minhash_signature_udf", "minhash_dedup_pairs",
    "simhash_udf", "simhash_dedup_pairs", "ngram_jaccard_pairs",
]

MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, id_col: str, *content_cols: str) -> DataFrame:
    """Keep one row per distinct content: returns (content_hash, keep_id, dup_count).

    keep_id = min(id) per group (deterministic winner).
    """
    key = F.sha2(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]), 256)
    return (df.withColumn("content_hash", key)
              .groupBy("content_hash")
              .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count")))


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the k-word shingles of ``text``."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    # FNV-1a over utf-8 bytes, vectorized enough for short shingles
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = np.uint64(0xCBF29CE484222325)
        for b in s.encode():
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return np.unique(out)


def minhash_signature_udf(num_hashes: int = 64, shingle_k: int = 3, seed: int = 42):
    """pandas UDF: text -> array<long> minhash signature.

    Multiply-shift universal hashing: h_i(x) = (a_i * x) with odd a_i over
    uint64 wraparound — fully vectorized (no arbitrary-precision ints),
    the standard fast MinHash family.
    """
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 1 << 62, size=num_hashes).astype(np.uint64) << np.uint64(1)) | np.uint64(1)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            sh = _shingle_hashes(t, shingle_k)
            if len(sh) == 0:
                out.append([0] * num_hashes)
                continue
            vals = a[:, None] * sh[None, :]  # uint64 wraparound
            out.append((vals.min(axis=1).astype(np.int64)).tolist())
        return pd.Series(out, dtype=object)

    return sig


def minhash_dedup_pairs(
    df: DataFrame, id_col: str, text_col: str,
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 3,
    threshold: float = 0.7, seed: int = 42, max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard) via MinHash banding.

    est_jaccard = fraction of matching signature components (the unbiased
    MinHash estimator), computed on the candidate pairs surfaced by the
    band-bucket join and thresholded.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle_k, seed)
    with_sig = df.select(F.col(id_col).alias("__id__"),
                         sig(F.col(text_col)).alias("__sig__"))

    band_cols = [
        F.xxhash64(F.slice("__sig__", b * rows_per_band + 1, rows_per_band)
                   .cast("array<string>").cast("string"), F.lit(b)).alias("__bucket__")
        for b in range(bands)
    ]
    buckets = with_sig.select(
        "__id__", "__sig__",
        F.explode(F.array(*band_cols)).alias("__bucket__"))

    # cap pathological buckets (boilerplate skew guard)
    wb = Window.partitionBy("__bucket__").orderBy("__id__")
    buckets = (buckets.withColumn("__bn__", F.row_number().over(wb))
                      .filter(F.col("__bn__") <= max_bucket).drop("__bn__"))

    l = buckets.select(F.col("__id__").alias("id_a"), F.col("__sig__").alias("__sa__"), "__bucket__")
    r = buckets.select(F.col("__id__").alias("id_b"), F.col("__sig__").alias("__sb__"), "__bucket__")
    cand = (l.join(r, on="__bucket__").filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))

    est = (F.size(F.filter(F.zip_with("__sa__", "__sb__", lambda x, y: x == y),
                           lambda m: m)) / F.lit(float(num_hashes)))
    return (cand.withColumn("est_jaccard", est)
                .filter(F.col("est_jaccard") >= threshold)
                .select("id_a", "id_b", "est_jaccard"))


def simhash_udf(shingle_k: int = 2):
    """pandas UDF: text -> 64-bit SimHash (long)."""

    @F.pandas_udf(LongType())
    def sim(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            hs = _shingle_hashes(t, shingle_k)
            if len(hs) == 0:
                out.append(0)
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            v = 0
            for bit in np.where(votes > 0)[0]:
                v |= 1 << int(bit)
            out.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pd.Series(out, dtype=object)

    return sim


def simhash_dedup_pairs(df: DataFrame, id_col: str, text_col: str,
                        max_hamming: int = 3, shingle_k: int = 2) -> DataFrame:
    """Near-dup pairs by SimHash: band on 4x16-bit chunks (any pair within
    hamming distance 3 shares at least one exact chunk), verify hamming."""
    sim = simhash_udf(shingle_k)
    s = df.select(F.col(id_col).alias("__id__"), sim(F.col(text_col)).alias("__h__"))
    chunks = s.select(
        "__id__", "__h__",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.shiftright("__h__", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("v"))
            for c in range(4)
        ])).alias("__k__"))
    l = chunks.select(F.col("__id__").alias("id_a"), F.col("__h__").alias("__ha__"), "__k__")
    r = chunks.select(F.col("__id__").alias("id_b"), F.col("__h__").alias("__hb__"), "__k__")
    cand = (l.join(r, on="__k__").filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("__ha__").bitwiseXOR(F.col("__hb__")))
    return (cand.withColumn("hamming", ham)
                .filter(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5,
                        prefix_filter: bool = False) -> DataFrame:
    """Exact n-gram (word) Jaccard similarity join via inverted index.

    Classic exact algorithm: explode distinct shingles, self-join on the
    shingle (the shuffle key is the shingle hash), count common shingles
    per pair, jaccard = common / (|A| + |B| - common). Returns
    (id_a < id_b, jaccard). All built-in expressions, no Python.

    prefix_filter=True applies the PPJoin-style prefix filter (exact, no
    false negatives): shingles sort by a global canonical order and only
    the first ``n_i - ceil(t * n_i) + 1`` per document enter the inverted
    index; candidate pairs then verify the true jaccard via an
    array_intersect join-back. Dramatically fewer candidates for high
    thresholds — the scale path; pointless below t ~ 0.5.
    """
    words = F.split(F.col(text_col), r"\s+")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))))
    base = df.select(F.col(id_col).alias("__id__"), grams.alias("__g__")) \
             .withColumn("__n__", F.size("__g__"))

    if prefix_filter:
        hashed = base.withColumn("__h__", F.array_sort(
            F.transform("__g__", lambda g: F.xxhash64(g))))
        prefix_len = (F.col("__n__")
                      - F.ceil(F.col("__n__") * F.lit(float(threshold))).cast("int")
                      + F.lit(1))
        ex = (hashed.select("__id__", "__n__", "__h__",
                            F.explode(F.slice("__h__", 1, prefix_len)).alias("__gram__")))
        l = ex.select(F.col("__id__").alias("id_a"), "__gram__")
        r = ex.select(F.col("__id__").alias("id_b"), "__gram__")
        cand = (l.join(r, on="__gram__").filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))
        ga = hashed.select(F.col("__id__").alias("id_a"),
                           F.col("__h__").alias("__ha__"), F.col("__n__").alias("__na__"))
        gb = hashed.select(F.col("__id__").alias("id_b"),
                           F.col("__h__").alias("__hb__"), F.col("__n__").alias("__nb__"))
        verified = (cand.join(ga, on="id_a").join(gb, on="id_b")
                        .withColumn("__common__",
                                    F.size(F.array_intersect("__ha__", "__hb__"))))
        jac = F.col("__common__") / (F.col("__na__") + F.col("__nb__") - F.col("__common__"))
        return (verified.withColumn("jaccard", jac)
                        .filter(F.col("jaccard") >= threshold)
                        .select("id_a", "id_b", "jaccard"))

    ex = base.select("__id__", "__n__",
                     F.explode("__g__").alias("__gram__")) \
             .withColumn("__gram__", F.xxhash64("__gram__"))
    l = ex.select(F.col("__id__").alias("id_a"), F.col("__n__").alias("__na__"), "__gram__")
    r = ex.select(F.col("__id__").alias("id_b"), F.col("__n__").alias("__nb__"), "__gram__")
    common = (l.join(r, on="__gram__").filter(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b", "__na__", "__nb__")
               .agg(F.count("*").alias("__common__")))
    jac = F.col("__common__") / (F.col("__na__") + F.col("__nb__") - F.col("__common__"))
    return (common.withColumn("jaccard", jac)
                  .filter(F.col("jaccard") >= threshold)
                  .select("id_a", "id_b", "jaccard"))
