"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``: exact brute-force baseline. The query matrix is
  broadcast; each Arrow batch of the corpus does ONE numpy matmul and
  emits only its per-query local top-k, so the final exact window sees
  ~(#queries * k * #partitions) rows regardless of corpus size. This is
  the map-side-combine shape of the reference's server-side aggregation
  scans (geomesa-index-api iterators/AggregatingScan.scala).
- ``cosine_topk_sql``: the same computation as pure built-in HOF
  expressions (aggregate/zip_with) — slower per-row but fully
  SQL-expressible (used for DuckDB oracle checks).
- ``lsh_topk``: random-hyperplane LSH. Corpus vectors hash to sign-bit
  band buckets; queries probe their buckets; exact cosine refine on the
  candidates. Recall < 1 by design; the scale path when the corpus
  can't be fully scanned per query batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StructField, StructType,
)

__all__ = ["cosine_topk", "cosine_topk_sql", "lsh_topk", "ivf_topk",
           "cosine_dedup_pairs", "cosine_sim_col", "mix64",
           "quantize_int8", "quantized_topk", "semantic_dedup",
           "random_projection", "pq_train", "pq_encode", "pq_topk",
           "ivfadc_topk", "embedding_outliers", "recall_at_k"]

from .cache import attach_cached as _attach_cached  # noqa: E402


def cosine_sim_col(a, b) -> F.Column:
    """Built-in cosine similarity between two array<float/double> columns.

    Sequential left-to-right double accumulation (matches DuckDB's
    list_cosine_similarity evaluation order).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    nb = F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return dot / F.sqrt(na * nb)


_CAND_SCHEMA = StructType([
    StructField("qid", LongType()),
    StructField("vec_id", LongType()),
    StructField("sim", DoubleType()),
])


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                query_id: str = "qid", query_vec: str = "embedding",
                corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query. Returns (qid, vec_id, sim, rank)."""
    qrows = queries.select(F.col(query_id).cast("long"), query_vec).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((qids, qnorm))

    def topk_per_batch(iterator):
        ids_b, qn = bq.value
        for pdf in iterator:
            cids = pdf[corpus_id].to_numpy(np.int64)
            cmat = np.array(list(pdf[corpus_vec]), dtype=np.float64)
            cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = qn @ cn.T  # (nq, nc)
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "qid": np.repeat(ids_b, kk),
                "vec_id": cids[idx].ravel(),
                "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    cand = corpus.select(corpus_id, corpus_vec).mapInPandas(topk_per_batch, _CAND_SCHEMA)
    win = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k))


def cosine_topk_sql(queries: DataFrame, corpus: DataFrame, k: int,
                    query_id: str = "qid", query_vec: str = "qvec",
                    corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """Exact top-k via built-in expressions only (broadcast cross join)."""
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv__"))
    c = corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("__cv__"))
    joined = c.crossJoin(F.broadcast(q))
    sim = cosine_sim_col("__qv__", "__cv__")
    win = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (joined.withColumn("sim", sim)
                  .withColumn("rank", F.row_number().over(win))
                  .filter(F.col("rank") <= k)
                  .select("qid", "vec_id", "sim", "rank"))


def _sq_norm_col(vec) -> F.Column:
    """Exact squared norm of an array column as a built-in fold (the
    zero-vector guard: a zero embedding has no direction, so cosine
    against it is NaN — numpy drops NaN comparisons while DuckDB sorts
    NaN greatest, a cross-engine divergence unless such rows are
    excluded up front)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    dv = F.transform(v, lambda x: x.cast("double"))
    return F.aggregate(dv, F.lit(0.0), lambda acc, x: acc + x * x)


def _blocked(c: DataFrame, B: int) -> DataFrame:
    """Attach triangle block-pair keys to a frame with (__id__, __v__):
    every row hashes to one of ``B`` buckets and explodes to its B
    unordered bucket-pair keys __k__ (each row replicates exactly B
    times; each (bi <= bj) tile lands in one task)."""
    c = c.withColumn("__b__", F.pmod(F.xxhash64("__id__"), F.lit(B)).cast("int"))
    pair_keys = F.array(*[
        F.least(F.col("__b__"), F.lit(o)) * B + F.greatest(F.col("__b__"), F.lit(o))
        for o in range(B)])
    return c.withColumn("__k__", F.explode(F.array_distinct(pair_keys)))


def _tile_pairs(keyed: DataFrame, B: int, thresh: float,
                group_cols: list[str]) -> DataFrame:
    """One GEMM per (group, block-pair) tile over normalized vectors,
    emitting candidate (id_a < id_b) pairs with sim >= thresh (GEMM
    summation order — callers re-filter with :func:`cosine_sim_col`)."""

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id__"].to_numpy(np.int64)
        mat = np.array(list(pdf["__v__"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        blk = pdf["__b__"].to_numpy()
        bi, bj = divmod(int(pdf["__k__"].iloc[0]), B)
        if bi == bj:
            sims = mat @ mat.T
            ii, jj = np.nonzero(np.triu(sims >= thresh, k=1))
            a, b = ids[ii], ids[jj]
        else:
            li, rj = blk == bi, blk == bj
            sims = mat[li] @ mat[rj].T
            ii, jj = np.nonzero(sims >= thresh)
            a, b = ids[li][ii], ids[rj][jj]
        return pd.DataFrame({"id_a": np.minimum(a, b).astype(np.int64),
                             "id_b": np.maximum(a, b).astype(np.int64)})

    out_schema = StructType([StructField("id_a", LongType()),
                             StructField("id_b", LongType())])
    return keyed.groupBy(*group_cols).applyInPandas(tile, out_schema)


def _sample_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                      n: int, seed: int) -> np.ndarray:
    """Deterministic coarse quantizer shared by :func:`ivf_topk`
    (init='sample') and :func:`semantic_dedup`: the ``n`` corpus vectors
    with smallest splitmix64(id) (ties by id), NORMALIZED — fully
    reproducible, so SQL oracles mirror the pick with the same mix.
    Zero-norm vectors must be filtered by the caller (they would yield
    NaN centroids that poison every argmax)."""

    @F.pandas_udf(LongType())
    def _mixu(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed).astype(np.int64))

    picked = (corpus.select(F.col(id_col).cast("long").alias("__i__"),
                            F.col(vec_col).alias("__v__"))
                    .withColumn("__m__", _mixu("__i__"))
                    .orderBy("__m__", "__i__").limit(n).collect())
    cent = np.array([r["__v__"] for r in picked], dtype=np.float64)
    if cent.size:
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    return cent


def cosine_dedup_pairs(corpus: DataFrame, tau: float,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       blocks: int = 4, eps: float = 1e-6) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a < id_b) with
    cosine(a, b) >= tau.

    Triangle block join: every row hashes to one of ``blocks`` buckets;
    each unordered bucket pair (bi <= bj) is a shuffle key, so a row
    replicates exactly ``blocks`` times and each task sees one
    (n/B x n/B) tile — ONE numpy GEMM per tile, per-task memory bounded
    by the tile, total work the unavoidable O(n^2/2) of an exact
    similarity self-join. Candidates pass at ``tau - eps`` (GEMM
    summation order differs from sequential accumulation at ~1e-15
    relative); the reported row set is then re-filtered with
    :func:`cosine_sim_col` (sequential-double built-ins, matching the
    DuckDB mirror) so output membership is engine-order independent.
    Zero-norm (direction-free) vectors are excluded — cosine against
    them is NaN, which numpy and SQL engines order differently.

    At web scale exact n^2 is the *verifier*, not the planner: generate
    candidates with :func:`lsh_topk` buckets / minhash bands and feed
    pairs through the same ``cosine_sim_col >= tau`` refine.
    """
    B = int(blocks)
    if B < 1:
        raise ValueError(f"blocks must be >= 1, got {blocks}")
    c = (corpus.select(F.col(id_col).cast("long").alias("__id__"),
                       F.col(vec_col).alias("__v__"))
               .filter(_sq_norm_col("__v__") > 0))
    cand = _tile_pairs(_blocked(c, B), B, float(tau) - float(eps), ["__k__"])
    va = c.select(F.col("__id__").alias("id_a"), F.col("__v__").alias("__va__"))
    vb = c.select(F.col("__id__").alias("id_b"), F.col("__v__").alias("__vb__"))
    return (cand.join(va, "id_a").join(vb, "id_b")
                .filter(cosine_sim_col("__va__", "__vb__") >= tau)
                .select("id_a", "id_b"))


def mix64(ids: np.ndarray, seed: int = 42) -> np.ndarray:
    """splitmix64 of id (63-bit output: >>1 keeps int64-signed ordering
    identical to the unsigned order, so Spark and SQL mirrors sort alike)."""
    k = (0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF
    z = ids.astype(np.uint64) + np.uint64(k)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (z ^ (z >> np.uint64(31))) >> np.uint64(1)


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             train_sample: int = 10_000, init: str = "kmeans", iters: int = 10,
             query_id: str = "qid", query_vec: str = "qvec",
             corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """IVF (inverted-file) ANN: coarse centroids partition the corpus;
    each query probes its ``n_probe`` nearest centroid lists and refines
    exact cosine there.

    init="kmeans": driver-side mini k-means over a bounded sample (the
    standard IVF recipe). init="sample": the coarse quantizer is the
    ``n_centroids`` corpus vectors with the smallest splitmix64(id) —
    fully deterministic and cross-engine reproducible (the DuckDB oracle
    mirrors it), the FAISS "random data points as centroids" variant;
    set iters=0 to skip Lloyd refinement entirely. Assignment and probing
    are vectorized pUDFs. Recall grows with n_probe (== n_centroids ->
    exact).
    """
    if init == "sample" and iters:
        # validate BEFORE any Spark action: the centroid-pick collect is
        # an expensive job to run just to crash on a bad argument combo
        raise ValueError(
            "init='sample' is the deterministic (oracle-mirrorable) coarse "
            "quantizer and supports no Lloyd refinement; pass iters=0 or "
            "use init='kmeans'")
    if init == "sample":
        cent = _sample_centroids(corpus, corpus_id, corpus_vec,
                                 n_centroids, seed)
        sample = None
    elif init == "kmeans":
        sample = np.array([r[0] for r in
                           corpus.select(corpus_vec).limit(train_sample).collect()],
                          dtype=np.float64)
        sample /= np.linalg.norm(sample, axis=1, keepdims=True)
        rng = np.random.RandomState(seed)
        cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)),
                                 replace=False)].copy()
    else:
        raise ValueError(f"unknown init {init!r} (expected 'kmeans' or 'sample')")
    for _ in range(iters if sample is not None else 0):
        # mini k-means (cosine = dot on normalized vectors)
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    bc = corpus.sparkSession.sparkContext.broadcast(cent)

    def list_of(vecs: pd.Series, top: int) -> pd.Series:
        mat = np.array(list(vecs), dtype=np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ bc.value.T
        if top == 1:
            return pd.Series(sims.argmax(axis=1).astype(np.int64))
        idx = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.tolist() for row in idx.astype(np.int64)], dtype=object)

    @F.pandas_udf(LongType())
    def assign_one(vecs: pd.Series) -> pd.Series:
        return list_of(vecs, 1)

    @F.pandas_udf(ArrayType(LongType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        return list_of(vecs, n_probe)

    c = (corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("__cv__"))
               .withColumn("__list__", assign_one(F.col("__cv__"))))
    q = (queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv__"))
                .withColumn("__list__", F.explode(probe_lists(F.col("__qv__")))))
    cand = c.join(F.broadcast(q), on="__list__")
    sim = cosine_sim_col("__qv__", "__cv__")
    win = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (cand.withColumn("sim", sim)
                .withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
                .select("qid", "vec_id", "sim", "rank"))


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int,
             dim: int, n_bits: int = 16, bands: int = 4, seed: int = 42,
             query_id: str = "qid", query_vec: str = "qvec",
             corpus_id: str = "vec_id", corpus_vec: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH top-k: bucket join + exact cosine refine."""
    planes = _hyperplanes(dim, n_bits, seed)
    bits_per_band = n_bits // bands
    sc = corpus.sparkSession.sparkContext
    bp = sc.broadcast(planes)

    def bucket_udf():
        @F.pandas_udf(ArrayType(LongType()))
        def buckets(vecs: pd.Series) -> pd.Series:
            pl = bp.value
            mat = np.array(list(vecs), dtype=np.float64)
            signs = (mat @ pl.T) >= 0  # (n, n_bits)
            weights = (1 << np.arange(bits_per_band, dtype=np.int64))
            out = []
            for row in signs:
                bs = []
                for b in range(bands):
                    chunk = row[b * bits_per_band:(b + 1) * bits_per_band]
                    bs.append(int((chunk * weights).sum()) + (b << 32))
                out.append(bs)
            return pd.Series(out, dtype=object)
        return buckets

    bu = bucket_udf()
    c = (corpus.select(F.col(corpus_id).alias("vec_id"), F.col(corpus_vec).alias("__cv__"))
               .withColumn("__bucket__", F.explode(bu(F.col("__cv__")))))
    q = (queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("__qv__"))
                .withColumn("__bucket__", F.explode(bu(F.col("__qv__")))))
    cand = (c.join(F.broadcast(q), on="__bucket__")
             .dropDuplicates(["qid", "vec_id"]))
    sim = cosine_sim_col("__qv__", "__cv__")
    win = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (cand.withColumn("sim", sim)
                .withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
                .select("qid", "vec_id", "sim", "rank"))


def random_projection(df: DataFrame, out_dim: int,
                      vec_col: str = "embedding", seed: int = 42,
                      out_col: str = "proj") -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: D-dim embeddings
    down to ``out_dim`` via a deterministic ±1 matrix, scaled by
    1/sqrt(out_dim) so expected norms are preserved (Achlioptas 2003 —
    the database-friendly JL family: sign entries beat gaussians at
    identical distortion bounds and need no float RNG state).

    The sign matrix is a pure function of (k, d) through splitmix64
    (``mix64(k*D + d, seed)`` low bit), so every executor — and any
    engine mirror — regenerates it identically; nothing is broadcast.
    Map-only Arrow-batched pUDF; the accumulation walks input dims in
    ascending order (one vectorized add per d), a fixed IEEE order, so
    outputs are bit-reproducible across engines replaying the same
    fold. Adds ``out_col`` (array<double> of out_dim).

    Scale shape: the canonical pre-step for ANN/clustering at 10^12
    rows — shrinking vectors 4-8x shrinks every downstream shuffle and
    index by the same factor; this stage itself is embarrassingly
    parallel with zero shuffle.
    """
    K = int(out_dim)
    if K <= 0:
        raise ValueError("out_dim must be positive")

    @F.pandas_udf(ArrayType(DoubleType()))
    def proj(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(list(vecs), dtype=np.float64)  # (n, D)
        n, D = mat.shape
        idx = np.arange(K * D, dtype=np.int64)
        signs = np.where((mix64(idx, seed) & np.uint64(1)) == 0,
                         1.0, -1.0).reshape(K, D)
        acc = np.zeros((n, K))
        for d in range(D):  # fixed fold order -> engine-reproducible
            acc = acc + mat[:, d:d + 1] * signs[None, :, d]
        acc = acc * (1.0 / np.sqrt(float(K)))
        return pd.Series(list(acc), dtype=object)

    return df.withColumn(out_col, proj(F.col(vec_col)))


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  out_q: str = "qvec", out_norm: str = "qnorm") -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = floor(v_i * s + 0.5)
    with s = 127 / max|v| (the FAISS SQ8 / "scalar quantizer" recipe).
    Adds ``out_q`` (array<long> holding int8-range values) and
    ``out_norm`` (exact integer squared norm). Zero vectors quantize to
    NULL (no direction to preserve).

    Why at scale: int8 cuts the vector bytes shuffled/cached 4x (a
    100 TB float32 embedding store probes from 25 TB), integer dot
    products are exact (no summation-order nondeterminism), and the
    whole transform is JVM expressions — no Python in the plan.
    floor(x + 0.5) is spelled literally (not round()) so any engine
    reproduces it bit-for-bit regardless of its rounding mode.
    """
    dv = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    maxabs = F.array_max(F.transform(dv, F.abs))
    q = F.transform(
        dv, lambda v: F.floor(v * (F.lit(127.0) / maxabs) + F.lit(0.5))
                       .cast("long"))
    q = F.when(maxabs > 0, q)
    return (df.withColumn(out_q, q)
              .withColumn(out_norm, F.aggregate(
                  F.col(out_q), F.lit(0).cast("long"),
                  lambda acc, x: acc + x * x)))


def quantized_topk(queries: DataFrame, corpus: DataFrame, k: int,
                   query_id: str = "qid", query_vec: str = "qvec_f",
                   corpus_id: str = "vec_id",
                   corpus_vec: str = "embedding") -> DataFrame:
    """Exact top-k by int8-quantized cosine: both sides quantize with
    quantize_int8, similarity is the integer dot product rescaled by
    the exact integer norms — sim_q = dot(qa,qb) / sqrt(|qa|^2*|qb|^2).
    Per-vector scales cancel in cosine up to quantization error, so
    ranks track float cosine while every arithmetic step is exact
    integers plus one sqrt and one divide (bit-reproducible across
    engines and run-to-run, unlike float accumulation).

    Query side broadcasts (bounded); the corpus side is scanned once by
    an Arrow-batched int64 GEMM (numpy matmul of the quantized vectors —
    exact, because integer addition is associative: bit-identical to a
    per-pair fold regardless of batch split) with a per-batch
    lexicographic local top-k. Integer sims TIE for real (unlike float
    cosine), so the local top-k orders by (sim desc, vec_id asc) — the
    same rule as the final rank window — before truncating to k.
    Composes with ivf_topk / lsh_topk bucketing when a full scan per
    query batch is too much.
    """
    qq = quantize_int8(
        queries.select(F.col(query_id).alias("qid"),
                       F.col(query_vec).alias("__qv__")),
        "__qv__", "qa", "na").filter(F.col("na") > 0)
    cc = quantize_int8(
        corpus.select(F.col(corpus_id).alias("vec_id"),
                      F.col(corpus_vec).alias("__cv__")),
        "__cv__", "qb", "nb").filter(F.col("nb") > 0)
    spark = corpus.sparkSession
    qrows = qq.select("qid", "qa", "na").collect()
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, vec_id long, sim_q double, rank int")
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["qa"] for r in qrows], dtype=np.int64)
    qna = np.array([r["na"] for r in qrows], dtype=np.int64)
    bq = spark.sparkContext.broadcast((qids, qmat, qna))

    def topk_batches(iterator):
        ids_b, qm, na = bq.value
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            cids = pdf["vec_id"].to_numpy(np.int64)
            cmat = np.array(list(pdf["qb"]), dtype=np.int64)
            nb = pdf["nb"].to_numpy(np.int64)
            dots = qm @ cmat.T                       # (nq, nc) exact int64
            # same IEEE op order as the former per-pair expression:
            # cast(dot as double) / sqrt(cast(na * nb as double))
            sims = dots.astype(np.float64) / np.sqrt(
                (na[:, None] * nb[None, :]).astype(np.float64))
            kk = min(k, len(cids))
            out = []
            for qi in range(len(ids_b)):
                sel = np.lexsort((cids, -sims[qi]))[:kk]
                out.append(pd.DataFrame({
                    "qid": np.full(kk, ids_b[qi], dtype=np.int64),
                    "vec_id": cids[sel],
                    "sim_q": sims[qi, sel]}))
            yield pd.concat(out, ignore_index=True)

    cand = cc.select("vec_id", "qb", "nb").mapInPandas(
        topk_batches, "qid long, vec_id long, sim_q double")
    win = Window.partitionBy("qid").orderBy(F.col("sim_q").desc(),
                                            F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
                .select("qid", "vec_id", "sim_q", "rank"))


def semantic_dedup(corpus: DataFrame, tau: float, n_clusters: int = 8,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding", blocks: int = 1,
                   eps: float = 1e-6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): coarse-cluster the
    embedding space, then drop every document that is >= ``tau``
    cosine-similar to a LOWER-id document in the same cluster. Returns
    the survivors as (``id_col``, cluster_id). Zero-norm (direction-free)
    vectors are excluded from clustering and output.

    The drop rule is the deterministic greedy form (a doc is removed iff
    any smaller-id in-cluster neighbor passes tau) — unlike transitive
    closure it needs no iteration, and it is exactly SQL-expressible, so
    the DuckDB oracle mirrors it verbatim.

    Clustering is the deterministic sample quantizer of :func:`ivf_topk`
    (centroids = the ``n_clusters`` corpus vectors with smallest
    splitmix64(id); cluster_id = position in that order; assignment = max
    dot against the NORMALIZED centroids, which is argmax-invariant to
    the row's own norm, so the mirror skips row normalization).

    Scale shape (the SemDeDup design point): assignment is one
    broadcast-centroid map-only scan — no shuffle, no Python on the
    centroid side; the near-dup scan shuffles on (cluster, triangle
    block-pair) keys so each task GEMMs one bounded tile. ``n_clusters``
    grows with the corpus to keep clusters (and the O(c^2) intra-cluster
    work) bounded — raise ``blocks`` when a single cluster outgrows one
    task. Candidates pass at ``tau - eps`` (GEMM summation order) and the
    reported set re-filters with :func:`cosine_sim_col` built-ins, so
    membership is engine-order independent.
    """
    B = int(blocks)
    if B < 1:
        raise ValueError(f"blocks must be >= 1, got {blocks}")
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")

    # zero-norm (direction-free) vectors are excluded from clustering AND
    # output: cosine against them is NaN (numpy drops NaN comparisons,
    # SQL engines sort NaN greatest — a silent cross-engine divergence),
    # and a zero centroid would poison every argmax
    live = (corpus.select(F.col(id_col).cast("long").alias("__id__"),
                          F.col(vec_col).alias("__v__"))
                  .filter(_sq_norm_col("__v__") > 0))
    cent = _sample_centroids(live, "__id__", "__v__", n_clusters, seed)
    if not cent.size:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster_id long")
    bc = corpus.sparkSession.sparkContext.broadcast(cent)

    @F.pandas_udf(LongType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(list(vecs), dtype=np.float64)
        # ties resolve to the smallest centroid index (np.argmax first-max;
        # the SQL mirror orders by (dot DESC, cidx ASC) to match)
        return pd.Series((mat @ bc.value.T).argmax(axis=1).astype(np.int64))

    assigned = live.withColumn("cluster_id", assign("__v__")).persist()

    cand = _tile_pairs(_blocked(assigned, B), B, float(tau) - float(eps),
                       ["cluster_id", "__k__"])
    va = assigned.select(F.col("__id__").alias("id_a"), F.col("__v__").alias("__va__"))
    vb = assigned.select(F.col("__id__").alias("id_b"), F.col("__v__").alias("__vb__"))
    drops = (cand.join(va, "id_a").join(vb, "id_b")
                 .filter(cosine_sim_col("__va__", "__vb__") >= tau)
                 .select(F.col("id_b").alias("__id__"))
                 .distinct())
    out = (assigned.join(drops, "__id__", "left_anti")
                   .select(F.col("__id__").alias(id_col), "cluster_id"))
    return _attach_cached(out, assigned)


def pq_train(corpus: DataFrame, m: int = 4, n_codes: int = 8,
             iters: int = 1, scale: float = 256.0, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int | None = None) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jegou, Douze & Schmid 2011,
    "Product Quantization for Nearest Neighbor Search" — public): the
    vector splits into ``m`` contiguous subspaces and each gets its own
    ``n_codes``-centroid Lloyd quantizer. Returns
    ``books[j][c][d]`` (m x n_codes x dim/m floats — KB-sized, the
    driver-resident model every PQ system ships to executors).

    Same determinism contract as operators/kmeans.kmeans_assign:
    vectors quantize once to exact ints (floor(x*scale); scale a power
    of two so the product is lossless), seeds are the ``n_codes``
    vectors with smallest splitmix64(id), per-round centroid updates
    are exact integer sums + one correctly-rounded division, argmin
    ties break to the smallest code — every round is bit-reproducible
    and a SQL engine can unroll it.

    Scale shape: the corpus explodes once to (id, j, subvector) — m
    rows per vector, each 1/m the width, so total bytes are unchanged —
    and EVERY subspace trains in the same single combining aggregation
    per round (groupBy (j, code): m*n_codes output rows), not m
    separate jobs; assignment is map-only JVM folds against the m x
    n_codes x d literal codebook tensor.
    """
    if m < 1 or n_codes < 1 or iters < 0:
        raise ValueError(f"need m >= 1, n_codes >= 1, iters >= 0; "
                         f"got m={m}, n_codes={n_codes}, iters={iters}")
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("cannot train PQ codebooks on an empty corpus")
        dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    qt = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
                    .cast("long")).alias("q"))

    @F.pandas_udf(LongType())
    def _mixu(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    picked = (qt.withColumn("__m__", _mixu("id"))
                .orderBy("__m__", "id").limit(n_codes).collect())
    if not picked:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    books = [[[float(v) for v in r["q"][j * sd:(j + 1) * sd]]
              for r in picked] for j in range(m)]
    n_codes = len(picked)   # degenerate tiny corpus: fewer seeds than asked

    if iters > 0:
        sub = (qt.select("id", F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     F.slice("q", j * sd + 1, sd).alias("sq"))
            for j in range(m)])).alias("s"))
                 .select("id", "s.j", "s.sq")
                 .persist())
        sums = [F.sum(F.element_at("sq", d + 1)).alias(f"s{d}")
                for d in range(sd)]
        for _ in range(iters):
            code = _pq_code_expr(books, F.col("j"), F.col("sq"))
            agg = (sub.select("j", "sq", code.alias("code"))
                      .groupBy("j", "code")
                      .agg(F.count("*").alias("n"), *sums)
                      .collect())
            got = {(r["j"], r["code"]): r for r in agg}
            books = [[
                [float(got[j, c][f"s{d}"]) / float(got[j, c]["n"])
                 for d in range(sd)]
                if (j, c) in got else books[j][c]
                for c in range(n_codes)] for j in range(m)]
        sub.unpersist()
    return books


def _pq_code_expr(books: list[list[list[float]]], j_col: F.Column,
                  sq_col: F.Column) -> F.Column:
    """Nearest-code id for a (subspace id, subvector) pair: squared-L2
    folds against the m x n_codes x d codebook literal tensor, ties to
    the smallest code — pure JVM expressions."""
    tensor = F.array(*[F.array(*[F.array(*[F.lit(v) for v in cv])
                                 for cv in book]) for book in books])
    bj = F.element_at(tensor, j_col.cast("int") + 1)
    dists = F.transform(bj, lambda cv: F.aggregate(
        F.zip_with(sq_col, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(corpus: DataFrame, books: list[list[list[float]]],
              scale: float = 256.0, id_col: str = "vec_id",
              vec_col: str = "embedding",
              codes_col: str = "codes") -> DataFrame:
    """(id, codes): each vector compressed to ``m`` small code ids —
    64-dim floats become m=4 bytes, the 64x compression that lets a
    100 TB embedding store live in RAM. Map-only (no shuffle, no
    Python): per subspace one argmin fold against the codebook
    literals."""
    m, sd = len(books), len(books[0][0])
    q = F.transform(F.col(vec_col),
                    lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
                    .cast("long"))
    codes = F.array(*[
        _pq_code_expr(books, F.lit(j), F.slice(q, j * sd + 1, sd))
        for j in range(m)])
    return corpus.select(F.col(id_col).cast("long").alias(id_col),
                         codes.alias(codes_col))


def pq_topk(queries: DataFrame, corpus: DataFrame, k: int, m: int = 4,
            n_codes: int = 8, iters: int = 1, scale: float = 256.0,
            seed: int = 42, query_id: str = "qid", query_vec: str = "qvec",
            corpus_id: str = "vec_id", corpus_vec: str = "embedding",
            books: list[list[list[float]]] | None = None) -> DataFrame:
    """PQ-ADC approximate nearest neighbors: train (or accept)
    codebooks, encode the corpus to m-byte codes, and answer each query
    with an Asymmetric Distance Computation scan — the query
    precomputes its m x n_codes lookup table of exact subspace
    distances, and every corpus vector's approximate distance is just m
    table lookups summed over its codes. Returns
    (qid, vec_id, adist, rank) with rank 1..k per query ordered by
    (adist asc, vec_id asc).

    Scale shape: codebooks are KB-sized driver state; encoding is
    map-only; the LUT side is nq x m x n_codes doubles BROADCAST to a
    crossJoin (never a shuffle of the corpus); the scan reads only the
    m-int code column (a 100 TB float store scans as ~1.5 TB of codes)
    and computes m array lookups per row in codegen — no Python, no
    float vectors move. The one shuffle is the final per-query top-k
    window. Composes with ivf_topk's coarse quantizer (IVFADC) when
    even the code scan needs pruning.

    Determinism: LUT entries replay the same d-ascending
    correctly-rounded fold both engines use (driver-side Python floats
    == IEEE doubles), adist folds j-ascending, ties break on vec_id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = corpus.sparkSession
    if books is None:
        books = pq_train(corpus, m=m, n_codes=n_codes, iters=iters,
                         scale=scale, seed=seed, id_col=corpus_id,
                         vec_col=corpus_vec)
    m, n_codes, sd = len(books), len(books[0]), len(books[0][0])
    qrows = queries.select(F.col(query_id).alias("qid"),
                           F.col(query_vec).alias("qv")).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, vec_id long, adist double, rank int")
    luts = []
    for r in qrows:
        qint = [float(np.floor(np.float64(x) * np.float64(scale)))
                for x in r["qv"]]
        lut = []
        for j in range(m):
            row = []
            for c in range(n_codes):
                acc = 0.0
                for d in range(sd):   # d-ascending fold, IEEE doubles
                    t = qint[j * sd + d] - books[j][c][d]
                    acc = acc + t * t
                row.append(acc)
            lut.append(row)
        luts.append((int(r["qid"]), lut))
    lut_df = spark.createDataFrame(
        luts, "qid long, lut array<array<double>>")
    codes = pq_encode(corpus, books, scale=scale, id_col=corpus_id,
                      vec_col=corpus_vec)
    adist = F.aggregate(
        F.sequence(F.lit(1), F.lit(m)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at("lut", j),
            F.element_at("codes", j) + F.lit(1)))
    scored = (codes.crossJoin(F.broadcast(lut_df))
                   .select("qid", corpus_id, adist.alias("adist")))
    win = Window.partitionBy("qid").orderBy(F.col("adist").asc(),
                                            F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(win))
                  .filter(F.col("rank") <= k)
                  .select("qid", corpus_id, "adist", "rank"))


def ivfadc_topk(queries: DataFrame, corpus: DataFrame, k: int,
                n_centroids: int = 8, n_probe: int = 3, m: int = 4,
                n_codes: int = 8, iters: int = 1, scale: float = 256.0,
                seed: int = 42, query_id: str = "qid",
                query_vec: str = "qvec", corpus_id: str = "vec_id",
                corpus_vec: str = "embedding") -> DataFrame:
    """IVFADC (Jegou 2011 §IV): the coarse inverted file prunes the
    corpus to ``n_probe`` of ``n_centroids`` lists per query, and PQ
    codes of the RESIDUAL (vector minus its coarse centroid) give the
    in-list distances — the composition that serves billion-vector
    stores (FAISS's default index family). Returns
    (qid, vec_id, adist, rank), rank 1..k per query by (adist, vec_id).

    Exactness chain (everything a SQL engine can replay): coarse
    centroids are the ``n_centroids`` quantized corpus vectors with the
    smallest splitmix64(id) — INTEGER vectors, so residuals stay exact
    integers; PQ codebooks train on those integer residuals with
    splitmix64 seed ``seed+1`` (pq_train, scale=1 — already quantized);
    coarse assignment distances are pure int64 folds; ADC lookup tables
    replay the d-ascending IEEE fold; adist folds j-ascending.

    Scale shape: coarse assign + residual + encode are ONE map-only
    pass over the corpus (centroids and codebooks are literal tensors);
    the query side ships (qid, probed list, LUT) rows — nq * n_probe *
    m * n_codes doubles, broadcast — and the probe join hits only the
    probed lists' rows; the only corpus-wide shuffle is the final
    per-query top-k window. Unlike :func:`pq_topk`'s full scan, the
    scan cost per query drops by ~n_probe/n_centroids.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probe < 1 or n_probe > n_centroids:
        raise ValueError(f"need 1 <= n_probe <= n_centroids, "
                         f"got n_probe={n_probe}, n_centroids={n_centroids}")
    spark = corpus.sparkSession
    qt = corpus.select(
        F.col(corpus_id).cast("long").alias("id"),
        F.transform(F.col(corpus_vec),
                    lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
                    .cast("long")).alias("q"))

    @F.pandas_udf(LongType())
    def _mixu(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    picked = (qt.withColumn("__m__", _mixu("id"))
                .orderBy("__m__", "id").limit(n_centroids).collect())
    if not picked:
        return spark.createDataFrame(
            [], "qid long, vec_id long, adist double, rank int")
    coarse = [[int(v) for v in r["q"]] for r in picked]
    n_centroids = len(coarse)
    dim = len(coarse[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")

    ctensor = F.array(*[F.array(*[F.lit(v) for v in cv]) for cv in coarse])
    cdists = F.transform(ctensor, lambda cv: F.aggregate(
        F.zip_with(F.col("q"), cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v))
    cid = (F.array_position(cdists, F.array_min(cdists)) - 1).cast("int")
    resid = (qt.withColumn("cid", cid)
               .withColumn("r", F.zip_with(
                   F.col("q"),
                   F.element_at(ctensor, F.col("cid") + 1),
                   lambda a, b: (a - b).cast("double")))
               .persist())
    books = pq_train(resid, m=m, n_codes=n_codes, iters=iters, scale=1.0,
                     seed=seed + 1, id_col="id", vec_col="r", dim=dim)
    sd = dim // m
    codes = F.array(*[
        _pq_code_expr(books, F.lit(j), F.slice("r", j * sd + 1, sd))
        for j in range(m)])
    encoded = resid.select("id", "cid", codes.alias("codes"))

    qrows = queries.select(F.col(query_id).alias("qid"),
                           F.col(query_vec).alias("qv")).collect()
    if not qrows:
        resid.unpersist()
        return spark.createDataFrame(
            [], "qid long, vec_id long, adist double, rank int")
    luts = []
    for r in qrows:
        qint = [int(np.floor(np.float64(x) * np.float64(scale)))
                for x in r["qv"]]
        cd = []
        for c in range(n_centroids):
            acc = 0
            for d in range(dim):
                t = qint[d] - coarse[c][d]
                acc += t * t
            cd.append((acc, c))
        probes = [c for _, c in sorted(cd)[:n_probe]]
        for c in probes:
            qres = [float(qint[d] - coarse[c][d]) for d in range(dim)]
            lut = []
            for j in range(m):
                row = []
                for code in range(len(books[0])):
                    acc = 0.0
                    for d in range(sd):   # d-ascending IEEE fold
                        t = qres[j * sd + d] - books[j][code][d]
                        acc = acc + t * t
                    row.append(acc)
                lut.append(row)
            luts.append((int(r["qid"]), c, lut))
    lut_df = spark.createDataFrame(
        luts, "qid long, cid int, lut array<array<double>>")
    adist = F.aggregate(
        F.sequence(F.lit(1), F.lit(m)), F.lit(0.0),
        lambda acc, j: acc + F.element_at(
            F.element_at("lut", j),
            F.element_at("codes", j) + F.lit(1)))
    scored = (encoded.join(F.broadcast(lut_df), on="cid")
                     .select("qid", F.col("id").alias(corpus_id),
                             adist.alias("adist")))
    win = Window.partitionBy("qid").orderBy(F.col("adist").asc(),
                                            F.col(corpus_id).asc())
    out = (scored.withColumn("rank", F.row_number().over(win))
                 .filter(F.col("rank") <= k)
                 .select("qid", corpus_id, "adist", "rank"))
    return _attach_cached(out, resid)


def embedding_outliers(corpus: DataFrame, threshold: float,
                       n_clusters: int = 8, seed: int = 42,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Quantizer-distance outlier flagging — the embedding-space
    curation gate (SemDeDup's §4 "semantic outliers" / CLIP-score-style
    pruning): assign every vector to its max-cosine coarse centroid and
    flag rows whose similarity to their OWN cluster falls below
    ``threshold`` — far-from-every-cluster points are mislabeled,
    mojibake, or off-distribution documents. Returns
    (id, cluster_id, sim32, is_outlier); zero-norm vectors are
    excluded (no direction to judge).

    Centroids are the deterministic splitmix64 sample quantizer of
    :func:`ivf_topk`/:func:`semantic_dedup`, kept UNNORMALIZED here:
    cosine is scale-invariant, and raw float32 components inline into
    the plan exactly, so the SQL mirror reads the identical values from
    the data with no normalization drift. Every similarity is the
    sequential-fold :func:`cosine_sim_col` built-in (bit-equal to
    DuckDB's list_cosine_similarity), so the threshold compare can sit
    on a knife edge safely.

    Scale shape: the centroid pick is a bounded ``limit(n)`` collect
    (the quantizer is tiny by construction); the scan is ONE map-only
    whole-stage-codegen pass with the centroids inlined as literals —
    no shuffle, no Python, no broadcast round trip. For quantizers too
    large to inline, compose :func:`ivf_topk`'s GEMM path instead.
    """
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")

    @F.pandas_udf(LongType())
    def _mixu(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64),
                               seed).astype(np.int64))

    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm2 = F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0),
                       lambda a, x: a + x)
    live = corpus.filter(nrm2 > 0)
    picked = (live.select(F.col(id_col).cast("long").alias("__i__"),
                          F.col(vec_col).alias("__v__"))
                  .withColumn("__m__", _mixu("__i__"))
                  .orderBy("__m__", "__i__").limit(int(n_clusters))
                  .collect())
    if not picked:
        raise ValueError("corpus has no non-zero vectors to quantize")
    sims = [cosine_sim_col(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in r["__v__"]]))
            for r in picked]
    packed = F.array(*[F.struct(s.alias("s"), F.lit(-i).alias("ni"))
                       for i, s in enumerate(sims)])
    best = F.array_max(packed)
    sim = best["s"]
    return live.select(
        F.col(id_col),
        (-best["ni"]).cast("int").alias("cluster_id"),
        sim.cast("float").alias("sim32"),
        (sim < float(threshold)).alias("is_outlier"))


def recall_at_k(approx: DataFrame, exact: DataFrame,
                query_col: str = "qid", id_col: str = "vec_id") -> DataFrame:
    """Recall@k audit between an approximate and an exact top-k result —
    the index-quality gate every ANN deployment needs before swapping
    the exact scan out (reference analog: the engine's loose-bbox /
    exact-refine split, measured instead of assumed). Both inputs are
    (query, id) top-k frames (e.g. :func:`ivf_topk` vs
    :func:`cosine_topk` over the same queries). Returns
    (query, n_hit, recall32) with recall = |approx ∩ exact| / |exact|
    per query.

    Scale shape: the two top-k frames are tiny relative to the corpus
    (n_queries x k rows); one equi-join on (query, id) + two combining
    counts + a query-keyed join. Exactness: integer counts and one
    exact small-integer division, float32 out.
    """
    # set semantics: a duplicate (query, id) row in either input must
    # not double-count a hit (recall could exceed 1.0 otherwise)
    ex = exact.select(F.col(query_col), F.col(id_col)).dropDuplicates(
        [query_col, id_col])
    ap = approx.select(F.col(query_col), F.col(id_col)).dropDuplicates(
        [query_col, id_col])
    base = ex.groupBy(query_col).agg(F.count("*").alias("__k__"))
    hits = (ex.join(ap, [query_col, id_col])
              .groupBy(query_col).agg(F.count("*").alias("__h__")))
    n_hit = F.coalesce(F.col("__h__"), F.lit(0)).cast("long")
    return (base.join(hits, query_col, "left")
                .select(F.col(query_col), n_hit.alias("n_hit"),
                        (n_hit.cast("double")
                         / F.col("__k__").cast("double"))
                        .cast("float").alias("recall32")))
