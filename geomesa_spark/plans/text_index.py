"""Term-partitioned inverted-index store — the text-side sibling of the
Z2/Z3/XZ2 geo stores in plans/store.py: the same architecture (key
column + hash-prefix hive partitions -> partition pruning + pushed
filters) applied to the search-engine shape instead of the curve shape.
The reference's attribute index (geomesa-index-api AttributeIndex key
space: indexed value prefixes the row key so per-value scans touch one
key range) motivates the design; here the "row key" is the term and the
partition is a fixed-width prefix of its 64-bit hash, so a k-term query
opens at most k partitions of a corpus-sized index.

Postings carry (term, doc_id, tf, first_pos, positions) — enough for
term, boolean and phrase queries; positions are 0-based token offsets
from the engine's shared whitespace tokenization (the bm25/phrase
convention).

Scale notes: the build is one explode + one combining (term, doc)
count-and-min plus a collect_list bounded by per-doc term frequency;
everything shuffles on the (term, doc_id) pair — Zipf-heavy terms are
split by AQE skew handling, and the store write partitions by the hash
prefix so no single directory takes the head of the distribution.
Queries prune partitions driver-side from the query terms' own hashes
— the scan never lists directories the terms cannot live in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["write_inverted_index", "term_query"]


def _term_prefix(col, digits: int):
    """Fixed-width hex prefix of xxhash64(term) — the partition key.
    xxhash64 is a JVM built-in (zero Python); correctness never depends
    on the hash (it only places postings), so no SQL mirror is needed."""
    h = F.conv(F.xxhash64(col).cast("string"), 10, 16)
    # negative longs conv() to 16-digit two's-complement hex; pad short
    # positives so every prefix is the leading digits of 16 chars
    return F.substring(F.lpad(h, 16, "0"), 1, digits)


def write_inverted_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                         text_col: str = "text", digits: int = 2) -> None:
    """Build and write the term-partitioned inverted index."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    posting = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                           F.posexplode(toks).alias("pos", "term"))
                   .filter(F.length("term") > 0)
                   .select("doc_id", F.col("pos").cast("long").alias("pos"),
                           "term")
                   .groupBy("term", "doc_id")
                   .agg(F.count("*").alias("tf"),
                        F.min("pos").alias("first_pos"),
                        F.array_sort(F.collect_list("pos")).alias("positions"))
                   .withColumn("term_p", _term_prefix(F.col("term"), digits)))
    posting.write.mode("overwrite").partitionBy("term_p").parquet(path)


def term_query(spark, path: str, terms: list[str],
               digits: int = 2) -> DataFrame:
    """Pruned posting-list scan for ``terms`` (lowercased to match the
    build tokenization): partition pruning on the terms' own hash
    prefixes + a pushed term equality filter. Returns
    (term, doc_id, tf, first_pos, positions)."""
    if not terms:
        raise ValueError("term_query needs at least one term")
    lows = sorted({str(t).lower() for t in terms})
    tdf = spark.createDataFrame([(t,) for t in lows], "term string")
    pfx = [r["p"] for r in
           tdf.select(_term_prefix(F.col("term"), digits).alias("p"))
              .collect()]
    df = spark.read.parquet(path)
    return (df.filter(F.col("term_p").isin(sorted(set(pfx)))
                      & F.col("term").isin(lows))
              .select("term", "doc_id", "tf", "first_pos", "positions"))
