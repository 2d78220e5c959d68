"""Stat-spec DSL: the reference's stats query strings on DataFrames.

GeoMesa exposes server-side mergeable statistics through a small spec
language (geomesa-index-api .../stats/Stat.scala:195-312 — e.g.
``"Count();MinMax(alt);TopK(track);Histogram(alt,10,0,1000)"``), run as
partial sketches on storage nodes and merged client-side. Spark's
partial+final aggregation is the same execution shape, so each spec term
maps onto built-in aggregate expressions:

| spec                        | Spark expression                            |
|-----------------------------|---------------------------------------------|
| Count()                     | count(*)                                    |
| MinMax(a)                   | min(a), max(a)                              |
| Enumeration(a)              | value -> count map (exact)                  |
| TopK(a[, k])                | k most frequent values (exact tie-broken)   |
| Frequency(a)                | count_min_sketch bytes (mergeable)          |
| Histogram(a, bins, lo, hi)  | equi-width binned counts                    |
| DescriptiveStats(a)         | count/mean/stddev/min/max                   |
| IteratorStackCount()        | partition count (the reference's iterator   |
|                             | invocation counter)                         |
| GroupBy(a, <stat>)          | any of the above per group                  |

``run_stats`` returns {label: python value} — the "merged sketch" the
reference's StatsScan hands back, computed in ONE aggregation job for
all terms (plus one per GroupBy term).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

__all__ = ["parse_stats", "run_stats"]

_TERM_RE = re.compile(r"\s*([A-Za-z]+)\s*\(([^()]*(?:\([^()]*\))?)\s*\)\s*")


def parse_stats(spec: str) -> list[tuple[str, list[str]]]:
    """'Count();MinMax(a);GroupBy(b,Count())' -> [(name, args), ...]."""
    out = []
    for part in filter(None, (p.strip() for p in spec.split(";"))):
        m = _TERM_RE.fullmatch(part)
        if not m:
            raise ValueError(f"bad stat spec term: {part!r}")
        name = m.group(1)
        raw = m.group(2).strip()
        args = [a.strip() for a in re.split(r",(?![^()]*\))", raw)] if raw else []
        out.append((name, args))
    return out


def _simple_aggs(name: str, args: list[str], label: str):
    """Aggregate columns for one non-GroupBy term."""
    if name == "Count":
        return [F.count(F.lit(1)).alias(label)]
    if name == "MinMax":
        (a,) = args
        return [F.min(a).alias(f"{label}_min"), F.max(a).alias(f"{label}_max")]
    if name == "Frequency":
        (a,) = args
        return [F.count_min_sketch(F.col(a), F.lit(0.001), F.lit(0.99),
                                   F.lit(42)).alias(label)]
    if name == "DescriptiveStats":
        (a,) = args
        return [F.count(a).alias(f"{label}_count"),
                F.avg(a).alias(f"{label}_mean"),
                F.stddev_samp(a).alias(f"{label}_stddev"),
                F.min(a).alias(f"{label}_min"),
                F.max(a).alias(f"{label}_max")]
    raise ValueError(f"unsupported stat: {name}")


def run_stats(df: DataFrame, spec: str) -> dict:
    """Evaluate a stat spec string; returns {label: value}.

    Enumeration/TopK/Histogram/GroupBy evaluate as grouped counts (one
    extra job each); everything else folds into a single aggregation.
    """
    terms = parse_stats(spec)
    result: dict = {}
    simple = []
    for idx, (name, args) in enumerate(terms):
        label = f"{name.lower()}_{args[0]}" if args else name.lower()
        if name in ("Enumeration", "TopK"):
            a = args[0]
            k = int(args[1]) if name == "TopK" and len(args) > 1 else 10
            counts = (df.groupBy(a).count()
                        .orderBy(F.col("count").desc(), F.col(a).asc()))
            if name == "TopK":
                counts = counts.limit(k)
            result[label] = {r[0]: r[1] for r in counts.collect()}
        elif name == "Histogram":
            a, bins, lo, hi = args[0], int(args[1]), float(args[2]), float(args[3])
            width = (hi - lo) / bins
            bin_idx = F.least(F.greatest(
                F.floor((F.col(a) - F.lit(lo)) / F.lit(width)), F.lit(0)),
                F.lit(bins - 1)).cast("int")
            rows = (df.filter(F.col(a).isNotNull())
                      .groupBy(bin_idx.alias("bin")).count().collect())
            hist = [0] * bins
            for r in rows:
                hist[r["bin"]] = r["count"]
            result[label] = hist
        elif name == "IteratorStackCount":
            result[label] = (df.select(F.spark_partition_id().alias("p"))
                               .distinct().count())
        elif name == "GroupBy":
            key = args[0]
            sub_name, sub_args = parse_stats(args[1])[0]
            sub_label = (f"{sub_name.lower()}_{sub_args[0]}"
                         if sub_args else sub_name.lower())
            aggs = _simple_aggs(sub_name, sub_args, sub_label)
            rows = df.groupBy(key).agg(*aggs).collect()
            result[f"groupby_{key}_{sub_label}"] = {
                r[0]: (r[1] if len(r) == 2 else tuple(r)[1:]) for r in rows}
        else:
            simple.extend(_simple_aggs(name, args, label))
    if simple:
        row = df.agg(*simple).collect()[0]
        for field, value in zip(row.__fields__, row):
            result[field] = value
    return result
