"""Cell-partitioned parquet store + bbox query planner — the engine index.

The storage model of the reference FSDS/Iceberg path re-expressed for
native Spark (SURVEY.md §1.3 / §3.3):

- each point row gets ``z2_hex`` = Z2SFC.hexEncode(z) (hex of z << 2,
  16 digits, lexicographic == numeric order; Z2SFC.scala:59-81) and a
  partition column ``z2_p`` = first ``digits`` hex chars (the Iceberg
  ``truncate(z2_hex, digits)`` partition spec, Z2Scheme.scala:48-51),
- the directory layout is hive-partitioned parquet on ``z2_p`` —
  manifest pruning becomes Spark partition pruning, parquet row-group
  stats on lon/lat do the intra-partition skip,
- a bbox query plans driver-side: Z2 range decomposition (the exact
  litmax/bigmin BFS, ZN.scala:110-242 port) -> covering partition
  prefixes -> ``z2_p IN (...)`` + lon/lat range predicates. The scan
  shows both PartitionFilters and PushedFilters in .explain — nothing
  is read outside the covering cells.

At 10^12 rows only the partition count changes (digits knob: 16^d
partitions); the planner still emits <= ~2000 prefixes (the
reference's scan-range budget, QueryProperties.scala:24).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from ..curves.norm import normalized_lat, normalized_lon
from ..curves.sfc import Z2SFC
from ..curves.zranges import z2_bounds_to_zbound, z2_ranges

__all__ = ["write_indexed", "read_indexed", "bbox_query", "bbox_partition_prefixes"]

_LON = normalized_lon(31)
_LAT = normalized_lat(31)
_SFC = Z2SFC()


def z2_hex_udf():
    """pandas UDF: (lon, lat) -> 16-char z2 hex key (Z2SFC.hexEncode)."""

    @F.pandas_udf(StringType())
    def enc(x: pd.Series, y: pd.Series) -> pd.Series:
        z = _SFC.index(x.to_numpy(np.float64), y.to_numpy(np.float64), lenient=True)
        return pd.Series(_SFC.hex_encode(z))

    return enc


def write_indexed(df: DataFrame, path: str, x: str = "lon", y: str = "lat",
                  digits: int = 2) -> None:
    """Write a point DataFrame as a z2-partitioned parquet store.

    digits=2 -> up to 256 partitions (bits = 4*digits of z-prefix).
    """
    enc = z2_hex_udf()
    out = (df.withColumn("z2_hex", enc(F.col(x), F.col(y)))
             .withColumn("z2_p", F.substring("z2_hex", 1, digits)))
    out.write.mode("overwrite").partitionBy("z2_p").parquet(path)


def read_indexed(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def bbox_partition_prefixes(xmin: float, ymin: float, xmax: float, ymax: float,
                            digits: int, max_ranges: int = 2000) -> list[str]:
    """Driver-side planning: bbox -> covering z2_p partition prefixes.

    Normalizes the window, runs the exact Z2 range decomposition at
    4*digits bits of precision (+2 for the hex shift), and expands the
    ranges into the distinct ``digits``-char hex prefixes they cover.
    """
    nx0 = int(_LON.normalize(max(xmin, -180.0)))
    nx1 = int(_LON.normalize(min(xmax, 180.0)))
    ny0 = int(_LAT.normalize(max(ymin, -90.0)))
    ny1 = int(_LAT.normalize(min(ymax, 90.0)))
    zbound = z2_bounds_to_zbound(nx0, ny0, nx1, ny1)
    ranges = z2_ranges([zbound], max_ranges=max_ranges)
    # hex key is (z << 2) as 16 chars, so the d-char prefix is the top
    # 4d bits of (z << 2) == z >> (62 - 4d)
    shift = 62 - 4 * digits
    total = 16 ** digits
    prefixes: set[str] = set()
    for r in ranges:
        for p in range(r.lower >> shift, (r.upper >> shift) + 1):
            prefixes.add(format(p, f"0{digits}x"))
        if len(prefixes) >= total:
            break
    return sorted(prefixes)


def bbox_query(spark, path: str, xmin: float, ymin: float, xmax: float,
               ymax: float, digits: int = 2, loose: bool = False) -> DataFrame:
    """Planned bbox scan: partition pruning + pushed range predicates.

    loose=True skips nothing here (bbox is exact for points) — the flag
    mirrors the reference's loose-bbox semantics for parity.
    """
    df = spark.read.parquet(path)
    prefixes = bbox_partition_prefixes(xmin, ymin, xmax, ymax, digits)
    cond = F.col("z2_p").isin(prefixes)
    exact = ((F.col("lon") >= xmin) & (F.col("lon") <= xmax)
             & (F.col("lat") >= ymin) & (F.col("lat") <= ymax))
    return df.filter(cond & exact)
