"""Deterministic geometry derivation from the driver testdata tables.

The driver's correctness gate compares our Spark operators against DuckDB
SQL oracles on the same parquet tables — so every geometry used by an
oracle-checked query must be derivable with arithmetic BOTH engines compute
identically (integer modular arithmetic, then IEEE double ops in the same
association order). This module is the single source of truth: each helper
returns a Spark ``Column`` AND the character-equivalent SQL snippet.

This mirrors the reference's converter ingest stage (geomesa-convert
transforms derive geometries from source fields,
geomesa-convert-common/.../transforms/GeometryFunctionFactory.scala:31-88):
geometry is a pure function of existing columns.

Coordinates land on a 0.01-degree grid; rectangle bounds sit on .xx5
third-decimal offsets, so no point ever falls exactly on a rectangle
boundary and strict-vs-inclusive comparisons agree in both engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# points


def point_lon(col: str, mult: int = 7919, off: int = 0) -> Column:
    return ((F.col(col) * mult + off) % 36000) / 100.0 - 180.0


def point_lat(col: str, mult: int = 104729, off: int = 0) -> Column:
    return ((F.col(col) * mult + off) % 18000) / 100.0 - 90.0


def sql_point_lon(col: str, mult: int = 7919, off: int = 0) -> str:
    return f"((({col}) * {mult} + {off}) % 36000) / 100.0 - 180.0"


def sql_point_lat(col: str, mult: int = 104729, off: int = 0) -> str:
    return f"((({col}) * {mult} + {off}) % 18000) / 100.0 - 90.0"


# distinct multiplier sets so the derived layers are decorrelated
SUPP = dict(mlon=6197, olon=13, mlat=20063, olat=7)
EVT = dict(mlon=7907, olon=29, mlat=104717, olat=11)
QRY = dict(mlon=2833, olon=0, mlat=6521, olat=0)


# ---------------------------------------------------------------------------
# rectangles  (center on 0.01 grid, half-extent k + .505)


def rect_cols(key: str, mcx: int = 3571, mcy: int = 9973,
              wbase: float = 2.505, hbase: float = 1.505,
              wmod: int = 7, hmod: int = 5):
    cx = ((F.col(key) * mcx) % 34000) / 100.0 - 170.0
    cy = ((F.col(key) * mcy) % 16000) / 100.0 - 80.0
    hw = F.lit(wbase) + (F.col(key) % wmod).cast("double")
    hh = F.lit(hbase) + (F.col(key) % hmod).cast("double")
    return (cx - hw).alias("xmin"), (cy - hh).alias("ymin"), \
           (cx + hw).alias("xmax"), (cy + hh).alias("ymax")


def sql_rect_exprs(key: str, mcx: int = 3571, mcy: int = 9973,
                   wbase: float = 2.505, hbase: float = 1.505,
                   wmod: int = 7, hmod: int = 5):
    cx = f"((({key}) * {mcx}) % 34000) / 100.0 - 170.0"
    cy = f"((({key}) * {mcy}) % 16000) / 100.0 - 80.0"
    hw = f"({wbase} + CAST(({key}) % {wmod} AS DOUBLE))"
    hh = f"({hbase} + CAST(({key}) % {hmod} AS DOUBLE))"
    return (f"(({cx}) - {hw})", f"(({cy}) - {hh})",
            f"(({cx}) + {hw})", f"(({cy}) + {hh})")


REGION_RECT = dict(mcx=5407, mcy=7351, wbase=20.505, hbase=10.505, wmod=3, hmod=2)


# ---------------------------------------------------------------------------
# oracle SQL for the cell/tile kernels (exact mirrors of the numpy kernels)


def rect_wkb_udf():
    """pandas UDF: (xmin, ymin, xmax, ymax) -> WKB polygon bytes."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def mk(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        from ..geom.wkb import Polygon, wkb_write

        out = []
        for a, b, c, d in zip(xmin, ymin, xmax, ymax):
            ring = np.array([[a, b], [a, d], [c, d], [c, b], [a, b]], dtype=np.float64)
            out.append(wkb_write(Polygon(ring)))
        return pd.Series(out, dtype=object)

    return mk


def sql_z2_cell(lon_sql: str, lat_sql: str, level: int = 8) -> str:
    """SQL mirror of curves.zorder.z2_encode at a coarse level.

    normalize = floor((x - min) * (2^31/span)) (norm.BitNormalizedDimension),
    keep the top ``level`` bits per dim, interleave with x in even bits
    (Z2.scala:58-78 layout). Pure BIGINT arithmetic — bit-for-bit vs numpy.
    """
    ix = f"(CAST(floor((({lon_sql}) + 180.0) * (2147483648.0 / 360.0)) AS BIGINT) >> {31 - level})"
    iy = f"(CAST(floor((({lat_sql}) + 90.0) * (2147483648.0 / 180.0)) AS BIGINT) >> {31 - level})"
    terms = []
    for b in range(level):
        terms.append(f"((({ix} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({iy} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def sql_geohash(lon_sql: str, lat_sql: str, chars: int = 6) -> str:
    """SQL mirror of curves.geohash.geohash_encode (Niemeyer base-32).

    Bisection == floor-normalization at 5*chars/2 bits per dim (the fp
    argument: bin boundaries are > 1e-5 deg from any 0.01-grid coordinate,
    multiply rounding error is ~1e-11 deg).
    """
    nbits = 5 * chars
    xbits = (nbits + 1) // 2
    ybits = nbits // 2
    ix = f"CAST(floor((({lon_sql}) + 180.0) * ({1 << xbits}.0 / 360.0)) AS BIGINT)"
    iy = f"CAST(floor((({lat_sql}) + 90.0) * ({1 << ybits}.0 / 180.0)) AS BIGINT)"
    terms = []
    for m in range(xbits):  # lon bit (xbits-1-m) -> code bit (nbits-1-2m)
        terms.append(f"((({ix}) >> {xbits - 1 - m} & 1) << {nbits - 1 - 2 * m})")
    for m in range(ybits):  # lat bit (ybits-1-m) -> code bit (nbits-2-2m)
        terms.append(f"((({iy}) >> {ybits - 1 - m} & 1) << {nbits - 2 - 2 * m})")
    code = "(" + " + ".join(terms) + ")"
    parts = [
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((({code}) >> {5 * (chars - 1 - k)}) & 31 AS INTEGER) + 1, 1)"
        for k in range(chars)
    ]
    return "(" + " || ".join(parts) + ")"


def sql_tile(coord_sql: str, lo: float, size: float, n: int) -> str:
    """SQL mirror of operators.tiling GridSnap: i = clamp(floor((x-lo)/size))."""
    raw = f"CAST(floor((({coord_sql}) - ({lo})) / ({size})) AS BIGINT)"
    return f"LEAST(GREATEST({raw}, 0), {n - 1})"
