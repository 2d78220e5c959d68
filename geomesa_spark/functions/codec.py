"""Arrow-batch WKB codec helpers for pandas UDFs.

Point columns get a fully-vectorized fast path: a little-endian WKB point is
a fixed 21-byte record, so a whole batch encodes/decodes with one numpy
buffer operation — no per-row Python. Mixed/complex geometry batches fall
back to the object codec from geomesa_spark.geom.wkb.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geom.wkb import Geometry, Point, wkb_read, wkb_write

_POINT_HEADER = b"\x01\x01\x00\x00\x00"


def encode_points(x, y) -> pd.Series:
    """Vectorized (lon, lat) arrays → WKB point bytes. NaN → None."""
    x = np.asarray(x, dtype="<f8")
    y = np.asarray(y, dtype="<f8")
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 2:5] = 0
    buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    nan = np.isnan(x) | np.isnan(y)
    out = [None if nan[i] else raw[i * 21 : (i + 1) * 21] for i in range(n)]
    return pd.Series(out, dtype=object)


def try_decode_points(s: pd.Series):
    """If every non-null value is a LE WKB point, return (x, y, isnull-mask).

    Vectorized decode; returns None when the batch is not all-points.
    """
    mask = s.isna().to_numpy()
    vals = s.to_numpy(dtype=object)
    non_null = vals[~mask]
    if len(non_null) == 0:
        return np.full(len(s), np.nan), np.full(len(s), np.nan), mask
    for v in non_null:
        if len(v) != 21 or v[:5] != _POINT_HEADER:
            return None
    packed = b"".join(non_null)
    arr = np.frombuffer(packed, dtype=np.uint8).reshape(-1, 21)
    xs = arr[:, 5:13].copy().view("<f8").ravel()
    ys = arr[:, 13:21].copy().view("<f8").ravel()
    x = np.full(len(s), np.nan)
    y = np.full(len(s), np.nan)
    x[~mask] = xs
    y[~mask] = ys
    return x, y, mask


def decode_geoms(s: pd.Series) -> list:
    """WKB series → list of Geometry | None."""
    return [None if v is None or (isinstance(v, float) and np.isnan(v)) else wkb_read(bytes(v))
            for v in s]


def encode_geoms(geoms) -> pd.Series:
    return pd.Series(
        [None if g is None else wkb_write(g) for g in geoms], dtype=object
    )


def single_geom(s: pd.Series) -> Geometry | None:
    """If the batch is one repeated literal (constant-folded), decode once."""
    vals = s.dropna()
    if len(vals) == 0:
        return None
    first = vals.iloc[0]
    if (vals == first).all():
        return wkb_read(bytes(first))
    return None
