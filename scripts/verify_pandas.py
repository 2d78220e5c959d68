"""Driver-faithful contract check: BOTH sides through pandas.

The grading driver materializes the Spark result and the DuckDB oracle
through pandas before canonicalizing (sort columns by name, sort rows,
hash values) — which is how two classes of bug stayed invisible to a
``collect()``/``fetchall()`` mirror for two rounds (HUGEINT -> float64
widening; list cells breaking ``factorize``).  This script replays that
path for every ``queries()``/``oracle_sql()`` pair at sf0.01:
``sdf.toPandas()`` vs ``rel.df()``, one shared cell canonicalizer, row
sets compared order-insensitively.  Complements (does not replace)
``tests/test_entry_oracle.py`` (pandas oracle side + schema lints) and
the verify skill's fetchall recipe.

Run:  python scripts/verify_pandas.py   (~20 min at local[8])
Expect the final line ``PD TOTAL BAD: 0``.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon_cell(v):
    """Normalize a pandas-held cell to a hashable string: container
    types that differ only by Python class (bytes/bytearray, numpy
    scalars, Timestamp) collapse; the int-vs-float distinction is KEPT
    (the driver's value hash keeps it too — that is the HUGEINT trap)."""
    if v is None:
        return "None"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    if isinstance(v, np.generic):
        v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return "nan"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, pd.Timestamp):
        return repr(v.to_pydatetime())
    if v is pd.NaT:
        return "None"
    return repr(v)


def frame_canon(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon_cell(df.iloc[i][c]) for c in cols)
                  for i in range(len(df)))
    return cols, rows


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import __spark_entry__ as E
    from geomesa_spark import get_spark
    from geomesa_spark.functions import register_functions

    spark = get_spark("verify_pd", cpus=8, shuffle_partitions=16)
    register_functions(spark)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    for name, fn in E.queries().items():
        try:
            sc, sr = frame_canon(fn(spark, sf_dir).toPandas())
            dc, dr = frame_canon(con.sql(E.oracle_sql()[name]).df())
            if sc == dc and sr == dr:
                print("PDMATCH", name, len(sr))
            else:
                bad += 1
                print("PDMISMATCH", name, sc == dc, len(sr), len(dr))
                for a, b in list(zip(sr, dr))[:3]:
                    if a != b:
                        print("   ", a[:4], "VS", b[:4])
        except Exception as e:  # noqa: BLE001 - report and keep draining
            bad += 1
            print("PDERROR", name, repr(e)[:200])
    print("PD TOTAL BAD:", bad)
    spark.stop()
    return bad


if __name__ == "__main__":
    raise SystemExit(1 if main(*(sys.argv[1:] or [])) else 0)
