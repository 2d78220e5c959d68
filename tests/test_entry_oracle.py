"""Driver-contract mirror: every oracle-checked query must match DuckDB
at sf0.01 (the exact scale the driver grades) — row count, column names,
and order-insensitive values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return repr(val)  # exact double repr — bit-level compare
    if isinstance(val, bytes):
        return val.hex()
    return repr(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(_ORACLES[name])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:5]
    assert sset == dset, f"{name}: first mismatches {[(sset[i], dset[i]) for i in mism]}"


ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_ivf_recall(spark):
    """IVF with n_probe=n_centroids must equal exact top-k; fewer probes
    keep decent recall."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.ann import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"),
                                                F.col("embedding").alias("qvec"))
    exact = {(r["qid"], r["vec_id"]) for r in
             cosine_topk(q.withColumnRenamed("qvec", "embedding"), emb, k=5).collect()}
    full = {(r["qid"], r["vec_id"]) for r in
            ivf_topk(q, emb, k=5, n_centroids=8, n_probe=8).collect()}
    assert full == exact
    approx = {(r["qid"], r["vec_id"]) for r in
              ivf_topk(q, emb, k=5, n_centroids=8, n_probe=2).collect()}
    assert len(approx & exact) / len(exact) >= 0.6
