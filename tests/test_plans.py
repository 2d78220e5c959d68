"""Checkpoint/lineage + indexed-store planner tests."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.checkpoint import read_manifest, run_stage
from geomesa_spark.plans.store import (
    bbox_partition_prefixes, bbox_query, write_indexed,
)
from geomesa_spark.sources.pages import generate_points, page_coords


def test_checkpoint_resume_and_lineage(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return generate_points(spark, 1000, partitions=2)

    p = str(tmp_path / "stage1")
    r1 = run_stage(spark, "points", p, build, params={"n": 1000}, cell_col="page_id")
    assert not r1.skipped and calls["n"] == 1
    assert r1.manifest["row_count"] == 1000
    assert len(r1.manifest["cell_histogram"]) > 0

    # identical params -> skip, no rebuild
    r2 = run_stage(spark, "points", p, build, params={"n": 1000})
    assert r2.skipped and calls["n"] == 1
    assert r2.df.count() == 1000

    # changed params -> rebuild
    def build2():
        calls["n"] += 1
        return generate_points(spark, 500, partitions=2)

    r3 = run_stage(spark, "points", p, build2, params={"n": 500})
    assert not r3.skipped and calls["n"] == 2
    assert r3.manifest["row_count"] == 500

    # downstream stage re-runs when upstream fingerprint changes
    def agg_build():
        return r3.df.groupBy().agg(F.count("*").alias("n"))

    p2 = str(tmp_path / "stage2")
    d1 = run_stage(spark, "agg", p2, agg_build, inputs=[r3], params={})
    assert not d1.skipped
    d2 = run_stage(spark, "agg", p2, agg_build, inputs=[r3], params={})
    assert d2.skipped
    assert d1.manifest["inputs"] == [r3.fingerprint]

    # manifest is valid json on disk
    m = read_manifest(p2)
    assert m["stage"] == "agg"


def test_indexed_store_bbox_query(spark, tmp_path):
    n = 20_000
    pts = generate_points(spark, n, partitions=4)
    path = str(tmp_path / "store")
    write_indexed(pts, path, digits=2)

    bbox = (-75.0, 39.5, -72.0, 41.5)  # around NYC hot cell
    got = bbox_query(spark, path, *bbox)
    rows = sorted(r["page_id"] for r in got.collect())

    ids = np.arange(n, dtype=np.int64)
    lon, lat = page_coords(ids)
    want = sorted(ids[(lon >= bbox[0]) & (lon <= bbox[2])
                      & (lat >= bbox[1]) & (lat <= bbox[3])].tolist())
    assert rows == want
    assert len(rows) > 0

    # the plan must show partition pruning + pushed filters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z2_p" in plan
    assert "PushedFilters" in plan and "lon" in plan

    # pruning is real: fewer partition dirs scanned than exist
    prefixes = bbox_partition_prefixes(*bbox, digits=2)
    all_parts = [d for d in os.listdir(path) if d.startswith("z2_p=")]
    assert 0 < len(prefixes) < len(all_parts)


def test_prefixes_world_bbox_is_everything(spark):
    assert len(bbox_partition_prefixes(-180, -90, 180, 90, digits=1)) == 16


def test_partition_rows_in_manifest(spark, tmp_path):
    """partition_by stages record per-partition row counts (the
    per-partition lineage/metrics surface the salt planner reads)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "parts")

    def build():
        return (spark.range(100)
                .withColumn("bucket", (F.col("id") % 4).cast("string"))
                .withColumn("v", F.col("id") * 2))

    r = run_stage(spark, "parts", p, build, params={}, partition_by=["bucket"])
    pr = r.manifest["partition_rows"]
    assert pr == {"0": 25, "1": 25, "2": 25, "3": 25}
    # resume keeps the recorded metrics
    r2 = run_stage(spark, "parts", p, build, params={}, partition_by=["bucket"])
    assert r2.skipped and r2.manifest["partition_rows"] == pr
