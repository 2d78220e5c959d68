#!/usr/bin/env python
"""spark-submit entry point: web-pages PIP spatial-join pipeline.

Usage:
    python scripts/make_pyfiles.py /tmp/engine.zip
    spark-submit --master local[N] --py-files /tmp/engine.zip \
        scripts/pip_job.py --pages 1000000 --polys 200 [--out DIR]

Runs corpus generation -> geoparse -> checkpointed points stage ->
PIP join, printing one JSON summary line. The geomesa_spark package is
resolved from --py-files (no repo on PYTHONPATH needed) — the
spark-submit deployment mode required by the north rule; all hot-path
work is Arrow-vectorized or JVM expressions, zero per-row Python.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--polys", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("pip_job")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
             .getOrCreate())

    from geomesa_spark.operators.spatial_join import pip_join
    from geomesa_spark.plans.checkpoint import run_stage
    from geomesa_spark.sources.pages import generate_pages, generate_polys, geoparse

    out_dir = args.out or tempfile.mkdtemp(prefix="pip_job_")

    t0 = time.time()
    pts_stage = run_stage(
        spark, "geoparsed_points", f"{out_dir}/points",
        lambda: geoparse(generate_pages(spark, args.pages)).select("url", "lon", "lat"),
        params={"pages": args.pages}, cell_col=None)
    polys = generate_polys(spark, args.polys)
    joined = pip_join(pts_stage.df, polys, "lon", "lat", "geom",
                      predicate="st_contains", broadcast_polys=True)
    n = joined.count()
    wall = time.time() - t0

    print(json.dumps({
        "job": "pip_join", "pages": args.pages, "polys": args.polys,
        "match_rows": n, "wall_s": round(wall, 2),
        "points_stage_skipped": pts_stage.skipped, "out": out_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
