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

    # identical params AND layout -> skip, no rebuild
    r2 = run_stage(spark, "points", p, build, params={"n": 1000},
                   cell_col="page_id")
    assert r2.skipped and calls["n"] == 1
    assert r2.df.count() == 1000

    # changed LAYOUT (cell_col) is part of the stage identity -> rebuild
    r2b = run_stage(spark, "points", p, build, params={"n": 1000})
    assert not r2b.skipped and calls["n"] == 2

    # truncated manifest (crash mid-write) -> cache miss, rebuild, heal
    import os
    with open(os.path.join(p, "_manifest.json"), "w") as fh:
        fh.write('{"stage": "poi')   # torn write
    r2c = run_stage(spark, "points", p, build, params={"n": 1000})
    assert not r2c.skipped and calls["n"] == 3
    assert read_manifest(p)["row_count"] == 1000

    # changed params -> rebuild
    def build2():
        calls["n"] += 1
        return generate_points(spark, 500, partitions=2)

    r3 = run_stage(spark, "points", p, build2, params={"n": 500})
    assert not r3.skipped and calls["n"] == 4
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


def test_query_store_cql(spark, tmp_path):
    """ECQL in, planned scan out: row set == unpruned brute force; empty
    (disjoint AND) short-circuits."""
    from geomesa_spark.functions import register_functions
    from geomesa_spark.plans.store import query_store, write_indexed
    from geomesa_spark.sources.pages import generate_pages, geoparse

    register_functions(spark)
    pts = geoparse(generate_pages(spark, 3000, partitions=8)) \
        .select("url", "lon", "lat")
    path = str(tmp_path / "cql_store")
    write_indexed(pts, path)

    cql = ("(BBOX(geom, -75, 39.5, -72, 41.5) OR BBOX(geom, -1, 50, 1, 52)) "
           "AND url LIKE '%1%'")
    got = {r["url"] for r in query_store(spark, path, cql).collect()}
    in_a = (F.col("lon") >= -75) & (F.col("lon") <= -72) \
        & (F.col("lat") >= 39.5) & (F.col("lat") <= 41.5)
    in_b = (F.col("lon") >= -1) & (F.col("lon") <= 1) \
        & (F.col("lat") >= 50) & (F.col("lat") <= 52)
    brute = pts.filter((in_a | in_b) & F.col("url").contains("1"))
    assert got == {r["url"] for r in brute.collect()} and got

    empty = query_store(spark, path,
                        "BBOX(geom, 0, 0, 1, 1) AND BBOX(geom, 5, 5, 6, 6)")
    assert empty.count() == 0


def test_xz2_store_bbox_query(spark, tmp_path):
    """Extended-geometry store: xz2 partition pruning + envelope sidecar
    predicates return exactly the envelope-intersecting rows."""
    import numpy as np

    from geomesa_spark.geom.wkb import Polygon, wkb_write
    from geomesa_spark.plans.store import (
        bbox_query_xz2, write_indexed_xz2, xz2_partition_prefixes)

    rng = np.random.RandomState(11)
    rows = []
    for i in range(400):
        cx = rng.uniform(-170, 170)
        cy = rng.uniform(-80, 80)
        w = rng.uniform(0.1, 8.0)
        h = rng.uniform(0.1, 8.0)
        ring = np.array([[cx - w, cy - h], [cx - w, cy + h], [cx + w, cy + h],
                         [cx + w, cy - h], [cx - w, cy - h]])
        rows.append((i, bytearray(wkb_write(Polygon(ring))),
                     float(cx - w), float(cy - h), float(cx + w), float(cy + h)))
    df = spark.createDataFrame(
        [(r[0], bytes(r[1])) for r in rows], "gid long, geom binary")
    path = str(tmp_path / "xz2_store")
    write_indexed_xz2(df, path)

    qx0, qy0, qx1, qy1 = -30.0, -20.0, 10.0, 15.0
    got = {r["gid"] for r in
           bbox_query_xz2(spark, path, qx0, qy0, qx1, qy1).collect()}
    want = {r[0] for r in rows
            if r[2] <= qx1 and r[4] >= qx0 and r[3] <= qy1 and r[5] >= qy0}
    assert got == want and got

    # the planner actually prunes: covering prefixes < all partitions
    prefixes = xz2_partition_prefixes(qx0, qy0, qx1, qy1, digits=2)
    n_parts = spark.read.parquet(path).select("xz2_p").distinct().count()
    assert 0 < len(prefixes) < 256
    assert len(prefixes) < n_parts or n_parts < 8  # meaningful pruning


def test_plan_query_strategy_selection(spark, tmp_path):
    """StrategyDecider analog: bounded spatial -> z2-index, attribute-only
    or whole-world -> full-scan, disjoint -> empty."""
    from geomesa_spark.functions import register_functions
    from geomesa_spark.plans.store import plan_query, write_indexed
    from geomesa_spark.sources.pages import generate_pages, geoparse

    register_functions(spark)
    pts = geoparse(generate_pages(spark, 1500, partitions=8)) \
        .select("url", "lon", "lat")
    path = str(tmp_path / "strat_store")
    write_indexed(pts, path)

    _, p = plan_query(spark, path, "BBOX(geom, -75, 39.5, -72, 41.5)")
    assert p["strategy"] == "z2-index" and 0 < p["prefixes"] < 192

    _, p = plan_query(spark, path, "url LIKE 'http%'")
    assert p["strategy"] == "full-scan"

    _, p = plan_query(spark, path, "BBOX(geom, -180, -90, 180, 90)")
    assert p["strategy"] == "full-scan"      # whole-world: pruning useless

    _, p = plan_query(spark, path,
                      "BBOX(geom, 0, 0, 1, 1) AND BBOX(geom, 5, 5, 6, 6)")
    assert p["strategy"] == "empty"


def test_z3_store_stbox_query(spark, tmp_path):
    """Spatio-temporal store: (bin, z3-prefix) pruning returns exactly
    the box-and-interval rows; interior bins reuse the full-offset
    prefix set."""
    import numpy as np

    from geomesa_spark.plans.store import (
        stbox_query_z3, write_indexed_z3, z3_partition_prefixes)

    rng = np.random.RandomState(3)
    n = 5000
    base = 1_600_000_000
    rows = [(int(i),
             float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80)),
             int(base + rng.randint(0, 4 * 604_800)))   # 4 weeks
            for i in range(n)]
    df = spark.createDataFrame(rows, "pid long, lon double, lat double, secs long")
    path = str(tmp_path / "z3_store")
    write_indexed_z3(df, path)

    qx0, qy0, qx1, qy1 = -60.0, -30.0, 40.0, 35.0
    t0 = base + 3 * 86400          # mid-week start
    t1 = base + 16 * 86400         # spans 3 bins incl. one full interior
    got = {r["pid"] for r in
           stbox_query_z3(spark, path, qx0, qy0, qx1, qy1, t0, t1).collect()}
    want = {r[0] for r in rows
            if qx0 <= r[1] <= qx1 and qy0 <= r[2] <= qy1 and t0 <= r[3] < t1}
    assert got == want and got

    # pruning is real: the window's prefixes are a strict subset
    pfx = z3_partition_prefixes(qx0, qy0, qx1, qy1, 0, 604_799, digits=2)
    assert 0 < len(pfx) < 256


def test_s3_store_stbox_query(spark, tmp_path):
    """S3 store (S2 cell + week bin): bin-range x covering-prefix pruning
    returns exactly the box-and-interval rows; the spatial prefix set is
    shared across bins (key orders cell before offset)."""
    import numpy as np

    from geomesa_spark.plans.store import (
        s2_partition_prefixes, stbox_query_s3, write_indexed_s3)

    rng = np.random.RandomState(7)
    n = 5000
    base = 1_600_000_000
    rows = [(int(i),
             float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80)),
             int(base + rng.randint(0, 4 * 604_800)))   # 4 weeks
            for i in range(n)]
    df = spark.createDataFrame(rows, "pid long, lon double, lat double, secs long")
    path = str(tmp_path / "s3_store")
    write_indexed_s3(df, path)

    qx0, qy0, qx1, qy1 = -60.0, -30.0, 40.0, 35.0
    t0 = base + 3 * 86400
    t1 = base + 16 * 86400
    got = {r["pid"] for r in
           stbox_query_s3(spark, path, qx0, qy0, qx1, qy1, t0, t1).collect()}
    want = {r[0] for r in rows
            if qx0 <= r[1] <= qx1 and qy0 <= r[2] <= qy1 and t0 <= r[3] < t1}
    assert got == want and got

    # pruning is real: the covering's prefixes are a strict subset
    pfx = s2_partition_prefixes(qx0, qy0, qx1, qy1, digits=2)
    assert 0 < len(pfx) < 256

    # empty interval short-circuits
    assert stbox_query_s3(spark, path, qx0, qy0, qx1, qy1, t0, t0).count() == 0


def test_xz3_store_stbox_query(spark, tmp_path):
    """Extended geometries + time: (bin, xz3-prefix) pruning returns
    exactly the envelope-and-interval rows."""
    import numpy as np

    from geomesa_spark.geom.wkb import Polygon, wkb_write
    from geomesa_spark.plans.store import (
        stbox_query_xz3, write_indexed_xz3, xz3_partition_prefixes)

    rng = np.random.RandomState(5)
    base = 1_600_000_000
    rows = []
    for i in range(800):
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        w, h = rng.uniform(0.1, 6.0), rng.uniform(0.1, 6.0)
        t = int(base + rng.randint(0, 3 * 604_800))
        ring = np.array([[cx - w, cy - h], [cx - w, cy + h], [cx + w, cy + h],
                         [cx + w, cy - h], [cx - w, cy - h]])
        rows.append((i, bytes(wkb_write(Polygon(ring))), t,
                     cx - w, cy - h, cx + w, cy + h))
    df = spark.createDataFrame([(r[0], r[1], r[2]) for r in rows],
                               "gid long, geom binary, secs long")
    path = str(tmp_path / "xz3_store")
    write_indexed_xz3(df, path)

    qx0, qy0, qx1, qy1 = -40.0, -25.0, 30.0, 30.0
    t0, t1 = base + 2 * 86400, base + 12 * 86400
    got = {r["gid"] for r in
           stbox_query_xz3(spark, path, qx0, qy0, qx1, qy1, t0, t1).collect()}
    want = {r[0] for r in rows
            if r[3] <= qx1 and r[5] >= qx0 and r[4] <= qy1 and r[6] >= qy0
            and t0 <= r[2] < t1}
    assert got == want and got

    pfx = xz3_partition_prefixes(qx0, qy0, qx1, qy1, 0, 604_799, digits=2)
    assert 0 < len(pfx) < 256


def test_query_guard_rejects_unbounded(spark, tmp_path):
    from geomesa_spark.functions import register_functions
    from geomesa_spark.plans.store import plan_query, write_indexed

    register_functions(spark)
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "pid long, lon double, lat double")
    path = str(tmp_path / "guard_store")
    write_indexed(pts, path)
    with pytest.raises(ValueError, match="query guard"):
        plan_query(spark, path, "pid > 0", require_bounded=True)
    df, p = plan_query(spark, path, "BBOX(geom, -1, -1, 1, 1)",
                       require_bounded=True)
    assert p["strategy"] == "z2-index" and df.count() == 1


def test_attr_store_query(spark, tmp_path):
    """Attribute index: bucket + z2 partition pruning, exact row set."""
    from geomesa_spark.plans.store import attr_query, write_indexed_attr

    n = 20_000
    pts = generate_points(spark, n, partitions=4).withColumn(
        "cat", F.concat(F.lit("c"), (F.col("page_id") % 5).cast("string")))
    path = str(tmp_path / "astore")
    write_indexed_attr(pts, path, "cat", digits=1, max_buckets=16)

    got = attr_query(spark, path, "cat", "c3", digits=1, max_buckets=16)
    rows = sorted(r["page_id"] for r in got.collect())
    assert rows == [i for i in range(n) if i % 5 == 3]

    bbox = (-75.0, 39.5, -72.0, 41.5)
    gotb = attr_query(spark, path, "cat", "c3", bbox=bbox, digits=1,
                      max_buckets=16)
    ids = np.arange(n, dtype=np.int64)
    lon, lat = page_coords(ids)
    keep = (ids % 5 == 3) & (lon >= bbox[0]) & (lon <= bbox[2]) \
        & (lat >= bbox[1]) & (lat <= bbox[3])
    assert sorted(r["page_id"] for r in gotb.collect()) == \
        sorted(ids[keep].tolist())

    plan = gotb._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "attr_b" in plan and "z2_p" in plan
    assert "PushedFilters" in plan


def test_compact_store_binpacks_and_sorts(spark, tmp_path):
    from geomesa_spark.plans.store import bbox_query, compact_store

    n = 20_000
    pts = generate_points(spark, n, partitions=8)
    path = str(tmp_path / "cstore")
    write_indexed(pts, path, digits=1)
    stats = compact_store(spark, path, ["z2_p"], sort_by=["z2_hex"])
    assert stats["rows"] == n
    assert stats["files_after"] < stats["files_before"]
    # one file per partition dir
    import glob as _glob
    for d in _glob.glob(f"{path}/z2_p=*"):
        assert len(_glob.glob(f"{d}/*.parquet")) == 1
    # store still answers queries identically
    bbox = (-75.0, 39.5, -72.0, 41.5)
    got = sorted(r["page_id"]
                 for r in bbox_query(spark, path, *bbox, digits=1).collect())
    ids = np.arange(n, dtype=np.int64)
    lon, lat = page_coords(ids)
    want = sorted(ids[(lon >= bbox[0]) & (lon <= bbox[2])
                      & (lat >= bbox[1]) & (lat <= bbox[3])].tolist())
    assert got == want


def test_crawl_to_training_pipeline_checkpointed(spark, tmp_path):
    """End-to-end crawl -> training-data pipeline, every stage through
    plans.checkpoint.run_stage: extract (north-rule byte-identical text
    invariant), Gopher gates, exact dedup, near dedup, benchmark
    decontamination, context chunking. A second driver run replays the
    identical program and every stage must no-op (resume); bumping one
    mid-pipeline param must rebuild that stage and everything downstream
    while upstream stages stay checkpointed (lineage)."""
    from geomesa_spark.operators.corpus import (
        chunk_text, dedup_apply, decontaminate, extract_html_text,
        gopher_quality,
    )
    from geomesa_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
    from geomesa_spark.sources.pages import generate_pages

    base = str(tmp_path)
    built = []

    def stage(name, build, inputs=None, params=None):
        def counted():
            built.append(name)
            return build()
        return run_stage(spark, name, f"{base}/{name}", counted,
                         inputs=inputs or [], params=params or {})

    def run_all(min_words=5):
        r_raw = stage("raw", lambda: generate_pages(spark, 400)
                      .select("url", "html", "text", "lang"),
                      params={"n": 400})

        def build_extract():
            df = r_raw.df.withColumn("etext", extract_html_text(F.col("html")))
            # the input_hint per-row invariant: byte-identical extracted
            # text per url
            assert df.filter(F.col("etext") != F.col("text")).count() == 0
            return df.select(
                F.xxhash64("url").alias("doc_id"), "url",
                F.col("etext").alias("text"), "lang",
                F.split("etext", " ")[1].cast("long").alias("pid"))
        r_ex = stage("extracted", build_extract, inputs=[r_raw])

        def build_corpus():
            d = r_ex.df
            recrawl = (d.filter(F.col("pid") < 30)
                        .withColumn("url", F.concat("url", F.lit("?recrawl")))
                        .withColumn("doc_id", F.xxhash64("url")))
            variant = (d.filter((F.col("pid") >= 30) & (F.col("pid") < 50))
                        .withColumn("url", F.concat("url", F.lit("?v2")))
                        .withColumn("doc_id", F.xxhash64("url"))
                        .withColumn("text", F.concat("text", F.lit(" extra"))))
            junk = spark.createDataFrame(
                [(-(i + 1), f"junk{i}", "### ### ###", "en", -1)
                 for i in range(5)],
                "doc_id long, url string, text string, lang string, pid long")
            return d.unionByName(recrawl).unionByName(variant) \
                    .unionByName(junk)
        r_corpus = stage("corpus", build_corpus, inputs=[r_ex])

        def build_gated():
            g = gopher_quality(r_corpus.df, "doc_id", "text",
                               min_words=min_words, max_words=100,
                               max_mean_word_len=12,
                               min_alpha_word_ppm=400_000, min_stopwords=0)
            return r_corpus.df.join(g.filter("keep").select("doc_id"),
                                    on="doc_id", how="left_semi")
        r_gated = stage("gated", build_gated, inputs=[r_corpus],
                        params={"min_words": min_words})

        def build_exact():
            keep = exact_dedup(r_gated.df, "doc_id", "text") \
                .select(F.col("keep_id").alias("doc_id"))
            return r_gated.df.join(keep, on="doc_id", how="left_semi")
        r_exact = stage("exact_deduped", build_exact, inputs=[r_gated])

        def build_near():
            pairs = ngram_jaccard_pairs(r_exact.df, "doc_id", "text",
                                        n=3, threshold=0.8)
            return dedup_apply(r_exact.df, pairs, "doc_id")
        r_near = stage("near_deduped", build_near, inputs=[r_exact])

        def build_clean():
            ev = r_near.df.filter(F.col("pid").isin(100, 200, 300)) \
                          .select("doc_id", "text")
            flagged = decontaminate(r_near.df, ev, "doc_id", "text", n=8)
            return r_near.df.join(flagged.select("doc_id"),
                                  on="doc_id", how="left_anti")
        r_clean = stage("decontaminated", build_clean, inputs=[r_near])

        r_chunks = stage("chunks", lambda: chunk_text(
            r_clean.df, "doc_id", "text", chunk_tokens=4, overlap=1),
            inputs=[r_clean])
        return [r_raw, r_ex, r_corpus, r_gated, r_exact, r_near,
                r_clean, r_chunks]

    rs = run_all()
    counts = [r.manifest["row_count"] for r in rs]
    assert counts == [400, 400, 455, 450, 420, 400, 397, 397 * 3]
    assert all(not r.skipped for r in rs)
    assert built == ["raw", "extracted", "corpus", "gated",
                     "exact_deduped", "near_deduped", "decontaminated",
                     "chunks"]

    # resume: identical program -> every stage no-ops off its manifest
    built.clear()
    rs2 = run_all()
    assert all(r.skipped for r in rs2) and built == []
    assert [r.manifest["row_count"] for r in rs2] == counts

    # lineage: bump a mid-pipeline param -> that stage and everything
    # downstream rebuild; upstream stages stay checkpointed
    built.clear()
    rs3 = run_all(min_words=4)
    assert [r.skipped for r in rs3] == [True, True, True] + [False] * 5
    assert built == ["gated", "exact_deduped", "near_deduped",
                     "decontaminated", "chunks"]
    assert [r.manifest["row_count"] for r in rs3] == counts  # junk is
    # 3 words — still below the loosened gate; content identical


def test_z3_store_age_off_query(spark, tmp_path):
    """Age-off retention scan: exactly the rows inside [now-ttl, now),
    and whole expired week-bins are pruned at the partition level (the
    executed plan's PartitionFilters carry z3_bin)."""
    import numpy as np

    from geomesa_spark.plans.store import age_off_query_z3, write_indexed_z3

    rng = np.random.RandomState(7)
    base = 1_600_000_000
    rows = [(int(i),
             float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80)),
             int(base + rng.randint(0, 4 * 604_800)))   # 4 weeks
            for i in range(4000)]
    df = spark.createDataFrame(rows, "pid long, lon double, lat double, secs long")
    path = str(tmp_path / "ageoff_store")
    write_indexed_z3(df, path)

    now = base + 4 * 604_800
    ttl = 10 * 86400   # horizon lands mid-week: oldest ~2.5 weeks expire
    out = age_off_query_z3(spark, path, ttl_s=ttl, now_s=now)
    got = {r["pid"] for r in out.collect()}
    want = {r[0] for r in rows if now - ttl <= r[3] < now}
    assert got == want and got and len(got) < len(rows)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z3_bin" in plan


def test_inverted_index_store_query(spark, tmp_path):
    """Posting correctness vs a brute force over the same tokenization,
    case-normalized query terms, and hash-prefix partition pruning
    visible in the executed plan."""
    from geomesa_spark.plans.text_index import (term_query,
                                                write_inverted_index)

    rows = [(0, "the Hash join beats the hash LOOP"),
            (1, "vector scan"),
            (2, "no match here"),
            (3, "hash")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tidx")
    write_inverted_index(df, path)

    out = term_query(spark, path, ["HASH", "vector"])
    got = {(r.term, r.doc_id): (r.tf, r.first_pos, list(r.positions))
           for r in out.collect()}
    assert got == {
        ("hash", 0): (2, 1, [1, 5]),
        ("hash", 3): (1, 0, [0]),
        ("vector", 1): (1, 0, [0]),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term_p" in plan

    import pytest
    with pytest.raises(ValueError, match="at least one term"):
        term_query(spark, path, [])


def test_inverted_index_phrase_query(spark, tmp_path):
    """Phrase search from the store matches a direct-text brute force,
    incl. overlapping and repeated-term phrases; validation."""
    import pytest

    from geomesa_spark.plans.text_index import (phrase_query,
                                                write_inverted_index)

    rows = [(0, "the hash join beats the hash join loop"),
            (1, "hash join"),
            (2, "join hash"),
            (3, "hash"),
            (4, "go go go"),
            (5, "a go go stop")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tidx_p")
    write_inverted_index(df, path)

    def brute(phrase):
        toks = phrase.lower().split()
        out = {}
        for i, t in rows:
            ws = t.lower().split()
            st = [j for j in range(len(ws) - len(toks) + 1)
                  if ws[j:j + len(toks)] == toks]
            if st:
                out[i] = (len(st), st[0])
        return out

    for phrase in ("hash join", "go go", "the hash join"):
        got = {r.doc_id: (r.n_matches, r.first_start)
               for r in phrase_query(spark, path, phrase).collect()}
        assert got == brute(phrase), phrase

    with pytest.raises(ValueError, match="non-empty"):
        phrase_query(spark, path, "   ")


def test_inverted_index_ranked_query_parity(spark, tmp_path):
    """Store-served BM25 is bit-identical to the raw-text scorer over
    the same corpus and terms (absent terms contribute an exact +0.0,
    df/N/dl all exact integers); validation."""
    import pytest
    from pyspark.sql import functions as F

    from geomesa_spark.operators.text import bm25_score
    from geomesa_spark.plans.text_index import (ranked_query,
                                                write_inverted_index)

    rows = [(0, "hash join hash join scan"),
            (1, "vector scan filter"),
            (2, "merge sort order by"),
            (3, "hash"),
            (4, "the hash vector vector mix")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "tidx_r")
    write_inverted_index(df, path)
    terms = ["hash", "vector"]
    store = [(r.doc_id, r.dl, r.score32, r.rank)
             for r in ranked_query(spark, path, terms, k=10).collect()]
    raw = bm25_score(df, "doc_id", "text", terms) \
        .orderBy(F.col("score32").desc(), "doc_id").limit(10).collect()
    assert store == [(r.doc_id, r.dl, r.score32, i + 1)
                     for i, r in enumerate(raw)]
    with pytest.raises(ValueError, match="at least one term"):
        ranked_query(spark, path, [])
    with pytest.raises(ValueError, match="k >="):
        ranked_query(spark, path, terms, k=0)


def test_inverted_index_append_equals_rebuild(spark, tmp_path):
    """Disjoint-id append produces exactly the postings and ranking of
    a full single build — rerunning overwrite+append is idempotent."""
    from geomesa_spark.plans.text_index import (append_inverted_index,
                                                ranked_query, term_query,
                                                write_inverted_index)

    rows = [(i, t) for i, t in enumerate(
        ["hash join scan", "vector filter", "hash hash", "merge sort",
         "vector hash join", "plain text row"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = str(tmp_path / "tidx_full")
    inc = str(tmp_path / "tidx_inc")
    write_inverted_index(df, full)
    for _ in range(2):   # idempotent overwrite + append
        write_inverted_index(df.filter("doc_id % 2 = 0"), inc)
        append_inverted_index(df.filter("doc_id % 2 = 1"), inc)

    def snap(path, fn, *a, **kw):
        return sorted(tuple(r) for r in fn(spark, path, *a, **kw).collect())

    assert snap(inc, term_query, ["hash", "vector"]) == \
        snap(full, term_query, ["hash", "vector"])
    assert snap(inc, ranked_query, ["hash", "vector"], k=10) == \
        snap(full, ranked_query, ["hash", "vector"], k=10)
