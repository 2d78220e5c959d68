"""Round-3 operator unit tests: readability, zipf_fit, heaps_law,
retention_cohorts, bearing_rose, hard_negatives — brute-force / known-value
equivalence checks (the oracle mirror in test_entry_oracle.py covers the
cross-engine contract; these pin the operator semantics directly)."""

import datetime as dt
import math
import re

import numpy as np
import pytest


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m, seconds=s)


# ---------------------------------------------------------------------------
# readability

def _flesch_ref(text):
    words = [w for w in text.strip().lower().split()]
    if text.strip() == "":
        words = [""]
    n_words = len(words)
    n_sent = max(1, len(re.findall(r"[.!?]+", text)))
    n_syll = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
    score = 206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words)
    return n_words, n_sent, n_syll, score


@pytest.mark.parametrize("text", [
    "The cat sat on the mat. It was happy!",
    "One two three",
    "Antidisestablishmentarianism notwithstanding, brevity wins. Yes? Yes.",
    "xyz qrst bcdfg",          # no vowels: 1 syllable per word floor
])
def test_readability_matches_reference(spark, text):
    from geomesa_spark.operators.text import readability

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = readability(df, "doc_id", "text").collect()[0]
    nw, ns, sy, score = _flesch_ref(text)
    assert (row.n_words, row.n_sent, row.n_syll) == (nw, ns, sy)
    assert row.flesch32 == pytest.approx(score, rel=1e-6)


# ---------------------------------------------------------------------------
# zipf_fit

def test_zipf_fit_matches_numpy_ols(spark):
    from geomesa_spark.operators.corpus import zipf_fit

    # known frequencies: a x8, b x4, c x2, d x1
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(df, "doc_id", "text", top_n=10).collect()[0]
    freqs = [8, 4, 2, 1]
    x = np.log(np.arange(1, 5, dtype=float))
    y = np.log(np.array(freqs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert row.n_top == 4
    assert row.slope32 == pytest.approx(slope, rel=1e-5)
    assert row.intercept32 == pytest.approx(intercept, rel=1e-5)


def test_zipf_fit_tie_break_on_token(spark):
    from geomesa_spark.operators.corpus import zipf_fit

    # all equal frequency: top_n cut must be deterministic (token asc)
    df = spark.createDataFrame([(1, "z y x w v u")],
                               "doc_id long, text string")
    row = zipf_fit(df, "doc_id", "text", top_n=3).collect()[0]
    # freqs all 1 -> ly = 0 everywhere -> slope 0, intercept 0
    assert row.n_top == 3
    assert row.slope32 == pytest.approx(0.0, abs=1e-7)
    assert row.intercept32 == pytest.approx(0.0, abs=1e-7)

    with pytest.raises(ValueError):
        zipf_fit(df, "doc_id", "text", top_n=1)


# ---------------------------------------------------------------------------
# heaps_law

def test_heaps_law_brute_force(spark):
    from geomesa_spark.operators.corpus import heaps_law

    docs = [(1, "a b c"), (2, "a b"), (3, "d"), (4, "e a"), (10, "f f g")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.threshold_doc: (r.n_docs, r.vocab)
           for r in heaps_law(df, "doc_id", "text", n_points=4).collect()}
    # thresholds: 1 + (10-1)*(i+1)//4 for i in 0..3 -> {3, 5, 7, 10}
    assert set(out) == {3, 5, 7, 10}

    def brute(t):
        seen = set()
        nd = 0
        for d, txt in docs:
            if d <= t:
                nd += 1
                seen.update(txt.strip().lower().split())
        return nd, len(seen)

    for t in out:
        assert out[t] == brute(t)


def test_heaps_law_empty_and_validation(spark):
    from geomesa_spark.operators.corpus import heaps_law

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heaps_law(empty, "doc_id", "text").count() == 0
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        heaps_law(df, "doc_id", "text", n_points=0)


# ---------------------------------------------------------------------------
# retention_cohorts

def test_retention_cohorts_brute_force(spark):
    from geomesa_spark.operators.temporal import retention_cohorts

    day = 86_400_000_000
    rows = [
        (1, _ts(0)),                      # u1 day 0
        (1, _ts(0, 30)),                  # same day (dedup)
        (1, _ts(2 * 1440)),               # u1 day 2
        (2, _ts(1 * 1440)),               # u2 day 1
        (2, _ts(3 * 1440)),               # u2 day 3
        (3, _ts(1 * 1440)),               # u3 day 1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week, r.age_weeks): r.n_users
           for r in retention_cohorts(df, "user_id", "ts",
                                      bucket_us=day).collect()}
    base_day = int(dt.datetime(2024, 1, 1)
                   .replace(tzinfo=dt.timezone.utc).timestamp()
                   * 1_000_000) // day
    assert out == {
        (base_day, 0): 1,       # u1 cohort day0 active day0
        (base_day, 2): 1,       # u1 day2
        (base_day + 1, 0): 2,   # u2+u3 cohort day1
        (base_day + 1, 2): 1,   # u2 day3
    }
    with pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", bucket_us=0)


# ---------------------------------------------------------------------------
# bearing_rose

def _bearing_deg(lon1, lat1, lon2, lat2):
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2) - math.radians(lon1)
    th = math.atan2(math.sin(dl) * math.cos(la2),
                    math.cos(la1) * math.sin(la2)
                    - math.sin(la1) * math.cos(la2) * math.cos(dl))
    d = math.degrees(th)
    return d + 360.0 if d < 0 else d


def test_bearing_rose_known_directions(spark):
    from geomesa_spark.operators.trajectory import bearing_rose

    # one track through 4 cardinal moves from (0, 0)
    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (2, 1, _ts(1), 0.0, 1.0),    # due north  -> sector 0
        (3, 1, _ts(2), 1.0, 1.0),    # ~east      -> sector 2
        (4, 1, _ts(3), 1.0, 0.0),    # due south  -> sector 4
        (5, 1, _ts(4), 0.0, 0.0),    # ~west      -> sector 6
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    out = {}
    for r in bearing_rose(df, "user_id", "ts", "event_id",
                          "lon", "lat").collect():
        out[(r.cx, r.cy, r.sector)] = r.n_legs
    # all legs start in cell (4, 2) = lon [0,45), lat [0,45)
    exp = {}
    for (lo1, la1), (lo2, la2) in zip([(0, 0), (0, 1), (1, 1), (1, 0)],
                                      [(0, 1), (1, 1), (1, 0), (0, 0)]):
        s = min(int(_bearing_deg(lo1, la1, lo2, la2) // 45), 7)
        exp[(4, 2, s)] = exp.get((4, 2, s), 0) + 1
    assert out == exp
    # the eastbound leg starts at lat 1N: its great-circle initial
    # bearing is just UNDER 90 (the great circle bows poleward), so it
    # lands in sector 1; due north/south/west are exact 0/180/270.
    assert {k[2] for k in out} == {0, 1, 4, 6}


def test_bearing_rose_validation(spark):
    from geomesa_spark.operators.trajectory import bearing_rose

    df = spark.createDataFrame(
        [(1, 1, _ts(0), 0.0, 0.0)],
        "event_id long, user_id long, ts timestamp, lon double, lat double")
    # single-fix track: no legs
    assert bearing_rose(df, "user_id", "ts", "event_id",
                        "lon", "lat").count() == 0
    with pytest.raises(ValueError):
        bearing_rose(df, "user_id", "ts", "event_id", "lon", "lat",
                     sectors=0)
    with pytest.raises(ValueError):
        bearing_rose(df, "user_id", "ts", "event_id", "lon", "lat",
                     cell_deg=-1.0)


# ---------------------------------------------------------------------------
# hard_negatives

def test_hard_negatives_excludes_full_matches(spark):
    from geomesa_spark.operators.text import bm25_score, hard_negatives
    from geomesa_spark.operators import cache

    docs = spark.createDataFrame(
        [(1, "hash join vector pipeline"),       # all 3 terms -> excluded
         (2, "hash hash hash only"),             # partial
         (3, "join vector join"),                # partial
         (4, "nothing relevant here"),           # no term -> score 0
         (5, "vector"),                          # partial
         ],
        "doc_id long, text string")
    terms = ["hash", "join", "vector"]
    out = hard_negatives(docs, "doc_id", "text", terms, k=10)
    rows = out.collect()
    got = {r.doc_id for r in rows}
    assert got == {2, 3, 5}
    # ranks are 1..n by score desc
    by_rank = sorted(rows, key=lambda r: r.rank)
    scores = [r.score32 for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    # scores agree with bm25_score on the same corpus
    full = {r.doc_id: r.score32
            for r in bm25_score(docs, "doc_id", "text", terms).collect()}
    for r in rows:
        assert r.score32 == full[r.doc_id]
    cache.release(out)

    with pytest.raises(ValueError):
        hard_negatives(docs, "doc_id", "text", terms, k=0)
    with pytest.raises(ValueError):
        hard_negatives(docs, "doc_id", "text", [], k=5)


# ---------------------------------------------------------------------------
# recall_at_k

def test_recall_at_k_brute_force(spark):
    from geomesa_spark.operators.ann import recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12),
         (2, 20), (2, 21), (2, 22)],
        "qid long, vec_id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12),     # 2/3 hits
         (2, 77), (2, 78), (2, 79)],    # 0/3 hits
        "qid long, vec_id long")
    out = {r.qid: (r.n_hit, r.recall32)
           for r in recall_at_k(approx, exact).collect()}
    assert out[1] == (2, pytest.approx(2 / 3))
    assert out[2] == (0, 0.0)
    # every exact query appears even with zero hits
    assert set(out) == {1, 2}


def test_bearing_rose_drops_stationary_legs(spark):
    from geomesa_spark.operators.trajectory import bearing_rose

    # parked tracker: 3 identical fixes, then one true northbound move
    rows = [
        (1, 1, _ts(0), 5.0, 5.0),
        (2, 1, _ts(1), 5.0, 5.0),
        (3, 1, _ts(2), 5.0, 5.0),
        (4, 1, _ts(3), 5.0, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    out = bearing_rose(df, "user_id", "ts", "event_id",
                       "lon", "lat").collect()
    # only the single moving leg survives (sector 0, due north)
    assert len(out) == 1
    assert (out[0].sector, out[0].n_legs) == (0, 1)


# ---------------------------------------------------------------------------
# speed_outliers

def test_speed_outliers_flags_and_speed(spark):
    from geomesa_spark.operators.trajectory import speed_outliers

    # ~111 km northward in 1 minute = ~1853 m/s (flagged);
    # same displacement in 1 day = ~1.3 m/s (not flagged);
    # zero-duration teleport (same ts) = flagged with NULL speed
    rows = [
        (1, 1, _ts(0), 0.0, 0.0),
        (2, 1, _ts(1), 0.0, 1.0),          # fast leg
        (3, 1, _ts(1 + 1440), 0.0, 2.0),   # slow leg
        (4, 1, _ts(1 + 1440), 0.0, 3.0),   # teleport (dt = 0)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "lon double, lat double")
    out = {r.o1: r for r in speed_outliers(
        df, "user_id", "ts", "event_id", "lon", "lat",
        vmax_mps=70.0).collect()}
    assert set(out) == {1, 3}
    assert out[1].speed32 == pytest.approx(111195 / 60.0, rel=1e-3)
    assert out[3].dt_us == 0 and out[3].speed32 is None
    with pytest.raises(ValueError):
        speed_outliers(df, "user_id", "ts", "event_id", "lon", "lat",
                       vmax_mps=0.0)


# ---------------------------------------------------------------------------
# group_entropy

def test_group_entropy_known_values(spark):
    from geomesa_spark.operators.stats import group_entropy

    rows = ([("a", 1)] * 4                       # single key -> H = 0
            + [("b", 1), ("b", 2)]               # 2 equal keys -> ln 2
            + [("c", 1), ("c", 1), ("c", 1), ("c", 2)])  # 3:1 split
    df = spark.createDataFrame(rows, "g string, user long")
    for det in (False, True):
        out = {r.g: r for r in group_entropy(
            df, ["g"], "user", deterministic=det).collect()}
        assert (out["a"].n_events, out["a"].n_keys) == (4, 1)
        assert out["a"].entropy32 == 0.0
        assert out["b"].entropy32 == pytest.approx(math.log(2), rel=1e-6)
        p = [0.75, 0.25]
        h = -sum(x * math.log(x) for x in p)
        assert out["c"].entropy32 == pytest.approx(h, rel=1e-6)
    with pytest.raises(ValueError):
        group_entropy(df, [], "user")


# ---------------------------------------------------------------------------
# peak_bucket

def test_peak_bucket_argmax_and_ties(spark):
    from pyspark.sql import functions as F
    from geomesa_spark.operators.temporal import peak_bucket

    rows = [("x", 3), ("x", 3), ("x", 5),        # peak bucket 3 (n=2)
            ("y", 1), ("y", 2)]                  # tie -> larger bucket 2
    df = spark.createDataFrame(rows, "g string, b long")
    out = {r.g: (r.peak_bucket, r.n_peak)
           for r in peak_bucket(df, ["g"], F.col("b")).collect()}
    assert out == {"x": (3, 2), "y": (2, 1)}
    with pytest.raises(ValueError):
        peak_bucket(df, [], F.col("b"))


# ---------------------------------------------------------------------------
# plan shapes

def test_zipf_fit_topk_plan(spark):
    """The top-n cut must plan as TakeOrderedAndProject (per-partition
    bounded heaps + driver merge), never a single-partition sort of the
    full token-frequency table."""
    from geomesa_spark.operators.corpus import zipf_fit

    df = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    plan = (zipf_fit(df, "doc_id", "text", top_n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_hard_negatives_topk_plan(spark):
    from geomesa_spark.operators.text import hard_negatives
    from geomesa_spark.operators import cache

    df = spark.createDataFrame([(1, "hash x"), (2, "join y")],
                               "doc_id long, text string")
    out = hard_negatives(df, "doc_id", "text", ["hash", "join"], k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    cache.release(out)


def test_heaps_law_broadcasts_thresholds(spark):
    """The threshold side must broadcast — the token->first-doc frame
    never shuffles on anything but the token count."""
    from geomesa_spark.operators.corpus import heaps_law

    df = spark.createDataFrame([(1, "a b"), (9, "c")],
                               "doc_id long, text string")
    plan = (heaps_law(df, "doc_id", "text", n_points=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_group_entropy_default_has_no_collect_list(spark):
    """The default (scale) path must aggregate via plain sums — no
    collect_list in the plan (mega-groups stream through partial agg)."""
    from geomesa_spark.operators.stats import group_entropy

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, user long")
    plan = (group_entropy(df, ["g"], "user")
            ._jdf.queryExecution().executedPlan().toString())
    assert "collect_list" not in plan


# ---------------------------------------------------------------------------
# shortest_paths

def test_shortest_paths_vs_dijkstra(spark):
    import heapq

    from geomesa_spark.operators.graph import shortest_paths

    edges = [(0, 1, 4), (0, 2, 1), (2, 1, 2), (1, 3, 5),
             (2, 3, 8), (3, 4, 1), (9, 0, 1)]   # 9 unreachable from 0
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.node: r.dist
           for r in shortest_paths(df, [0], max_rounds=10).collect()}

    # reference Dijkstra
    adj = {}
    for s, t, w in edges:
        adj.setdefault(s, []).append((t, w))
    dist, pq = {0: 0}, [(0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            if d + w < dist.get(v, 1 << 60):
                dist[v] = d + w
                heapq.heappush(pq, (dist[v], v))
    assert out == dist
    assert 9 not in out   # unreached nodes absent


def test_shortest_paths_round_limit_and_undirected(spark):
    from geomesa_spark.operators.graph import shortest_paths

    # chain 0-1-2-3, weight 1 each
    df = spark.createDataFrame([(0, 1, 1), (1, 2, 1), (2, 3, 1)],
                               "src long, dst long, w long")
    # 2 rounds: only <= 2-edge paths
    out = {r.node: r.dist
           for r in shortest_paths(df, [0], max_rounds=2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}
    # undirected: seed 3 reaches 0 backwards
    out2 = {r.node: r.dist
            for r in shortest_paths(df, [3], max_rounds=5,
                                    directed=False).collect()}
    assert out2 == {3: 0, 2: 1, 1: 2, 0: 3}
    with pytest.raises(ValueError):
        shortest_paths(df, [], max_rounds=3)
    with pytest.raises(ValueError):
        shortest_paths(df, [0], max_rounds=0)


def test_shortest_paths_parallel_edges_take_cheapest(spark):
    from geomesa_spark.operators.graph import shortest_paths

    df = spark.createDataFrame([(0, 1, 9), (0, 1, 2)],
                               "src long, dst long, w long")
    out = {r.node: r.dist
           for r in shortest_paths(df, [0], max_rounds=3).collect()}
    assert out == {0: 0, 1: 2}


# ---------------------------------------------------------------------------
# haversine_col (shared spelling) vs the numpy kernel

def test_haversine_col_matches_numpy_kernel(spark):
    from pyspark.sql import functions as F
    from geomesa_spark.geom.measures import haversine_col, haversine_m

    rng = np.random.default_rng(7)
    n = 1000
    lon1 = rng.uniform(-180, 180, n)
    lat1 = rng.uniform(-90, 90, n)
    lon2 = rng.uniform(-180, 180, n)
    lat2 = rng.uniform(-90, 90, n)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(d))
         for a, b, c, d in zip(lon1, lat1, lon2, lat2)],
        "lon1 double, lat1 double, lon2 double, lat2 double")
    got = np.array([r.d for r in df.select(
        haversine_col(F.col("lon1"), F.col("lat1"),
                      F.col("lon2"), F.col("lat2")).alias("d")).collect()])
    exp = haversine_m(lon1, lat1, lon2, lat2)
    # JVM vs numpy libm: identical chains, allow last-ulp slack
    assert np.allclose(got, exp, rtol=1e-12, atol=1e-6)


def test_duckdb_radians_bit_equals_numpy():
    """Pins the migrated oracle convention: DuckDB ``radians(x)`` is
    bit-equal to ``np.radians`` (which test_haversine_col... shows is
    bit-equal to Spark's F.radians). The former ``x / 180.0 * pi()``
    oracle spelling differed in the last ulp on ~27% of inputs."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(11)
    xs = rng.uniform(-180, 180, 5000)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": xs}))
    d = con.sql("SELECT radians(x) AS r FROM t").df()["r"].to_numpy(np.float64)
    exp = np.radians(xs)
    assert (d.view(np.int64) == exp.view(np.int64)).all()


# ---------------------------------------------------------------------------
# gini_concentration

def _gini_ref(counts):
    x = np.sort(np.array(counts, dtype=np.int64))
    n, t = len(x), x.sum()
    i = np.arange(1, n + 1)
    return (2 * (i * x).sum() - (n + 1) * t) * 1_000_000 // (n * t)


def test_gini_concentration_brute_force(spark):
    from geomesa_spark.operators.corpus import gini_concentration
    from geomesa_spark.operators import cache

    # skewed: host 0 x 60, host 1 x 30, hosts 2..11 x 1
    rows = [(0,)] * 60 + [(1,)] * 30 + [(h,) for h in range(2, 12)]
    df = spark.createDataFrame(rows, "host long")
    out = gini_concentration(df, "host")
    r = out.collect()[0]
    counts = [60, 30] + [1] * 10
    assert (r.n_keys, r.total_rows) == (12, 100)
    assert r.gini_ppm == _gini_ref(counts)
    assert r.gini_ppm > 600_000          # visibly concentrated
    cache.release(out)


def test_gini_concentration_uniform_is_zero(spark):
    from geomesa_spark.operators.corpus import gini_concentration
    from geomesa_spark.operators import cache

    df = spark.createDataFrame([(h,) for h in range(8)] * 5, "host long")
    out = gini_concentration(df, "host")
    r = out.collect()[0]
    assert (r.n_keys, r.total_rows, r.gini_ppm) == (8, 40, 0)
    cache.release(out)

    single = spark.createDataFrame([(1,), (1,)], "host long")
    out2 = gini_concentration(single, "host")
    assert out2.collect()[0].gini_ppm == 0   # one key: no inequality
    cache.release(out2)


def test_gini_concentration_empty_is_zero_row(spark):
    from geomesa_spark.operators.corpus import gini_concentration
    from geomesa_spark.operators import cache

    empty = spark.createDataFrame([], "host long")
    out = gini_concentration(empty, "host")
    r = out.collect()[0]
    assert (r.n_keys, r.total_rows, r.gini_ppm) == (0, 0, 0)
    cache.release(out)


# ---------------------------------------------------------------------------
# knn_classify

def test_knn_classify_majority_and_ties(spark):
    from geomesa_spark.operators.knn import knn_classify
    from geomesa_spark.operators import cache

    # query at origin; 3 nearest labeled A/A/B -> majority A;
    # second query: nearest 2 split A/B (k=2) -> tie -> larger label B
    data = spark.createDataFrame(
        [(1, 0.1, 0.0, "A"), (2, 0.0, 0.1, "A"), (3, 0.2, 0.0, "B"),
         (4, 5.0, 5.0, "B"),
         (5, 10.0, 0.1, "A"), (6, 10.0, -0.1, "B"), (7, 30.0, 0.0, "A")],
        "did long, lon double, lat double, lbl string")
    q = spark.createDataFrame([(100, 0.0, 0.0), (200, 10.0, 0.0)],
                              "qid long, qx double, qy double")
    out1 = knn_classify(q.filter("qid = 100"), data, k=3, label_col="lbl",
                        initial_radius=1.0, max_radius=50.0)
    r1 = out1.collect()[0]
    assert (r1.qid, r1.label, r1.n_votes) == (100, "A", 2)
    cache.release(out1)

    out2 = knn_classify(q.filter("qid = 200"), data, k=2, label_col="lbl",
                        initial_radius=1.0, max_radius=50.0)
    r2 = out2.collect()[0]
    assert (r2.qid, r2.label, r2.n_votes) == (200, "B", 1)
    cache.release(out2)

    with pytest.raises(ValueError):
        knn_classify(q, data, k=0, label_col="lbl")
