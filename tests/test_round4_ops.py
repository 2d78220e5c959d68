"""Round-4 operators: Kneser-Ney bigram LM, point-x-rect DWITHIN join,
HITS driver shape, checkpoint-resume wiring."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------------------------------------
# kneser_ney_bigrams


def test_kneser_ney_hand_computed(spark):
    """Tiny corpus checked against the closed-form interpolated-KN
    values: corpus 'a b a b' + 'c b' -> bigrams ab, ba, ab, cb.
    Types: (a,b) c=2, (b,a) c=1, (c,b) c=1; T=3.
    prefixes: a: c1=2 n1=1; b: c1=1 n1=1; c: c1=1 n1=1.
    continuations: b: n2=2; a: n2=1.
    P(b|a) = (2-.75)/2 + (.75*1/2)*(2/3) = 0.625 + 0.25 = 0.875
    P(a|b) = (1-.75)/1 + (.75*1/1)*(1/3) = 0.25 + 0.25 = 0.5
    P(b|c) = (1-.75)/1 + (.75*1/1)*(2/3) = 0.25 + 0.5 = 0.75
    """
    from geomesa_spark.operators.corpus import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c b")], "doc_id long, text string")
    rows = {(r["w1"], r["w2"]): (r["c12"], r["p_kn"])
            for r in kneser_ney_bigrams(docs, "text").collect()}
    assert rows[("a", "b")][0] == 2
    assert math.isclose(rows[("a", "b")][1], 0.875, rel_tol=1e-12)
    assert math.isclose(rows[("b", "a")][1], 0.5, rel_tol=1e-12)
    assert math.isclose(rows[("c", "b")][1], 0.75, rel_tol=1e-12)
    # probability simplex: sum over continuations of each prefix == 1
    # (interpolated KN is a proper distribution over SEEN vocabularies
    # when every continuation mass target is itself seen — here w2 of
    # every type); check prefix 'a' has all mass on 'b' except the
    # backoff share spread over {a: 1/3, b: 2/3}
    assert rows[("a", "b")][1] + (0.75 * 1 / 2) * (1 / 3) == pytest.approx(1.0)


def test_kneser_ney_topk_cutoff(spark):
    from geomesa_spark.operators.corpus import kneser_ney_bigrams

    docs = spark.createDataFrame(
        [(i, "x y z w") for i in range(5)], "doc_id long, text string")
    out = kneser_ney_bigrams(docs, "text", k=2).collect()
    # 3 types (x,y) (y,z) (z,w), all c12=5 -> the (w1, w2) tie-break
    # makes the k=2 cutoff total and deterministic
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y"), ("y", "z")}


def test_kneser_ney_is_a_distribution(spark):
    """Interpolated KN over a seen vocabulary is a proper conditional
    distribution: for EVERY prefix w1, sum over all seen continuations
    w2 of P(w2|w1) must equal 1 (discount mass exactly redistributed
    through the continuation model). Random corpus, all prefixes."""
    import numpy as np
    from geomesa_spark.operators.corpus import kneser_ney_bigrams

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab, size=rng.randint(2, 30))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = kneser_ney_bigrams(df, "text", k=100000).collect()
    # P(w2|w1) sums to 1 only over the FULL continuation vocabulary
    # (every w2 seen as a continuation anywhere), with unseen (w1, w2)
    # pairs contributing their backoff-only mass lambda(w1)*Pcont(w2).
    by = {}
    for r in rows:
        by.setdefault(r["w1"], {})[r["w2"]] = r["p_kn"]
    # reconstruct the model tables from the returned rows
    c12 = {(r["w1"], r["w2"]): r["c12"] for r in rows}
    c1 = {}
    n1 = {}
    for (w1, _), c in c12.items():
        c1[w1] = c1.get(w1, 0) + c
        n1[w1] = n1.get(w1, 0) + 1
    n2 = {}
    for (_, w2) in c12:
        n2[w2] = n2.get(w2, 0) + 1
    tt = len(c12)
    for w1 in c1:
        lam = 0.75 * n1[w1] / c1[w1]
        total = 0.0
        for w2, nn in n2.items():
            seen = by.get(w1, {}).get(w2)
            total += seen if seen is not None else lam * (nn / tt)
        assert abs(total - 1.0) < 1e-9, (w1, total)


def test_kn_perplexity_hand_computed(spark):
    """Same tiny corpus as the KN test: doc1 'a b a b' has bigrams
    (a,b) (b,a) (a,b) with P = .875, .5, .875 -> ppl =
    (.875^2 * .5)^(-1/3); doc2 'c b' -> ppl = 1/P(b|c) = 1/0.75."""
    from geomesa_spark.operators.corpus import kn_perplexity

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c b"), (3, "single")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            kn_perplexity(docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2}  # one-word doc has no bigram
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["ppl32"] == pytest.approx(
        (0.875 ** 2 * 0.5) ** (-1 / 3), rel=1e-6)
    assert rows[2]["ppl32"] == pytest.approx(1 / 0.75, rel=1e-6)


# ---------------------------------------------------------------------------
# dwithin_join_rects


def _rect_dist(px, py, x0, y0, x1, y1):
    dx = max(0.0, x0 - px, px - x1)
    dy = max(0.0, y0 - py, py - y1)
    return math.hypot(dx, dy)


def test_dwithin_rects_brute_force(spark):
    from geomesa_spark.operators.spatial_join import dwithin_join_rects

    rng = np.random.RandomState(11)
    pts = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(-170, 170, 400), rng.uniform(-80, 80, 400)))]
    rects = []
    for j in range(25):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
        w, h = rng.uniform(1, 15), rng.uniform(1, 15)
        rects.append((j, cx - w, cy - h, cx + w, cy + h))
    p = spark.createDataFrame(pts, "pid long, lon double, lat double")
    r = spark.createDataFrame(rects,
                              "rid long, x0 double, y0 double, "
                              "x1 double, y1 double")
    out = dwithin_join_rects(p, r, 6.0, "lon", "lat", "x0", "y0", "x1", "y1",
                             broadcast_rects=True)
    got = {(row["pid"], row["rid"]) for row in out.collect()}
    want = {(i, j) for i, px, py in pts for j, x0, y0, x1, y1 in rects
            if _rect_dist(px, py, x0, y0, x1, y1) < 6.0}
    assert got == want and got


def test_dwithin_rects_inside_is_zero(spark):
    from geomesa_spark.operators.spatial_join import dwithin_join_rects

    p = spark.createDataFrame([(0, 1.0, 1.0)], "pid long, lon double, lat double")
    r = spark.createDataFrame([(0, 0.0, 0.0, 5.0, 5.0)],
                              "rid long, x0 double, y0 double, x1 double, y1 double")
    rows = dwithin_join_rects(p, r, 0.5, "lon", "lat",
                              "x0", "y0", "x1", "y1").collect()
    assert len(rows) == 1 and rows[0]["dist"] == 0.0


def test_dwithin_rects_antimeridian(spark):
    """A rect hugging +179.9 with radius 1 must catch a point at -179.8
    via the wrapped cell cover... distance itself is cartesian, so the
    pair only matches if the raw degree distance is < radius — this
    pins the CURRENT contract: cartesian degrees, no wraparound in the
    metric (the cover wraps; the refine does not invent matches)."""
    from geomesa_spark.operators.spatial_join import dwithin_join_rects

    p = spark.createDataFrame([(0, -179.8, 0.0)], "pid long, lon double, lat double")
    r = spark.createDataFrame([(0, 179.0, -1.0, 179.9, 1.0)],
                              "rid long, x0 double, y0 double, x1 double, y1 double")
    rows = dwithin_join_rects(p, r, 1.0, "lon", "lat",
                              "x0", "y0", "x1", "y1").collect()
    assert rows == []  # 359.7-degree cartesian gap: no match by contract


# ---------------------------------------------------------------------------
# hits (driver-shape regression: iters guard + L1 normalization)


def test_hits_l1_normalized_and_guard(spark):
    from geomesa_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 1)], "src long, dst long")
    out = hits(edges, iters=2, deterministic=True).collect()
    hub = sum(r["hub"] for r in out)
    auth = sum(r["auth"] for r in out)
    assert hub == pytest.approx(1.0) and auth == pytest.approx(1.0)
    with pytest.raises(ValueError):
        hits(edges, iters=0)
