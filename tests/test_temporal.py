"""asof_join + sessionize unit tests."""

import datetime as dt

import pytest


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m, seconds=s,
                                                  microseconds=us)


def test_asof_join_backward_inclusive_and_ties(spark):
    from geomesa_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, _ts(10)),   # matches state at exactly ts=10 (inclusive)
         (2, 100, _ts(25)),   # matches latest earlier state (ts=20)
         (3, 100, _ts(5)),    # before any state -> dropped (inner)
         (4, 200, _ts(30))],  # other key
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, _ts(10), 7, 1.0),
         (100, _ts(10), 8, 2.0),   # same ts: max view_id wins
         (100, _ts(20), 9, 3.0),
         (200, _ts(1), 11, 4.0)],
        "user_id long, ts timestamp, view_id long, view_value double")
    out = {r.event_id: (r.view_id, r.matched_ts)
           for r in asof_join(left, right, on="user_id",
                              right_order="view_id").collect()}
    assert out == {1: (8, _ts(10)), 2: (9, _ts(20)), 4: (11, _ts(1))}


def test_asof_join_left_keeps_unmatched(spark):
    from geomesa_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(3, 100, _ts(5))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(100, _ts(10), 7, 1.0)],
                                  "user_id long, ts timestamp, view_id long, view_value double")
    rows = asof_join(left, right, on="user_id", right_order="view_id",
                     how="left").collect()
    assert len(rows) == 1 and rows[0].view_id is None


def test_asof_join_rejects_column_clash(spark):
    from geomesa_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100, _ts(1))],
                                 "event_id long, user_id long, ts timestamp")
    with pytest.raises(ValueError, match="event_id"):
        asof_join(left, left, on="user_id")


def test_sessionize_gap_boundary(spark):
    from geomesa_spark.operators.temporal import session_stats, sessionize

    # gap=30min: 30:00.000000 exactly is NOT a new session (strict >)
    df = spark.createDataFrame(
        [(1, 5, _ts(0)), (2, 5, _ts(30)), (3, 5, _ts(59)),
         (4, 5, _ts(29 + 60, 0, 1)),       # 30min + 1us after event 3 -> new
         (5, 9, _ts(0))],
        "event_id long, user_id long, ts timestamp")
    s = {r.event_id: r.session_idx
         for r in sessionize(df, "user_id", "ts", 30.0, "event_id").collect()}
    assert s == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0}

    stats = {(r.user_id, r.session_idx): (r.n_events, r.t_start, r.t_end)
             for r in session_stats(df, "user_id", "ts", 30.0, "event_id").collect()}
    assert stats[(5, 0)] == (3, _ts(0), _ts(59))
    assert stats[(5, 1)][0] == 1
    assert stats[(9, 0)] == (1, _ts(0), _ts(0))


def test_asof_join_single_shuffle_plan(spark):
    """The MERGE formulation's scale claim, asserted on the physical
    plan: ONE exchange (the key hash-partition for the window) and no
    join operator at all — the union rides the same shuffle."""
    from geomesa_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100, _ts(10))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(100, _ts(5), 7, 1.0)],
                                  "user_id long, ts timestamp, view_id long, view_value double")
    out = asof_join(left, right, on="user_id", right_order="view_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "BroadcastExchange" not in plan


def test_sessionize_single_shuffle_plan(spark):
    from geomesa_spark.operators.temporal import session_stats

    df = spark.createDataFrame([(1, 5, _ts(0))],
                               "event_id long, user_id long, ts timestamp")
    out = session_stats(df, "user_id", "ts", 30.0, "event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange for the keyed window; the session rollup reuses the
    # same partitioning (user_id ⊂ (user_id, session_idx) would force a
    # second hash exchange only if Catalyst failed to see the window's
    # partial ordering — pin the current single-exchange shape)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert plan.count("Exchange hashpartitioning(user_id") >= 1


def test_asof_join_ignores_null_right_ts(spark):
    """A right row with NULL ts can never be an as-of match; it must not
    be carried forward as leaked payload on 'left' rows."""
    from geomesa_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100, _ts(5))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, None, 7, 1.0)],
        "user_id long, ts timestamp, view_id long, view_value double")
    rows = asof_join(left, right, on="user_id", right_order="view_id",
                     how="left").collect()
    assert len(rows) == 1
    assert rows[0].view_id is None and rows[0].matched_ts is None
    assert asof_join(left, right, on="user_id", right_order="view_id",
                     how="inner").count() == 0


def _brute_pairs(lrows, rrows, key=None):
    out = set()
    for lid, ls, le, lk in lrows:
        for rid, rs, re, rk in rrows:
            if key is not None and lk != rk:
                continue
            if ls < re and rs < le and le > ls and re > rs:
                out.add((lid, rid, min(le, re) - max(ls, rs)))
    return out


def test_interval_join_brute_force(spark):
    """Random intervals (negatives, touching endpoints, multi-bin spans,
    empty/inverted) vs an O(n^2) reference, several bin widths."""
    import random

    from geomesa_spark.operators.temporal import interval_join

    rng = random.Random(42)

    def mk(n):
        rows = []
        for i in range(n):
            s = rng.randint(-500, 500)
            rows.append((i, s, s + rng.randint(-5, 200), rng.randint(0, 2)))
        return rows

    lrows, rrows = mk(120), mk(150)
    left = spark.createDataFrame(lrows, "lid long, ls long, le long, lk long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long, rk long")
    want = _brute_pairs(lrows, rrows)
    for w in (7, 64, 1000):
        got = {(r.lid, r.rid, r.overlap)
               for r in interval_join(left, right, "ls", "le", "rs", "re",
                                      bin_width=w).collect()}
        assert got == want, f"bin_width={w}"


def test_interval_join_keyed_and_touching(spark):
    from geomesa_spark.operators.temporal import interval_join

    lrows = [(1, 0, 10, 7), (2, 0, 10, 8), (3, 10, 20, 7)]
    rrows = [(11, 10, 20, 7), (12, 5, 6, 7), (13, 5, 6, 8)]
    left = spark.createDataFrame(lrows, "lid long, ls long, le long, k long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long, k long")
    got = {(r.lid, r.rid)
           for r in interval_join(left, right, "ls", "le", "rs", "re",
                                  bin_width=8, on="k").collect()}
    # [0,10) vs [10,20): touching half-open endpoints do NOT overlap
    assert got == {(1, 12), (2, 13), (3, 11)}
    with pytest.raises(ValueError):
        interval_join(left, right, "ls", "le", "rs", "re", bin_width=0)
    with pytest.raises(ValueError):
        interval_join(left.withColumnRenamed("lid", "rid"), right,
                      "ls", "le", "rs", "re", bin_width=8)


def test_funnel_known_answers(spark):
    from geomesa_spark.operators.temporal import funnel

    rows = [
        # user 1: clean view -> click -> purchase
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(9), "purchase"),
        # user 2: purchase BEFORE the view chain -> only 2 steps complete
        (2, _ts(0), "purchase"), (2, _ts(1), "view"), (2, _ts(2), "click"),
        # user 3: click at the SAME instant as view (not strictly after)
        (3, _ts(4), "view"), (3, _ts(4), "click"),
        # user 4: never views
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
        # user 5: earliest view chosen, later click still chains
        (5, _ts(10), "view"), (5, _ts(3), "view"), (5, _ts(7), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {r.user_id: r for r in
           funnel(df, "user_id", "ts", "et",
                  ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1].steps_completed == 3 and got[1].step3_ts == _ts(9)
    assert got[2].steps_completed == 2 and got[2].step3_ts is None
    assert got[3].steps_completed == 1
    assert got[5].steps_completed == 2 and got[5].step1_ts == _ts(3)


def test_funnel_within_window(spark):
    from geomesa_spark.operators.temporal import funnel

    rows = [(1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(90), "purchase"),
            (2, _ts(0), "view"), (2, _ts(5), "click"), (2, _ts(8), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {r.user_id: r.steps_completed for r in
           funnel(df, "user_id", "ts", "et", ["view", "click", "purchase"],
                  within_us=10 * 60 * 1_000_000).collect()}
    assert got == {1: 2, 2: 3}   # user 1's purchase falls outside 10 min

    import pytest as _pt
    with _pt.raises(ValueError):
        funnel(df, "user_id", "ts", "et", [])


def test_interval_join_huge_axis_values(spark):
    """Axis values above 2^53: double division would misplace bins and
    drop overlapping pairs; integer DIV keeps the cover exact."""
    from geomesa_spark.operators.temporal import interval_join

    base = 2 ** 55
    lrows = [(1, base + 1, base + 50), (2, base - 100, base + 5)]
    rrows = [(11, base + 49, base + 200), (12, base - 200, base - 99)]
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    got = {(r.lid, r.rid, r.overlap)
           for r in interval_join(left, right, "ls", "le", "rs", "re",
                                  bin_width=7).collect()}
    assert got == {(1, 11, 1), (2, 12, 1)}


def test_transition_matrix_known_answer(spark):
    from geomesa_spark.operators.temporal import transition_matrix

    rows = [
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "view"),
        (1, _ts(3), "click"),
        (2, _ts(0), "view"), (2, _ts(1), "purchase"),
        (3, _ts(0), "view"),   # single event: no transition
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {(r.from_state, r.to_state): (r.n, r.prob_ppm)
           for r in transition_matrix(df, "user_id", "ts", "et").collect()}
    # from view: click x2, purchase x1; from click: view x1
    assert got == {("view", "click"): (2, 666666),
                   ("view", "purchase"): (1, 333333),
                   ("click", "view"): (1, 1000000)}
