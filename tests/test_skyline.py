"""skyline (Pareto front): brute-force equivalence + known answers."""

import random


def _dominates(p, q):
    return all(a <= b for a, b in zip(p, q)) and any(a < b for a, b in zip(p, q))


def _brute(rows, dims, signs):
    pts = [tuple(r[d] * s for d, s in zip(dims, signs)) for r in rows]
    out = []
    for i, p in enumerate(pts):
        if not any(_dominates(q, p) for j, q in enumerate(pts) if j != i):
            out.append(rows[i][0])
    return sorted(out)


def test_skyline_brute_force(spark):
    from geomesa_spark.operators.skyline import skyline

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 100), rng.uniform(0, 100),
             rng.uniform(0, 100)) for i in range(400)]
    # duplicates: identical criterion vectors must all survive together
    rows.append((400, rows[0][1], rows[0][2], rows[0][3]))
    df = spark.createDataFrame(rows, "id long, a double, b double, c double") \
              .repartition(7)
    got = sorted(r.id for r in skyline(df, ["a", "b", "c"]).collect())
    want = _brute(rows, [1, 2, 3], [1, 1, 1])
    assert got == want
    # mixed directions: minimize a, maximize b
    got2 = sorted(r.id for r in
                  skyline(df, ["a", "b"], [True, False]).collect())
    want2 = _brute(rows, [1, 2], [1, -1])
    assert got2 == want2


def test_skyline_known_answer(spark):
    import pytest as _pt

    from geomesa_spark.operators.skyline import skyline

    rows = [(1, 1.0, 5.0), (2, 2.0, 2.0), (3, 5.0, 1.0),
            (4, 3.0, 3.0),            # dominated by 2
            (5, 1.0, 5.0)]            # duplicate of 1: both kept
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(r.id for r in skyline(df, ["x", "y"]).collect())
    assert got == [1, 2, 3, 5]
    with _pt.raises(ValueError):
        skyline(df, [])
    with _pt.raises(ValueError):
        skyline(df, ["x"], [True, False])


def test_skyline_merge_across_arrow_batches(spark):
    """Candidates spanning multiple Arrow batches in the merge pass:
    a per-batch merge would leak dominated rows (the batch-boundary
    bug); the merge must concatenate the whole candidate set."""
    import random

    from geomesa_spark.operators.skyline import skyline

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        rng = random.Random(21)
        # anti-correlated band -> large per-partition fronts, plus one
        # global dominator that must kill candidates in EVERY batch
        rows = [(i, x := rng.uniform(1, 100), 101.0 - x + rng.uniform(0, 5))
                for i in range(600)]
        rows.append((600, 0.5, 0.5))   # dominates everything
        df = spark.createDataFrame(rows, "id long, a double, b double") \
                  .repartition(11)
        got = sorted(r.id for r in skyline(df, ["a", "b"]).collect())
        assert got == [600]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
