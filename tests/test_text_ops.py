"""dedup_clusters (connected components) + repetition_stats unit tests."""

from pyspark.sql import functions as F


def _clusters(spark, pairs, **kw):
    from geomesa_spark.operators.dedup import dedup_clusters

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = dedup_clusters(df, **kw)
    return {r.id: r.cluster_id for r in out.collect()}


def test_dedup_clusters_two_components(spark):
    # both strategies: driver union-find (default) and the distributed
    # pointer-jumping loop (driver_threshold=0 disables the fast path)
    for kw in ({}, {"driver_threshold": 0}):
        got = _clusters(spark, [(1, 2), (2, 3), (5, 6)], **kw)
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_dedup_clusters_path_graph_pointer_jumping(spark):
    # worst case for plain propagation: a 33-node path needs 32 naive
    # rounds; pointer jumping must converge well inside max_iters=10
    pairs = [(i, i + 1) for i in range(32)]
    got = _clusters(spark, pairs, max_iters=10, driver_threshold=0)
    assert got == {i: 0 for i in range(33)}


def test_dedup_clusters_empty_pairs(spark):
    assert _clusters(spark, [(1, 1)][:0]) == {}


def test_dedup_clusters_reversed_and_duplicate_edges(spark):
    for kw in ({}, {"driver_threshold": 0}):
        got = _clusters(spark, [(9, 4), (4, 9), (9, 4), (4, 2)], **kw)
        assert got == {2: 2, 4: 2, 9: 2}


def test_dedup_clusters_strategies_agree(spark):
    import random

    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    pairs = [(a, b) for a, b in pairs if a != b]
    fast = _clusters(spark, pairs)
    dist = _clusters(spark, pairs, driver_threshold=0)
    assert fast == dist


def test_repetition_stats_exact_values(spark):
    from geomesa_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"),      # words: a*3 b*2; 2-grams: "a b"*2 "b a"*2
         (2, "x y z w")],       # all unique; 2-grams all unique
        "doc_id long, text string")
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}

    r1 = rows[1]
    assert r1.n_words == 5 and r1.n_distinct_words == 2
    assert r1.top_word_count == 3
    assert r1.dup_word_frac == 1.0              # every word occurs >1x
    assert r1.top_word_charmass_frac == 3 / 5   # 'a'*3 of 5 word chars
    assert r1.n_grams == 4 and r1.top_gram_count == 2
    assert r1.dup_gram_frac == 1.0

    r2 = rows[2]
    assert r2.n_words == 4 and r2.n_distinct_words == 4
    assert r2.top_word_count == 1 and r2.dup_word_frac == 0.0
    assert r2.top_word_charmass_frac == 1 / 4
    assert r2.n_grams == 3 and r2.dup_gram_frac == 0.0


def test_repetition_stats_short_doc(spark):
    from geomesa_spark.operators.text import repetition_stats

    # single word: the 2-gram window degenerates to the word itself
    df = spark.createDataFrame([(7, "solo")], "doc_id long, text string")
    r = repetition_stats(df, "doc_id", "text").collect()[0]
    assert r.n_words == 1 and r.n_grams == 1 and r.dup_gram_frac == 0.0
