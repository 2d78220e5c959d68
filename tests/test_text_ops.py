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


class TestBM25:
    def test_matches_reference_formula(self, spark):
        import math

        from geomesa_spark.operators.text import bm25_score

        corpus = [
            (0, "hash join hash join scan"),
            (1, "vector scan filter"),
            (2, "merge sort order by"),
            (3, "hash"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r["doc_id"]: (r["dl"], r["score32"])
               for r in bm25_score(df, "doc_id", "text",
                                   ["hash", "vector"]).collect()}
        # brute force
        toks = {i: t.split() for i, t in corpus}
        N, dls = 4, {i: len(t) for i, t in toks.items()}
        avgdl = sum(dls.values()) / N
        k1, b = 1.2, 0.75

        def score(i):
            s = 0.0
            for term in ("hash", "vector"):
                tf = toks[i].count(term)
                df_t = sum(1 for t in toks.values() if term in t)
                idf = math.log((N - df_t + 0.5) / (df_t + 0.5) + 1.0)
                s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
            return s

        assert set(got) == {0, 1, 3}          # doc 2 matches nothing
        for i in got:
            assert got[i][0] == dls[i]
            assert abs(got[i][1] - score(i)) < 1e-5

    def test_rare_term_outscores_common(self, spark):
        from geomesa_spark.operators.text import bm25_score

        rows = [(i, "common filler words here") for i in range(20)]
        rows += [(100, "common rare"), (101, "common common")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["score32"]
               for r in bm25_score(df, "doc_id", "text",
                                   ["rare", "common"]).collect()}
        assert got[100] > got[101]


class TestPhraseSearch:
    @staticmethod
    def _brute(texts, phrase, lowercase=True):
        toks = phrase.split()
        if lowercase:
            toks = [t.lower() for t in toks]
        k = len(toks)
        out = {}
        for i, t in texts.items():
            ws = (t.lower() if lowercase else t).strip().split()
            hits = [s + 1 for s in range(len(ws) - k + 1)
                    if ws[s:s + k] == toks]
            if hits:
                out[i] = (len(hits), hits[0])
        return out

    def test_matches_brute_force(self, spark):
        from geomesa_spark.operators.text import phrase_search

        texts = {
            0: "the quick brown fox jumps over the lazy dog",
            1: "quick brown fox and another quick brown fox here",
            2: "quick fox brown",                  # terms present, order wrong
            3: "THE Quick BROWN fox",              # case folding
            4: "nothing relevant at all",
            5: "quick brown",                      # truncated phrase
        }
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        for phrase in ("quick brown fox", "the quick", "fox"):
            got = {r.doc_id: (r.n_hits, r.first_pos)
                   for r in phrase_search(docs, "doc_id", "text",
                                          phrase).collect()}
            assert got == self._brute(texts, phrase), phrase

    def test_overlaps_and_duplicate_terms(self, spark):
        from geomesa_spark.operators.text import phrase_search

        texts = {0: "a a a a a", 1: "the x the x the", 2: "x the x"}
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        for phrase in ("a a", "the x the"):
            got = {r.doc_id: (r.n_hits, r.first_pos)
                   for r in phrase_search(docs, "doc_id", "text",
                                          phrase).collect()}
            assert got == self._brute(texts, phrase), phrase

    def test_case_sensitive_and_validation(self, spark):
        import pytest

        from geomesa_spark.operators.text import phrase_search

        docs = spark.createDataFrame([(0, "The cat"), (1, "the cat")],
                                     "doc_id long, text string")
        got = {r.doc_id for r in phrase_search(
            docs, "doc_id", "text", "the cat", lowercase=False).collect()}
        assert got == {1}
        with pytest.raises(ValueError, match="non-empty"):
            phrase_search(docs, "doc_id", "text", "   ")
        with pytest.raises(ValueError, match="max 62"):
            phrase_search(docs, "doc_id", "text", " ".join(["w"] * 63))


class TestGeoSearch:
    def test_brute_force_ranking(self, spark):
        """Equal-relevance docs rank purely by distance (nearest first);
        a no-match doc near the query point is excluded (bm25 > 0
        filter); combined score matches the brute-force formula."""
        import math

        import pytest

        from geomesa_spark.operators.text import geo_search

        # same text => identical bm25; distance decides the order
        rows = [
            (0, "hash join", 10.0, 20.0),    # at the query point
            (1, "hash join", 10.0, 25.0),    # ~556 km north
            (2, "hash join", 10.0, 60.0),    # far
            (3, "no match here", 10.0, 20.0),  # nearest but irrelevant
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lon double, lat double")
        got = geo_search(df, "doc_id", "text", "lon", "lat",
                         ["hash"], qlon=10.0, qlat=20.0, k=10,
                         half_dist_m=500_000.0).collect()
        assert [r.doc_id for r in got] == [0, 1, 2]
        assert [r.rank for r in got] == [1, 2, 3]

        # brute-force the combined score for doc 1
        R = 6371008.7714
        la1, la2 = math.radians(20.0), math.radians(25.0)
        d = 2 * R * math.asin(math.sqrt(
            math.sin((la2 - la1) / 2) ** 2))
        k1, b = 1.2, 0.75
        N, df_t, dls, avgdl = 4, 3, 2, (2 + 2 + 2 + 3) / 4
        idf = math.log((N - df_t + 0.5) / (df_t + 0.5) + 1.0)
        bm = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * dls / avgdl))
        exp = bm * 0.5 ** (d / 500_000.0)
        r1 = [r for r in got if r.doc_id == 1][0]
        assert abs(r1.geo_score32 - exp) < 1e-5
        assert abs(r1.dist32 - d) < 1.0

        with pytest.raises(ValueError, match="k >="):
            geo_search(df, "doc_id", "text", "lon", "lat", ["hash"],
                       qlon=0.0, qlat=0.0, k=0)
        with pytest.raises(ValueError, match="half_dist_m"):
            geo_search(df, "doc_id", "text", "lon", "lat", ["hash"],
                       qlon=0.0, qlat=0.0, half_dist_m=0.0)


def test_script_mix_unicode_brute_force(spark):
    """Exact per-class counts on mixed-script text, checked against a
    pure-Python count over the same class ranges."""
    import re

    from geomesa_spark.operators.text import SCRIPT_CLASSES, script_mix

    rows = [
        (0, "Hello мир 123"),
        (1, "日本語 text with καλημέρα and مرحبا"),
        (2, ""),
        (3, None),
        (4, "tabs\tand\nnewlines plus emoji \U0001F600"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in script_mix(df, "doc_id", "text").collect()}
    for i, t in rows:
        t = t or ""
        exp_total = len(t)
        assert got[i]["n_chars"] == exp_total
        covered = 0
        for name, pat in SCRIPT_CLASSES:
            exp = len(re.findall(pat, t))
            assert got[i][f"n_{name}"] == exp, (i, name)
            covered += exp
        assert got[i]["n_other"] == exp_total - covered
    # the emoji (non-BMP, outside every class) lands in n_other
    assert got[4]["n_other"] >= 1
