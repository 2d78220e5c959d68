"""Corpus-preparation operators (operators/corpus.py + the quantized
ANN in operators/ann.py): hand-built frames with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.ann import quantize_int8, quantized_topk
from geomesa_spark.operators.corpus import (
    decontaminate, dedup_apply, line_dedup, mixing_stats, stratified_sample,
    word_ngrams,
)

SF001 = "/root/testdata/sf0.001"


def test_line_dedup_removes_shared_lines(spark):
    docs = spark.createDataFrame(
        [(1, "unique one\nBOILER\nunique two"),
         (2, "BOILER\nother prose"),
         (3, "BOILER")],   # nothing left -> dropped
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(docs, "doc_id", "text", min_docs=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == "unique one\nunique two"   # order preserved
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[2]["text"] == "other prose"


def test_line_dedup_intra_doc_repeat_counts_once(spark):
    # the same line twice in ONE doc is df=1 -> kept (both copies)
    docs = spark.createDataFrame(
        [(1, "dup\ndup\nx"), (2, "y")], "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in line_dedup(docs, "doc_id", "text", min_docs=2).collect()}
    assert out[1] == "dup\ndup\nx"


def test_word_ngrams_short_text_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "t string")
    got = df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()
    assert got[0]["g"] == []
    assert got[1]["g"] == ["a b c", "b c d"]


def test_decontaminate_counts(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),   # 2 hits, overlapping grams
         (2, "quick brown fox"),             # 1 hit (exactly one gram)
         (3, "nothing shared here at all"),
         (4, "ab")],                         # too short for any gram
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "the quick brown fox ran")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["n_distinct_hits"])
           for r in decontaminate(train, ev, "doc_id", "text", n=3).collect()}
    # eval 3-grams: {the quick brown, quick brown fox, brown fox ran}
    assert got == {1: (2, 2), 2: (1, 1)}


def test_stratified_sample_deterministic_subset(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"))
    half = stratified_sample(docs, "doc_id", "lang",
                             {"en": 500_000, "zh": 0})
    rows = sorted(r["doc_id"] for r in half.collect())
    rows2 = sorted(r["doc_id"] for r in half.collect())
    assert rows == rows2                       # retry-stable
    assert all(i % 2 == 0 for i in rows)       # zh fully dropped
    assert 150 < len(rows) < 350               # ~50% of the 500 en docs
    everything = stratified_sample(docs, "doc_id", "lang",
                                   {"en": 1_000_000, "zh": 1_000_000})
    assert everything.count() == 1000


def test_dedup_apply_keeps_canonical_and_singletons(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)],
                                 "doc_id long, text string")
    # chain 0-1-2 (cluster min 0) and pair 4-5 (min 4); 3 untouched
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "id_a long, id_b long")
    kept = sorted(r["doc_id"]
                  for r in dedup_apply(docs, pairs, "doc_id").collect())
    assert kept == [0, 3, 4]


def test_mixing_stats_exact(spark):
    docs = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", "four five"),
         (3, "b", "six seven eight nine ten")],
        "doc_id long, source string, text string")
    got = {r["source"]: r for r in
           mixing_stats(docs, "source", "doc_id", "text").collect()}
    assert (got["a"]["n_docs"], got["a"]["n_tokens"]) == (2, 5)
    assert (got["b"]["n_docs"], got["b"]["n_tokens"]) == (1, 5)
    assert got["a"]["token_share_ppm"] == 500_000
    assert got["a"]["n_chars"] == len("one two three") + len("four five")
    assert got["b"]["min_chars"] == got["b"]["max_chars"] == 24


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [3.0, -1.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert got[1]["qvec"] == [127, -63, 11]   # floor(x*127/3 + .5)
    assert got[1]["qnorm"] == 127 * 127 + 63 * 63 + 11 * 11
    assert got[2]["qvec"] is None             # zero vector: no direction


def test_quantized_topk_tracks_float_cosine(spark):
    from geomesa_spark.operators.ann import cosine_topk

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") % 20 == 0)
            .select(F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qvec_f")))
    qk = quantized_topk(q, emb, k=10)
    got = {(r["qid"], r["vec_id"]) for r in qk.collect()}
    exact = cosine_topk(
        q.select("qid", F.col("qvec_f").alias("embedding")), emb, 10)
    ref = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    assert len(got) == len(ref) > 0
    # int8 quantization perturbs sims by ~1e-3; top-10 overlap stays high
    assert len(got & ref) / len(ref) >= 0.9


def test_tfidf_topk_terms_known_answer(spark):
    from geomesa_spark.operators.corpus import tfidf_topk_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "common common date")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["idf_ppm"])
           for r in tfidf_topk_terms(docs, "doc_id", "text", k=2).collect()}
    # df: apple 1, banana 2, cherry 1, common 3, date 1; N=3
    # idf_ppm: df=1 -> 3e6, df=2 -> 1.5e6, df=3 -> 1e6
    assert got[(1, 1)] == ("apple", 2, 3_000_000)    # score 6e6
    assert got[(1, 2)] == ("banana", 1, 1_500_000)
    assert got[(2, 1)] == ("cherry", 1, 3_000_000)
    assert got[(3, 1)] == ("date", 1, 3_000_000)
    assert got[(3, 2)] == ("common", 2, 1_000_000)


def test_unigram_logprob_orders_fluency(spark):
    import math

    from geomesa_spark.operators.corpus import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the the"),            # all high-frequency
         (2, "the zzz qqq www")],           # mostly floor-prob words
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           unigram_logprob(docs, "doc_id", "text", vocab_size=1).collect()}
    # total=8, vocab={the: 5}; doc1 mean = ln(5/8); doc2 has 3 floor words
    assert got[1]["n_words"] == 4
    assert abs(got[1]["logprob_mean32"] - math.log(5 / 8)) < 1e-6
    assert got[2]["logprob_mean32"] < got[1]["logprob_mean32"]
    exp2 = (math.log(5 / 8) + 3 * math.log(1 / 8)) / 4
    assert abs(got[2]["logprob_mean32"] - exp2) < 1e-6


def test_normalize_url_rules(spark):
    from geomesa_spark.operators.corpus import normalize_url

    cases = [
        ("HTTPS://WWW.Example.COM/Path/X?utm_source=a&b=2&a=1#frag",
         "https://example.com/Path/X?a=1&b=2"),   # path case KEPT, www stripped
        ("http://example.com", "http://example.com/"),
        ("https://example.com/p?ref=x&gclid=1&fbclid=2", "https://example.com/p"),
        ("https://sub.www.com/a?z=9&a=1", "https://sub.www.com/a?a=1&z=9"),
        # delimiters INSIDE query values: split must use the first
        # occurrence, not the last
        ("https://a.example/r?to=https://b.example/x&b=1",
         "https://a.example/r?b=1&to=https://b.example/x"),
        ("https://e.com/p?next=/login?x=1", "https://e.com/p?next=/login?x=1"),
        # query with NO path: the host must stop at the first '?', not
        # swallow (and lowercase) the query string
        ("https://WWW.Host.com?utm_source=x&B=1", "https://host.com/?B=1"),
        ("http://Host.com?a=2", "http://host.com/?a=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["n"] for r in
           df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [e for _, e in cases]


def test_write_shards_roundtrip(spark, tmp_path):
    import numpy as np

    from geomesa_spark.operators.ann import mix64
    from geomesa_spark.operators.corpus import write_shards

    docs = spark.createDataFrame([(i, f"t{i}") for i in range(200)],
                                 "doc_id long, text string")
    path = str(tmp_path / "shards")
    write_shards(docs, path, "doc_id", n_shards=4)
    back = spark.read.parquet(path)
    rows = {r["doc_id"]: int(r["shard"]) for r in back.collect()}
    assert len(rows) == 200                       # nothing lost
    ids = np.arange(200, dtype=np.int64)
    expect = (mix64(ids) % np.uint64(4)).astype(int)
    assert rows == {int(i): int(s) for i, s in zip(ids, expect)}
    # re-write lands every doc in the same shard (retry-stable)
    write_shards(docs, path, "doc_id", n_shards=4)
    again = {r["doc_id"]: int(r["shard"])
             for r in spark.read.parquet(path).collect()}
    assert again == rows


def test_duplicated_ngram_fraction_known(spark):
    from geomesa_spark.operators.corpus import duplicated_ngram_fraction

    docs = spark.createDataFrame(
        [(1, "a b c d"),       # grams: "a b c", "b c d"
         (2, "a b c x"),       # grams: "a b c", "b c x"
         (3, "q r s")],        # gram: "q r s" (unique)
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
           for r in duplicated_ngram_fraction(
               docs, "doc_id", "text", n=3).collect()}
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 0.0)


def test_line_dedup_hot_boilerplate_key(spark):
    # one line shared by EVERY doc (the AQE skew-key case): all copies
    # removed, unique remainder intact
    docs = spark.createDataFrame(
        [(i, f"unique {i}\nCOOKIE BANNER") for i in range(50)],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in line_dedup(docs, "doc_id", "text", min_docs=2).collect()}
    assert len(out) == 50
    assert all(out[i] == f"unique {i}" for i in range(50))


def test_pack_sequences_matches_serial_reference(spark):
    import numpy as np
    from geomesa_spark.operators.ann import mix64
    from geomesa_spark.operators.corpus import pack_sequences

    n = 80
    docs = spark.createDataFrame(
        [(i, " ".join("w%d" % j for j in range(i % 7 + 1))) for i in range(n)],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"],
                         r["seq_first"], r["seq_last"])
           for r in pack_sequences(docs, "doc_id", "text", seq_len=16,
                                   num_partitions=5).collect()}
    ids = np.arange(n, dtype=np.int64)
    keys = mix64(ids, 42).astype(np.int64)
    nt = (ids % 7 + 1).astype(np.int64)
    cum = 0
    for i in np.lexsort((ids, keys)):
        assert got[i] == (int(nt[i]), cum, cum // 16, (cum + nt[i] - 1) // 16)
        cum += int(nt[i])
    assert len(got) == n


def test_pack_sequences_partition_invariant(spark):
    # the offsets are a pure function of the corpus, not of parallelism
    from geomesa_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a b c"[: (i % 3) * 2 + 1]) for i in range(30)],
        "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(
        docs, "doc_id", "text", 8, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_sequences(
        docs.repartition(7), "doc_id", "text", 8, num_partitions=6).collect()))
    assert a == b


def test_pii_redaction_classes(spark):
    from geomesa_spark.operators.corpus import pii_stats

    docs = spark.createDataFrame(
        [(1, "mail bob.smith+x@sub.example.co.uk now"),
         (2, "server at 10.0.255.3 port 80"),
         (3, "call +1 (555) 010-1234 today or 555-867-5309"),
         (4, "a@b.io from 192.168.0.1 tel 0800 123 4567"),
         (5, None),
         (6, "clean text, no spans")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           pii_stats(docs, "doc_id", "text").collect()}
    assert got[1]["redacted"] == "mail <EMAIL> now"
    assert got[2]["redacted"] == "server at <IP> port 80"
    assert got[3]["redacted"] == "call <PHONE> today or <PHONE>"
    assert got[4]["redacted"] == "<EMAIL> from <IP> tel <PHONE>"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (1, 1, 1)
    assert got[5]["redacted"] == ""          # null-safe
    assert got[6]["redacted"] == "clean text, no spans"


def test_incremental_dedup_against_index_and_within_batch(spark):
    from geomesa_spark.operators.corpus import incremental_dedup

    day1 = spark.createDataFrame(
        [(1, "aa"), (2, "bb")], "id long, text string")
    day2 = spark.createDataFrame(
        [(10, "aa"),            # already ingested on day 1 -> dropped
         (11, "cc"), (12, "cc"),  # within-batch dup -> min id wins
         (13, "dd")],
        "id long, text string")
    key = F.sha2(F.concat_ws("\x1f", "text"), 256)
    index = day1.select(key.alias("content_hash"))
    out = incremental_dedup(day2, index, "id", "text")
    assert sorted(r["id"] for r in out.collect()) == [11, 13]
    # survivors carry the digest so the index can be appended
    assert "content_hash" in out.columns
    # appending makes the NEXT batch incremental
    index2 = index.union(out.select("content_hash"))
    day3 = spark.createDataFrame([(20, "cc"), (21, "ee")],
                                 "id long, text string")
    assert sorted(r["id"] for r in
                  incremental_dedup(day3, index2, "id", "text").collect()) == [21]


def test_gopher_quality_gates(spark):
    from geomesa_spark.operators.corpus import gopher_quality

    good = " ".join(["the word is of good quality and that have be to with x"] * 8)
    docs = spark.createDataFrame(
        [(1, good),                          # passes all gates
         (2, "too short"),                   # word count
         (3, " ".join(["#"] * 60)),          # symbol ratio + alpha + stopwords
         (4, " ".join(["supercalifragilistic"] * 60)),  # mean word len > 10
         (5, None)],                         # null-safe
        "doc_id long, text string")
    got = {r["doc_id"]: r["keep"] for r in
           gopher_quality(docs, "doc_id", "text").collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_stratified_sample_null_id_dropped_not_crashed(spark):
    """A NULL id (or a string id that cast('long') nulls) must not kill
    the mix UDF's Arrow batch — null-in/null-out, row excluded."""
    from geomesa_spark.operators.corpus import stratified_sample

    df = spark.createDataFrame(
        [(1, "web", "a"), (None, "web", "b"), (2, "web", "c")],
        "id long, src string, text string")
    out = stratified_sample(df, "id", "src", {"web": 1_000_000})
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 2}   # ppm=1e6 keeps every valid row; null dropped


def test_incremental_dedup_null_shift_no_collision(spark):
    """('x', NULL) and (NULL, 'x') are different content: the length-
    prefixed multi-column digest must not collapse them (concat_ws
    alone would)."""
    from geomesa_spark.operators.corpus import incremental_dedup

    batch = spark.createDataFrame(
        [(1, "x", None), (2, None, "x")],
        "id long, title string, body string")
    seen = spark.createDataFrame([], "content_hash string")
    out = incremental_dedup(batch, seen, "id", "title", "body")
    assert {r["id"] for r in out.collect()} == {1, 2}


def test_content_digest_single_column_matches_plain_sha2(spark):
    """Single-column digest stays sha2(value) — the convention the
    DuckDB oracles and pre-existing indexes rely on."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.dedup import content_digest

    df = spark.createDataFrame([("hello",)], "text string")
    got = df.select(content_digest("text").alias("a"),
                    F.sha2(F.col("text"), 256).alias("b")).first()
    assert got["a"] == got["b"]


def test_semantic_dedup_matches_brute_force_rule(spark):
    """semantic_dedup survivors == the greedy rule computed by hand:
    drop a doc iff a smaller-id SAME-CLUSTER doc has cosine >= tau."""
    import numpy as np

    from geomesa_spark.operators.ann import mix64, semantic_dedup

    rng = np.random.RandomState(7)
    n, dim, k, tau = 120, 16, 3, 0.9
    base = rng.standard_normal((n, dim))
    # plant near-duplicates: rows 50..59 are jittered copies of rows 0..9
    base[50:60] = base[0:10] + 0.02 * rng.standard_normal((10, dim))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {(r["vec_id"], r["cluster_id"])
           for r in semantic_dedup(df, tau=tau, n_clusters=k, blocks=2).collect()}

    # brute force in numpy with the operator's exact conventions
    order = np.lexsort((np.arange(n), mix64(np.arange(n))))[:k]
    cent = base[order] / np.linalg.norm(base[order], axis=1, keepdims=True)
    cl = (base @ cent.T).argmax(axis=1)
    normed = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = normed @ normed.T
    want = set()
    for i in range(n):
        dropped = any(sims[i, j] >= tau and cl[j] == cl[i] for j in range(i))
        if not dropped:
            want.add((i, int(cl[i])))
    assert got == want
    assert len(got) < n  # the planted dups actually dropped something


def test_chunk_text_windows_and_tail_rule(spark):
    from geomesa_spark.operators.corpus import chunk_text

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, words),        # n=10, chunk=8, overlap=4 -> starts 0,4 (8 is a suffix)
         (2, "a b c"),      # short -> one chunk
         (3, ""),           # empty -> none
         (4, None),         # null -> none
         (5, "  x  ")],     # whitespace-padded single token
        "doc_id long, text string")
    out = chunk_text(docs, "doc_id", "text", chunk_tokens=8, overlap=4)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (5, 0)}
    assert rows[(1, 0)] == (8, " ".join(f"w{i}" for i in range(8)))
    assert rows[(1, 1)] == (6, " ".join(f"w{i}" for i in range(4, 10)))
    assert rows[(2, 0)] == (3, "a b c")
    assert rows[(5, 0)] == (1, "x")


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest as _pytest

    from geomesa_spark.operators.corpus import chunk_text

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_text(docs, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_quality_classifier_learned_weights_and_nulls(spark):
    """Hashing-trick path: score == mean(weights[bucket(token)]) + bias;
    empty/null docs score NULL and keep NULL."""
    import hashlib

    from geomesa_spark.operators.corpus import quality_classifier

    dim = 16
    weights = [round((i - 8) / 8.0, 3) for i in range(dim)]
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["score"], r["keep"])
           for r in quality_classifier(docs, "doc_id", "text",
                                       weights=weights, bias=0.25,
                                       threshold=0.0, dim=dim).collect()}

    def w(tok):
        b = int(hashlib.sha256(tok.encode()).hexdigest()[:8], 16) % dim
        return weights[b]

    exp1 = 0.25 + (w("alpha") + w("beta") + w("gamma")) / 3
    exp2 = 0.25 + w("alpha")
    assert abs(out[1][0] - exp1) < 1e-12 and out[1][1] == (exp1 >= 0.0)
    assert abs(out[2][0] - exp2) < 1e-12 and out[2][1] == (exp2 >= 0.0)
    assert out[3] == (None, None) and out[4] == (None, None)


def test_chunk_text_nonspace_whitespace_no_phantom_token(spark):
    """Leading \\n / lone \\t must not create a phantom '' token (trim()
    strips spaces only; the tokenizer filters empty fragments instead)."""
    from geomesa_spark.operators.corpus import chunk_text

    docs = spark.createDataFrame(
        [(1, "\nhello world"), (2, "\t"), (3, "  a\tb\nc  ")],
        "doc_id long, text string")
    rows = {(r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
            for r in chunk_text(docs, "doc_id", "text",
                                chunk_tokens=8, overlap=2).collect()}
    assert rows == {(1, 0): (2, "hello world"), (3, 0): (3, "a b c")}


def test_quality_classifier_ignores_leading_whitespace(spark):
    from geomesa_spark.operators.corpus import quality_classifier

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "\nalpha beta"), (3, "\t")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in quality_classifier(docs, "doc_id", "text").collect()}
    assert got[1] == got[2]          # phantom '' token would skew doc 2
    assert got[3] is None            # whitespace-only -> no tokens


def test_semantic_dedup_excludes_zero_vectors(spark):
    import numpy as np

    from geomesa_spark.operators.ann import semantic_dedup

    rng = np.random.RandomState(3)
    rows = [(int(i), [float(x) for x in rng.standard_normal(8)])
            for i in range(30)]
    rows.append((30, [0.0] * 8))     # direction-free: excluded, not NaN
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in
           semantic_dedup(df, tau=0.95, n_clusters=2).collect()}
    assert 30 not in got
    assert got == set(range(30))     # random 8-dim vectors: no 0.95 pairs


def test_extract_html_round_trip_nasty_text(spark):
    from geomesa_spark.operators.corpus import extract_html_text, wrap_html

    texts = [
        "plain words only",
        "a & b < c > d",                      # escape/decode round trip
        "double &amp; stays literal",          # &amp;->& exactly once
        "tabs\tand\nnewlines   collapse",      # ws-normalized on extract
        "quote \" and ' apostrophe",
        "sneaky <script>alert(1)</script> payload",  # escaped, survives
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    out = df.select("doc_id",
                    extract_html_text(wrap_html(F.col("text"),
                                                F.col("doc_id"))).alias("got"))
    got = {r["doc_id"]: r["got"] for r in out.collect()}
    import re
    for i, t in enumerate(texts):
        expect = re.sub(r"[ \t\n\r]+", " ", t).strip()
        assert got[i] == expect, (t, got[i])


def test_extract_html_strips_boilerplate_blocks(spark):
    from geomesa_spark.operators.corpus import extract_html_text

    html = ('<html><head><title>T</title></head><body>'
            '<NAV class="x">menu</NAV><p>keep &lt;this&gt;</p>'
            '<!-- secret --><aside>ad</aside>'
            '<footer>foot</footer></body></html>')
    df = spark.createDataFrame([(html,)], "html string")
    got = df.select(extract_html_text(F.col("html")).alias("t")).first()["t"]
    assert got == "keep <this>"


def test_pages_html_extraction_invariant(spark):
    """BASELINE input_hint per-row invariant: extracting the generated
    html byte-identically reproduces the text column (and therefore the
    geoparsed geometry) per url."""
    from geomesa_spark.operators.corpus import extract_html_text
    from geomesa_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 500, place_mentions=True)
    bad = pages.filter(
        extract_html_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_extract_links_and_url_host(spark):
    from geomesa_spark.operators.corpus import extract_links, url_host

    rows = [
        ("u1", '<a href="/rel">x</a><a href="https://A.example/p?q=1">y</a>'
               '<nav><a href="http://www.B.example">z</a></nav>'),
        ("u2", "no links here"),
        ("u3", '<a href="ftp://C.example/f">not-http</a>'
               '<a href="https://D.example#frag">d</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    links = extract_links(df)
    got = [(r.url, r.href) for r in links.orderBy("url", "href").collect()]
    assert got == [("u1", "http://www.B.example"),
                   ("u1", "https://A.example/p?q=1"),
                   ("u3", "https://D.example#frag")]
    hosts = {(r.url, r.h) for r in links.select(
        "url", url_host(F.col("href")).alias("h")).collect()}
    assert hosts == {("u1", "a.example"), ("u1", "b.example"),
                     ("u3", "d.example")}


def test_extract_links_quote_forms(spark):
    """Single-quoted and unquoted href attributes are extracted too;
    the URL stops at the first quote / whitespace / '>'."""
    from geomesa_spark.operators.corpus import extract_links

    rows = [
        ("s1", "<a href='https://SQ.example/p'>sq</a>"
               '<a href=https://UQ.example/q class="x">uq</a>'
               "<a href=https://BARE.example/r>bare</a>"),
        ("s2", '<a HREF="https://CAP.example/">caps</a>'
               "<a href='/rel'>rel-sq</a><a href=/rel2>rel-uq</a>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = [(r.url, r.href)
           for r in extract_links(df).orderBy("url", "href").collect()]
    assert got == [("s1", "https://BARE.example/r"),
                   ("s1", "https://SQ.example/p"),
                   ("s1", "https://UQ.example/q"),
                   ("s2", "https://CAP.example/")]


def test_pages_outlinks_deterministic(spark):
    """Generated outlinks are a pure function of the page id (splitmix
    salts 30-32) and live in the nav, so the text invariant holds."""
    from geomesa_spark.operators.corpus import extract_links
    from geomesa_spark.sources.pages import _mix, generate_pages

    import numpy as np

    pages = generate_pages(spark, 40)
    got = {}
    for r in extract_links(pages).collect():
        got.setdefault(r.url, []).append(r.href)
    ids = np.arange(40, dtype=np.int64)
    for i in ids:
        url = f"https://site{i % 997}.example/{i}"
        # NB: % must stay in uint64 (a Python-int modulus promotes the
        # uint64 to float64 and garbles the low bits)
        want = sorted(
            f"https://site{int(_mix(np.array([i]), s)[0] % np.uint64(997))}"
            ".example/r" for s in (30, 31, 32))
        assert sorted(got[url]) == want, i


def test_extract_anchors_known_answer(spark):
    """Anchor text pairs with the right href across quote forms;
    relative / non-http links skipped; empty anchors kept as ''."""
    from geomesa_spark.operators.corpus import extract_anchors

    rows = [
        ("u1", '<a href="/rel">skip</a>'
               '<a class="x" href="https://A.example/p">Click Here</a>'
               "<a href='https://B.example'>b&amp;w</a>"
               '<a href=https://C.example/u>unq</a>'),
        ("u2", '<a href="https://D.example"></a> plain text'),
        ("u3", "no links"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = [(r.url, r.href, r.anchor)
           for r in extract_anchors(df).orderBy("url", "href").collect()]
    assert got == [("u1", "https://A.example/p", "Click Here"),
                   ("u1", "https://B.example", "b&amp;w"),
                   ("u1", "https://C.example/u", "unq"),
                   ("u2", "https://D.example", "")]


def test_extract_anchors_pages_corpus(spark):
    """On the generated corpus every absolute outlink j carries anchor
    r<j>, so (href, anchor) pairing is exact per row."""
    from geomesa_spark.operators.corpus import extract_anchors
    from geomesa_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 30)
    per_url = {}
    for r in extract_anchors(pages).collect():
        per_url.setdefault(r.url, []).append((r.anchor, r.href))
    assert len(per_url) == 30
    for url, pairs in per_url.items():
        assert sorted(a for a, _ in pairs) == ["r1", "r2", "r3"]
        for a, h in pairs:
            assert h.startswith("https://site") and h.endswith(".example/r")


def test_random_projection_jl_and_determinism(spark):
    """Sign-JL projection: deterministic across calls, pairwise distances
    preserved within loose JL distortion at K=32, and the accumulation
    matches a manual ordered-fold numpy replay bit-for-bit."""
    import numpy as np

    from geomesa_spark.operators.ann import mix64, random_projection

    rng = np.random.RandomState(9)
    vecs = rng.standard_normal((40, 64)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: np.array(r.proj)
           for r in random_projection(df, 32).collect()}
    out2 = {r.vec_id: np.array(r.proj)
            for r in random_projection(df, 32).collect()}
    # bit-identical across runs
    for i in range(40):
        assert (out[i] == out2[i]).all()
    # manual replay: same sign matrix, same d-ascending fold
    K, D = 32, 64
    signs = np.where((mix64(np.arange(K * D, dtype=np.int64)) & np.uint64(1))
                     == 0, 1.0, -1.0).reshape(K, D)
    mat = vecs.astype(np.float64)
    acc = np.zeros((40, K))
    for d in range(D):
        acc = acc + mat[:, d:d + 1] * signs[None, :, d]
    acc *= 1.0 / np.sqrt(float(K))
    for i in range(40):
        assert (out[i] == acc[i]).all()
    # JL distance preservation (loose): median pair ratio near 1
    ratios = []
    for a in range(0, 40, 5):
        for b in range(a + 1, 40, 7):
            d0 = np.linalg.norm(mat[a] - mat[b])
            d1 = np.linalg.norm(out[a] - out[b])
            ratios.append(d1 / d0)
    med = float(np.median(ratios))
    assert 0.7 < med < 1.3, med


def test_random_projection_validates(spark):
    import pytest as _pt

    from geomesa_spark.operators.ann import random_projection

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with _pt.raises(ValueError):
        random_projection(df, 0)


def test_bigram_logprob_known_answer(spark):
    import math

    from geomesa_spark.operators.corpus import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"),     # bigrams: (a,b) x2, (b,a) x1
         (2, "a b"),         # bigram (a,b)
         (3, "solo")],       # < 2 words: absent
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           bigram_logprob(docs, "doc_id", "text").collect()}
    assert set(got) == {1, 2}
    # corpus bigrams: (a,b) c=3, (b,a) c=1; prefixes: a. c=3, b. c=1
    lp_ab = math.log(3 / 3)
    lp_ba = math.log(1 / 1)
    assert got[1].n_bigrams == 3
    assert abs(got[1].logprob_mean32 - (2 * lp_ab + lp_ba) / 3) < 1e-6
    assert got[2].n_bigrams == 1
    assert abs(got[2].logprob_mean32 - lp_ab) < 1e-6


def test_bigram_logprob_orders_fluency(spark):
    """A doc of repeated predictable bigrams outscores one of unique
    transitions even with identical word histograms."""
    from geomesa_spark.operators.corpus import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "x y x y x y x y"),
         (2, "y y x x y x y x")],
        "doc_id long, text string")
    got = {r.doc_id: r.logprob_mean32 for r in
           bigram_logprob(docs, "doc_id", "text").collect()}
    assert got[1] > got[2]


def test_collocations_known_answer(spark):
    from geomesa_spark.operators.corpus import collocations

    docs = spark.createDataFrame(
        [(1, "new york new york is big"),
         (2, "new york and the big apple"),
         (3, "big apple pie is the pie")],
        "doc_id long, text string")
    out = {(r.w1, r.w2): (r.n_pair, r.ratio32, r.rank)
           for r in collocations(docs, "doc_id", "text",
                                 k=3, min_count=2).collect()}
    # N=18 words; pairs >=2: (new,york) c=3 c1=3 c2=3 -> 18*3/9=6.0
    #                        (big,apple) c=2 c1=3 c2=2 -> 18*2/6=6.0
    # tie on ratio -> (big,apple) < (new,york) lexicographically
    assert set(out) == {("new", "york"), ("big", "apple")}
    assert out[("big", "apple")][2] == 1 and out[("new", "york")][2] == 2
    assert abs(out[("new", "york")][1] - 18 * 3 / 9) < 1e-5
    assert out[("new", "york")][0] == 3


def test_collocations_topk_plan(spark):
    """The global top-k must plan as TakeOrderedAndProject (per-partition
    bounded heaps + driver merge), never a single-partition row_number
    window over every bigram."""
    from geomesa_spark.operators.corpus import collocations

    docs = spark.createDataFrame(
        [(1, "a b a b c d"), (2, "c d c d a b")], "doc_id long, text string")
    plan = collocations(docs, "doc_id", "text", k=5,
                        min_count=1)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_duplicated_spans_known_answer(spark):
    """Cross-doc shared run + same-doc repetition both produce merged
    maximal spans; unique text produces none."""
    import pytest

    from geomesa_spark.operators.corpus import duplicated_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"),          # shares 'a b c d e f' with doc 2
         (2, "x a b c d e f y"),
         (3, "p q r s t u p q r s t u"),  # same-doc repeat (ExactSubstr rule)
         (4, "totally unique words only here")],
        "doc_id long, text string")
    out = {(r.doc_id, r.span_start, r.span_len)
           for r in duplicated_spans(docs, "doc_id", "text", w=5).collect()}
    assert out == {(1, 0, 6),    # windows at starts {0,1} -> [0, 6)
                   (2, 1, 6),    # windows at starts {1,2} -> [1, 7)
                   (3, 0, 12)}   # starts {0,1,6,7} merge (gap 5 <= w)
    with pytest.raises(ValueError):
        duplicated_spans(docs, "doc_id", "text", w=0)


def test_cut_spans_removes_marked_words(spark):
    from geomesa_spark.operators.corpus import cut_spans, duplicated_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"),
         (2, "x a b c d e f y"),
         (3, "no duplicated material here at all")],
        "doc_id long, text string")
    spans = duplicated_spans(docs, "doc_id", "text", w=5)
    got = {r.doc_id: (r.text, r.n_words, r.n_cut)
           for r in cut_spans(docs, spans, "doc_id", "text").collect()}
    assert got[1] == ("g h", 8, 6)       # span [0,6) cut
    assert got[2] == ("x y", 8, 6)       # span [1,7) cut
    assert got[3] == ("no duplicated material here at all", 6, 0)


def test_domain_suffixes(spark):
    from geomesa_spark.operators.corpus import domain_suffixes

    df = spark.createDataFrame([("a.b.example",), ("example",)], "h string")
    got = {tuple(r.s) for r in
           df.select(domain_suffixes(F.col("h")).alias("s")).collect()}
    assert got == {("a.b.example", "b.example", "example"), ("example",)}


def test_filter_blocklist_suffix_semantics(spark):
    """Listing a registrable domain blocks every subdomain; exact hosts
    block only themselves; audit mode inverts; deep hosts raise."""
    from geomesa_spark.operators.corpus import filter_blocklist

    rows = [(1, "https://ads.example/x"),
            (2, "https://sub.ads.example/y"),      # blocked via suffix
            (3, "https://www.clean.example/z"),    # www-stripped, clean
            (4, "http://h7.cdn.example/q"),        # exact-host entry
            (5, "https://other.cdn.example/r")]    # sibling not blocked
    df = spark.createDataFrame(rows, "id long, url string")
    bl = spark.createDataFrame(
        [("ads.example",), ("h7.cdn.example",)], "domain string")
    kept = sorted(r.id for r in filter_blocklist(df, bl).collect())
    assert kept == [3, 5]
    blocked = sorted(r.id for r in
                     filter_blocklist(df, bl, keep_blocked=True).collect())
    assert blocked == [1, 2, 4]
    assert filter_blocklist(df, bl).columns == ["id", "url"]

    deep = spark.createDataFrame(
        [(9, "https://a.b.c.d.e.f.g.example/")], "id long, url string")
    with pytest.raises(Exception, match="max_depth"):
        filter_blocklist(deep, bl).collect()
    # raising max_depth clears it
    assert filter_blocklist(deep, bl, max_depth=8).count() == 1
    carrying = df.withColumn("__bl_n__", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        filter_blocklist(carrying, bl)


def test_filter_blocklist_plan_is_broadcast_only(spark):
    """No shuffle on the corpus side: every join in the plan is a
    BroadcastHashJoin (the 100 TB contract)."""
    from geomesa_spark.operators.corpus import filter_blocklist

    df = spark.range(100).select(
        F.format_string("https://h%d.site%d.example/p", F.col("id") % 10,
                        F.col("id") % 7).alias("url"))
    bl = spark.createDataFrame([("site3.example",)], "domain string")
    plan = filter_blocklist(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # the only exchange allowed is the blocklist's own distinct(); the
    # range-sourced corpus branch must stay exchange-free
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "__bl_d__" in line, line


def test_bpe_train_known_merges(spark):
    """Hand-computed merge table on 'aaab aaab ab': round-1 'a a' (cnt
    4), round-2 'a b' (cnt 3, lexicographic tie-break over 'b </w>'),
    round-3 'ab </w>'."""
    from geomesa_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame([(1, "aaab aaab ab")], "id long, text string")
    got = bpe_train(docs, "id", "text", num_merges=3)
    assert got == [(1, "a", "a", "aa", 4),
                   (2, "a", "b", "ab", 3),
                   (3, "ab", "</w>", "ab</w>", 3)]
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(docs, "id", "text", 0)


def test_bpe_train_run_handling_and_word_cap(spark):
    """A run of 4 identical symbols merges canonically with the default
    3 passes (['aa','aa']) but a single pass leaves the middle pair
    unmerged (replace consumed the shared separator); max_word_len
    drops oversized words before counting."""
    from geomesa_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame([(1, "aaaa xy " + "z" * 100)],
                                 "id long, text string")
    m3, tbl3 = bpe_train(docs, "id", "text", num_merges=1,
                         return_table=True)
    assert m3 == [(1, "a", "a", "aa", 3)]
    syms3 = {r.sym for r in tbl3.collect()}
    assert " aa aa </w> " in syms3            # canonical greedy
    _, tbl1 = bpe_train(docs, "id", "text", num_merges=1, merge_passes=1,
                        return_table=True)
    syms1 = {r.sym for r in tbl1.collect()}
    assert " aa a a </w> " in syms1           # one pass: middle pair left
    # the 100-char word never enters the table (max_word_len=64)
    assert all("z" not in s for s in syms3)


def test_bpe_encode_applies_merges_in_order(spark):
    """Encoding replays training: on the training corpus itself the
    tokenization equals the final training table's symbols; merges
    never cross the </w> word boundary; empty text -> 0 tokens."""
    from geomesa_spark.operators.corpus import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "ba ab"), (3, "")],
        "id long, text string")
    merges = bpe_train(docs, "id", "text", num_merges=3)
    out = {r.id: r for r in
           bpe_encode(docs, "id", "text", merges,
                      return_symbols=True).collect()}
    # merges: a+a->aa, a+b->ab, ab+</w> -> ab</w>
    # 'aaab' -> aa ab</w> ; 'ab' -> ab</w> ; 'ba' -> b a </w>
    assert out[1].sym == " aa ab</w> aa ab</w> ab</w> "
    assert (out[1].n_words, out[1].n_bpe_tokens) == (3, 5)
    assert out[2].sym == " b a </w> ab</w> "
    assert (out[2].n_words, out[2].n_bpe_tokens) == (2, 4)
    assert (out[3].n_words, out[3].n_bpe_tokens) == (0, 0)


def test_normalize_unicode_forms(spark):
    from geomesa_spark.operators.corpus import normalize_unicode

    nfd = "cafe\u0301"      # e + combining acute (5 code points)
    nfc = "caf\u00e9"       # precomposed e-acute (4 code points)
    assert nfd != nfc
    df = spark.createDataFrame([(1, nfd), (2, nfc), (3, None)],
                               "id long, t string")
    got = {r.id: r.n for r in df.select(
        "id", normalize_unicode(F.col("t")).alias("n")).collect()}
    assert got[1] == nfc and got[2] == nfc and got[3] is None
    dec = {r.id: r.n for r in df.select(
        "id", normalize_unicode(F.col("t"), "NFD").alias("n")).collect()}
    assert dec[2] == nfd                      # NFC input decomposes
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(F.col("t"), "XYZ")


def test_bpe_argmax_plan_is_take_ordered(spark):
    """The per-round argmax must plan as TakeOrderedAndProject
    (per-partition top-1 + driver merge), never a global sort or an
    unpartitioned window — the collocations lesson from round 2."""
    docs = spark.createDataFrame([(1, "aa ab ba")], "id long, text string")
    word = F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    words = docs.select(word).groupBy("word").agg(F.count("*").alias("freq"))
    top = words.orderBy(F.desc("freq"), F.asc("word")).limit(1)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bloom_membership(spark):
    """No false negatives; dense size bounded by m_bits; probe plan is
    map-only (no Exchange — the 100 TB frontier-probe contract)."""
    from geomesa_spark.operators.corpus import (bloom_dense, bloom_probe,
                                                bloom_words)

    m, k = 1 << 10, 3
    seen = spark.range(500).select(
        F.format_string("https://seen%d.example/", "id").alias("u"))
    dense = bloom_dense(bloom_words(seen, "u", m_bits=m, k=k), m)
    assert len(dense) == m // 64
    probed = bloom_probe(seen, "u", dense, k=k)
    assert probed.filter(~F.col("bloom_hit")).count() == 0  # no false negs
    fresh = spark.range(2000).select(
        F.format_string("https://fresh%d.example/", "id").alias("u"))
    fp = bloom_probe(fresh, "u", dense, k=k) \
        .filter(F.col("bloom_hit")).count()
    # fp rate at n=500, m=1024, k=3 is ~0.19; deterministic given sha256
    assert fp < 2000 * 0.5
    plan = bloom_probe(fresh, "u", dense, k=k) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_bloom_guards(spark):
    from geomesa_spark.operators.corpus import bloom_words

    df = spark.range(3).select(F.col("id").cast("string").alias("u"))
    with pytest.raises(ValueError, match="m_bits"):
        bloom_words(df, "u", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        bloom_words(df, "u", k=0)


def test_bloom_probe_broadcast_join_mode(spark):
    """DataFrame-words mode (the large-m scale path): same answers as
    the literal path, k BroadcastHashJoins, zero shuffle joins, and the
    reserved-name guard."""
    from geomesa_spark.operators.corpus import (bloom_dense, bloom_probe,
                                                bloom_words)

    m, k = 1 << 10, 3
    seen = spark.range(300).select(
        F.format_string("https://seen%d.example/", "id").alias("u"))
    wdf = bloom_words(seen, "u", m_bits=m, k=k)
    dense = bloom_dense(wdf, m)
    cand = spark.range(800).select(
        F.format_string("https://c%d.example/", "id").alias("u"))
    lit_hits = sorted(r["u"] for r in bloom_probe(cand, "u", dense, k=k)
                      .filter("bloom_hit").collect())
    df_hits = sorted(r["u"] for r in
                     bloom_probe(cand, "u", wdf, k=k, m_bits=m)
                     .filter("bloom_hit").collect())
    assert lit_hits == df_hits
    assert bloom_probe(seen, "u", wdf, k=k, m_bits=m) \
        .filter(~F.col("bloom_hit")).count() == 0
    plan = bloom_probe(cand, "u", wdf, k=k, m_bits=m) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == k
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    with pytest.raises(ValueError, match="m_bits"):
        bloom_probe(cand, "u", wdf, k=k)
    with pytest.raises(ValueError, match="reserved"):
        bloom_probe(cand.withColumn("__blmw0__", F.lit(1)), "u", wdf,
                    k=k, m_bits=m)


def test_extract_main_content(spark):
    """Block classification: good paragraph kept; link farm dropped by
    link density (even though long enough); short block dropped by
    min_chars; nav/footer dropped wholesale; plan stays map-only."""
    from geomesa_spark.operators.corpus import extract_main_content

    body = ("<html><head><title>t</title></head><body>"
            "<nav><a href='/'>HomeHomeHomeHomeHomeHomeHome</a></nav>"
            "<p>This is the actual article text, long enough to keep "
            "and with <a href='/x'>one link</a> inside.</p>"
            "<div><a href='/a'>aaaaaaaaaa</a> <a href='/b'>bbbbbbbbbb</a> "
            "<a href='/c'>cccccccccc</a></div>"
            "<p>ok</p>"
            "<footer>copyright notice</footer></body></html>")
    df = spark.createDataFrame([(1, body)], "id long, html string")
    [row] = df.select(extract_main_content(F.col("html")).alias("m")) \
              .collect()
    assert row["m"] == ("This is the actual article text, long enough "
                        "to keep and with one link inside.")
    # all-boilerplate page -> empty string, not null
    junk = "<html><body><nav><a href='/'>x</a></nav><p>hi</p></body></html>"
    [r2] = spark.createDataFrame([(1, junk)], "id long, html string") \
        .select(extract_main_content(F.col("html")).alias("m")).collect()
    assert r2["m"] == ""
    plan = df.select(extract_main_content(F.col("html")))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_robots_rules_and_filter(spark):
    """REP semantics: group = ua-run + following rules; * section only;
    longest prefix wins; allow wins length ties; empty Disallow = no
    rule; unknown hosts allowed. Corpus side stays broadcast-only."""
    from geomesa_spark.operators.corpus import robots_filter, robots_rules

    robots_a = "\n".join([
        "# comment line",
        "User-agent: googlebot",
        "Disallow: /private",           # non-star section: ignored
        "",
        "User-agent: *",
        "User-agent: otherbot",         # ua-run accumulates
        "Disallow: /docs",
        "Allow: /docs/public",          # longer -> wins under /docs/public
        "Disallow: /tmp",
        "Allow: /tmp",                  # tie -> allow wins
        "Disallow:",                    # empty = allow-all, no rule
    ])
    robots_b = "User-agent: *\nDisallow: /"
    rdf = spark.createDataFrame(
        [("a.example", robots_a), ("b.example", robots_b)],
        "host string, robots string")
    rules = robots_rules(rdf)
    got = sorted((r["host"], r["prefix"], r["allow"])
                 for r in rules.collect())
    assert got == sorted([
        ("a.example", "/docs", False),
        ("a.example", "/docs/public", True),
        ("a.example", "/tmp", False),
        ("a.example", "/tmp", True),
        ("b.example", "/", False),
    ])
    urls = spark.createDataFrame([
        ("https://a.example/docs/page",),        # /docs -> blocked
        ("https://a.example/docs/public/x",),    # longest allow -> ok
        ("https://a.example/tmp/y",),            # tie -> allow
        ("https://a.example/",),                 # no match -> allow
        ("https://a.example/private",),          # googlebot rule ignored
        ("https://b.example/anything",),         # / disallow -> blocked
        ("https://c.example/no-robots",),        # unknown host -> allow
    ], "url string")
    out = {r["url"]: r["allowed"]
           for r in robots_filter(urls, rules).collect()}
    assert out == {
        "https://a.example/docs/page": False,
        "https://a.example/docs/public/x": True,
        "https://a.example/tmp/y": True,
        "https://a.example/": True,
        "https://a.example/private": True,
        "https://b.example/anything": False,
        "https://c.example/no-robots": True,
    }
    # plan check over a MATERIALIZED rule table (real usage: rules are
    # computed once and persisted) — the corpus side must be a single
    # broadcast join, no shuffle
    rules_mat = spark.createDataFrame(
        rules.collect(), "host string, allow boolean, prefix string, "
                         "plen int")
    plan = robots_filter(urls, rules_mat)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_fetch_schedule(spark):
    """Per-host politeness slots: deterministic url order, per-host
    delays from the table, default elsewhere, idempotent re-plan."""
    from geomesa_spark.operators.corpus import fetch_schedule

    urls = spark.createDataFrame(
        [(f"https://h{i % 3}.example/p{i:02d}",) for i in range(9)],
        "url string")
    delays = spark.createDataFrame([("h0.example", 5)],
                                   "host string, delay_s int")
    out = {r["url"]: (r["slot"], r["fetch_at_s"])
           for r in fetch_schedule(urls, delays, t0_s=100).collect()}
    # h0: p00,p03,p06 at 5s spacing; h1 (default 1s): p01,p04,p07
    assert out["https://h0.example/p00"] == (0, 100)
    assert out["https://h0.example/p03"] == (1, 105)
    assert out["https://h0.example/p06"] == (2, 110)
    assert out["https://h1.example/p01"] == (0, 100)
    assert out["https://h1.example/p04"] == (1, 101)
    out2 = {r["url"]: (r["slot"], r["fetch_at_s"])
            for r in fetch_schedule(urls, delays, t0_s=100).collect()}
    assert out == out2  # idempotent re-plan


def test_parse_sitemap(spark):
    """sitemap.org urlset parse: loc required, lastmod date and
    datetime forms, priority to exact ppm, missing children null."""
    from datetime import datetime

    from geomesa_spark.operators.corpus import parse_sitemap

    xml = ("<?xml version='1.0'?>"
           "<urlset xmlns='http://www.sitemaps.org/schemas/sitemap/0.9'>"
           "<url><loc>https://a.example/1</loc>"
           "<lastmod>2024-03-05</lastmod>"
           "<changefreq>Daily</changefreq>"
           "<priority>0.8</priority></url>"
           "<url><loc> https://a.example/2 </loc>"
           "<lastmod>2024-03-05T10:20:30+02:00</lastmod></url>"
           "<url><priority>0.5</priority></url>"   # no loc -> dropped
           "</urlset>")
    df = spark.createDataFrame([(7, xml)], "site long, sitemap string")
    rows = {r["loc"]: r for r in
            parse_sitemap(df, key_cols=["site"]).collect()}
    assert set(rows) == {"https://a.example/1", "https://a.example/2"}
    r1 = rows["https://a.example/1"]
    assert r1["site"] == 7
    assert r1["lastmod_ts"] == datetime(2024, 3, 5)
    assert r1["changefreq"] == "daily" and r1["priority_ppm"] == 800000
    r2 = rows["https://a.example/2"]
    assert r2["lastmod_ts"] == datetime(2024, 3, 5, 8, 20, 30)  # UTC
    assert r2["changefreq"] is None and r2["priority_ppm"] is None


def test_sitemap_junk_and_w3c_forms(spark):
    """Malformed priority values null out instead of killing the job
    (ANSI-mode try_cast); minute-precision and fractional-second W3C
    lastmod forms parse."""
    from datetime import datetime

    from geomesa_spark.operators.corpus import parse_sitemap

    xml = ("<urlset>"
           "<url><loc>https://a/1</loc><priority>high</priority></url>"
           "<url><loc>https://a/2</loc><priority>100.5</priority></url>"
           "<url><loc>https://a/3</loc>"
           "<lastmod>2024-03-05T10:20+02:00</lastmod></url>"
           "<url><loc>https://a/4</loc>"
           "<lastmod>2004-12-23T18:00:15.31+00:00</lastmod></url>"
           "</urlset>")
    df = spark.createDataFrame([(xml,)], "sitemap string")
    rows = {r["loc"]: r for r in parse_sitemap(df).collect()}
    assert rows["https://a/1"]["priority_ppm"] is None
    assert rows["https://a/2"]["priority_ppm"] is None
    assert rows["https://a/3"]["lastmod_ts"] == datetime(2024, 3, 5, 8, 20)
    assert rows["https://a/4"]["lastmod_ts"] == \
        datetime(2004, 12, 23, 18, 0, 15)


def test_robots_filter_uppercase_scheme(spark):
    from geomesa_spark.operators.corpus import robots_filter

    rules = spark.createDataFrame(
        [("a.example", False, "/docs", 5)],
        "host string, allow boolean, prefix string, plen int")
    urls = spark.createDataFrame([("HTTPS://a.example/docs/page",)],
                                 "url string")
    [r] = robots_filter(urls, rules).collect()
    assert r["allowed"] is False


def test_fetch_schedule_reserved_guard(spark):
    from geomesa_spark.operators.corpus import fetch_schedule

    urls = spark.createDataFrame([("https://a/x", 3)],
                                 "url string, delay_s int")
    with pytest.raises(ValueError, match="reserved"):
        fetch_schedule(urls)


def test_write_wet_null_rows_skipped(spark, tmp_path):
    from datetime import datetime, timezone

    from geomesa_spark.sources.warc import read_warc, write_wet

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("https://a/1", ts, "good"),
         ("https://a/2", ts, None),
         ("https://a/3", None, "no ts"),
         (None, ts, "no url")],
        "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet_nulls")
    manifest = write_wet(df.coalesce(1), out)
    assert sum(n for _, n in manifest) == 1
    rows = read_warc(spark, out, record_types=("conversion",)).collect()
    assert len(rows) == 1 and bytes(rows[0]["payload"]) == b"good"


def test_exact_k_sample(spark):
    """Hard quotas: exactly min(k, |stratum|) rows, retry-stable, and
    growing a stratum only evicts (never reshuffles) the survivors."""
    from geomesa_spark.operators.corpus import exact_k_sample

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common")
         .alias("lang"))
    out = exact_k_sample(docs, "doc_id", "lang", k=5)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"rare": 5, "common": 5}
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in
                  exact_k_sample(docs, "doc_id", "lang", k=5).collect())
    assert ids1 == ids2                      # retry-stable
    tiny = exact_k_sample(docs.filter("doc_id < 3"), "doc_id", "lang", 5)
    assert tiny.count() == 3                 # min(k, |stratum|)
    # monotone under growth: survivors of the bigger corpus that existed
    # in the smaller corpus are survivors there too
    small = {r["doc_id"] for r in
             exact_k_sample(docs.filter("doc_id < 50"), "doc_id",
                            "lang", 5).collect()}
    big = {r["doc_id"] for r in out.collect()}
    assert (big & {i for i in range(50)}) <= small
    with pytest.raises(ValueError, match="k must"):
        exact_k_sample(docs, "doc_id", "lang", 0)


def test_score_buckets(spark):
    """Equal-population terciles per stratum, head = best scores,
    deterministic ties, reserved guard."""
    from geomesa_spark.operators.corpus import score_buckets

    docs = spark.createDataFrame(
        [(i, 100 - i, "en") for i in range(9)]
        + [(100 + i, i, "zh") for i in range(4)],
        "doc_id long, score long, lang string")
    out = {r["doc_id"]: r["bucket"] for r in
           score_buckets(docs, "doc_id", "score", "lang").collect()}
    # en: scores desc == doc_id asc; 9 rows -> buckets of 3
    assert [out[i] for i in range(9)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    # zh: 4 rows -> sizes (rank-1)*3//4 = 0,0,1,2 ; best score = id 103
    assert out[103] == 0 and out[100] == 2
    with pytest.raises(ValueError, match="reserved"):
        score_buckets(docs.withColumn("bucket", F.lit(1)),
                      "doc_id", "score", "lang")


def _dsir_ref(raw_texts, tgt_texts, n_buckets, alpha=1):
    """Pure-Python replica of dsir_weights for known-answer checks."""
    import math

    p = (1 << 31) - 1

    def feats(text):
        ws = [w for w in text.strip().split()]
        grams = [w for w in ws if w] + \
            [ws[i] + "\x1f" + ws[i + 1] for i in range(len(ws) - 1)]
        out = []
        for g in grams:
            h = 0
            for ch in g:
                h = (h * 257 + ord(ch)) % p
            out.append(h % n_buckets)
        return out

    rf = {i: feats(t) for i, t in raw_texts.items()}
    cr, ct = {}, {}
    for bs in rf.values():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
    for t in tgt_texts:
        for b in feats(t):
            ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    exp = {}
    for i, bs in rf.items():
        if not bs:
            continue
        per = {}
        for b in bs:
            per[b] = per.get(b, 0) + 1
        s = 0.0
        for b in sorted(per):
            pt = (ct.get(b, 0) + alpha) / (nt + alpha * n_buckets)
            pr = (cr[b] + alpha) / (nr + alpha * n_buckets)
            s += per[b] * math.log(pt / pr)
        exp[i] = (len(bs), s)
    return exp


def test_dsir_weights_known_answer(spark):
    from geomesa_spark.operators.corpus import dsir_weights

    rows = [(1, "the cat sat", "en"), (2, "le chat noir", "fr"),
            (3, "the dog sat", "en"), (4, "", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in
           dsir_weights(docs, docs.filter("lang = 'en'"),
                        "doc_id", "text", n_buckets=64).collect()}
    exp = _dsir_ref({i: t for i, t, _ in rows},
                    [t for i, t, lg in rows if lg == "en"], 64)
    assert set(got) == set(exp)           # empty doc 4 absent
    for i, (n, w) in exp.items():
        assert got[i].n_feats == n
        assert abs(got[i].dsir_weight32 - w) < 1e-5 * max(1.0, abs(w))
    # target-like docs must outscore the off-target one
    assert min(got[1].dsir_weight32, got[3].dsir_weight32) \
        > got[2].dsir_weight32


def test_dsir_weights_self_target_is_zero(spark):
    """target == raw -> p_t == p_r per bucket -> every lp is exactly 0
    (identical smoothed divisions), so all weights are exactly 0.0."""
    from geomesa_spark.operators.corpus import dsir_weights

    docs = spark.createDataFrame(
        [(i, f"w{i} common text body {i}") for i in range(6)],
        "doc_id long, text string")
    out = dsir_weights(docs, docs, "doc_id", "text", n_buckets=32).collect()
    assert len(out) == 6
    assert all(r.dsir_weight32 == 0.0 for r in out)


def test_dsir_weights_validation(spark):
    from geomesa_spark.operators.corpus import dsir_weights

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(docs, docs, "doc_id", "text", n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_weights(docs, docs, "doc_id", "text", alpha=0)


def test_weighted_sample_matches_reference_keys(spark):
    """Keys replicate the A-ES formula exactly (numpy replay), the k
    smallest are kept, ties deterministic, non-positive weights drop."""
    import math

    import numpy as np

    from geomesa_spark.operators.ann import mix64
    from geomesa_spark.operators.corpus import weighted_sample

    rows = [(i, (i % 5) + 1) for i in range(40)] + [(100, 0), (101, None)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(docs, "doc_id", "w", k=10).collect()
    assert len(got) == 10

    keys = {}
    for i, w in rows:
        if not w:
            continue
        u = (float(mix64(np.array([i], dtype=np.int64))[0]) + 1.0) / 2.0**63
        keys[i] = np.float32(-math.log(u) / float(w))
    expect = sorted(keys, key=lambda i: (keys[i], i))[:10]
    assert [r.doc_id for r in got] == expect
    for r in got:
        assert r.es_key32 == keys[r.doc_id]


def test_weighted_sample_is_weight_proportional(spark):
    """A row with 50x the weight of its peers is (near-)always kept."""
    from geomesa_spark.operators.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, 500 if i == 7 else 10) for i in range(200)],
        "doc_id long, w long")
    got = [r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=20).collect()]
    assert 7 in got


def test_weighted_sample_plan_and_strata(spark):
    from geomesa_spark.operators.corpus import weighted_sample

    docs = spark.createDataFrame(
        [(i, i + 1, "ab"[i % 2]) for i in range(30)],
        "doc_id long, w long, lang string")
    plan = weighted_sample(docs, "doc_id", "w", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    per = weighted_sample(docs, "doc_id", "w", k=4, strata_col="lang").collect()
    from collections import Counter
    assert Counter(r.lang for r in per) == {"a": 4, "b": 4}
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(docs, "doc_id", "w", k=0)
    with pytest.raises(ValueError, match="key column"):
        weighted_sample(docs.withColumn("es_key32", F.lit(1.0)),
                        "doc_id", "w", k=1)


def _pq_ref(vecs, queries, m, n_codes, iters, scale=256.0, seed=42):
    """Pure-Python PQ replica (train + encode + ADC) for equivalence."""
    import math

    import numpy as np

    from geomesa_spark.operators.ann import mix64

    ids = sorted(vecs)
    q = {i: [math.floor(float(x) * scale) for x in vecs[i]] for i in ids}
    dim = len(next(iter(q.values())))
    sd = dim // m
    mixed = sorted(ids, key=lambda i: (int(mix64(
        np.array([i], dtype=np.int64), seed)[0]), i))
    picked = mixed[:n_codes]
    books = [[[float(v) for v in q[i][j * sd:(j + 1) * sd]]
              for i in picked] for j in range(m)]
    K = len(picked)

    def assign(sq, book):
        best, bc = None, None
        for c in range(K):
            acc = 0.0
            for d in range(sd):
                t = sq[d] - book[c][d]
                acc += t * t
            if best is None or acc < best:
                best, bc = acc, c
        return bc, best

    for _ in range(iters):
        sums = {}
        for i in ids:
            for j in range(m):
                c, _d = assign(q[i][j * sd:(j + 1) * sd], books[j])
                n, s = sums.get((j, c), (0, [0] * sd))
                sums[(j, c)] = (n + 1, [s[d] + q[i][j * sd + d]
                                        for d in range(sd)])
        for j in range(m):
            for c in range(K):
                if (j, c) in sums:
                    n, s = sums[(j, c)]
                    books[j][c] = [float(s[d]) / float(n) for d in range(sd)]

    codes = {i: [assign(q[i][j * sd:(j + 1) * sd], books[j])[0]
                 for j in range(m)] for i in ids}
    out = {}
    for qid in queries:
        qq = [math.floor(float(x) * scale) for x in queries[qid]]
        dists = {}
        for i in ids:
            acc = 0.0
            for j in range(m):
                c = codes[i][j]
                v = 0.0
                for d in range(sd):
                    t = qq[j * sd + d] - books[j][c][d]
                    v += t * t
                acc += v
            dists[i] = acc
        out[qid] = sorted(ids, key=lambda i: (dists[i], i))
    return books, codes, out


def test_pq_topk_matches_reference(spark):
    """pq_topk replays the pure-Python PQ pipeline exactly: same
    codebooks after a Lloyd round, same codes, same ADC ranking."""
    import numpy as np

    from geomesa_spark.operators.ann import pq_topk, pq_train

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).astype(np.float32).tolist() for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>")
    qids = [0, 5]
    qdf = spark.createDataFrame(
        [(i, vecs[i]) for i in qids], "qid long, qvec array<float>")
    books = pq_train(df, m=2, n_codes=4, iters=1)
    ref_books, _codes, ref_order = _pq_ref(vecs, {i: vecs[i] for i in qids},
                                           m=2, n_codes=4, iters=1)
    assert books == ref_books
    got = pq_topk(qdf, df, k=5, books=books)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.qid, []).append((r.rank, r.vec_id))
    for qid in qids:
        want = ref_order[qid][:5]
        assert [v for _, v in sorted(by_q[qid])] == want


def test_pq_validation_and_empty(spark):
    from geomesa_spark.operators.ann import pq_topk, pq_train

    df = spark.createDataFrame(
        [(1, [0.1] * 6)], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=4)
    with pytest.raises(ValueError, match="empty"):
        pq_train(df.filter("vec_id < 0"), m=2)
    qdf = spark.createDataFrame([], "qid long, qvec array<float>")
    out = pq_topk(qdf, df, k=3, m=2, n_codes=2, iters=0)
    assert out.count() == 0
    with pytest.raises(ValueError, match="k must be"):
        pq_topk(qdf, df, k=0)


def test_ivfadc_probe_widening_and_validation(spark):
    """More probed lists can only improve (lower) the best ADC distance;
    full probe returns k rows per query; bad args raise."""
    import numpy as np

    from geomesa_spark.operators.ann import ivfadc_topk

    rng = np.random.RandomState(11)
    vecs = [(i, rng.randn(8).astype(np.float32).tolist()) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(vecs[:3], "qid long, qvec array<float>")

    def top1(n_probe):
        out = ivfadc_topk(qdf, df, k=1, n_centroids=4, n_probe=n_probe,
                          m=2, n_codes=4, iters=1)
        return {r.qid: r.adist for r in out.collect()}

    narrow, wide = top1(1), top1(4)
    assert set(wide) == {0, 1, 2}
    for qid in wide:
        assert wide[qid] <= narrow[qid] + 1e-12
    full = ivfadc_topk(qdf, df, k=5, n_centroids=4, n_probe=4,
                       m=2, n_codes=4, iters=1)
    from collections import Counter
    assert Counter(r.qid for r in full.collect()) == {0: 5, 1: 5, 2: 5}
    with pytest.raises(ValueError, match="n_probe"):
        ivfadc_topk(qdf, df, k=1, n_centroids=4, n_probe=5)
    with pytest.raises(ValueError, match="k must be"):
        ivfadc_topk(qdf, df, k=0)
    empty = spark.createDataFrame([], "qid long, qvec array<float>")
    assert ivfadc_topk(empty, df, k=3, n_centroids=4, n_probe=2,
                       m=2, n_codes=4).count() == 0


def _winnow_ref(text, k, w):
    """Pure-Python winnowing replica (Schleimer 2003 rightmost-min)."""
    p31 = (1 << 31) - 1

    def h(g):
        x = 0
        for ch in g:
            x = (x * 257 + ord(ch)) % p31
        return x

    ws = text.strip().split()
    hs = [h("\x1f".join(ws[p:p + k])) for p in range(len(ws) - k + 1)]
    out = set()
    for p in range(max(len(hs) - w + 1, 1)):
        win = hs[p:p + w]
        if not win:
            continue
        mn = min(win)
        rp = len(win) - 1 - win[::-1].index(mn)
        out.add((p + rp + 1, mn))
    return out


def test_winnow_fingerprints_match_reference(spark):
    from geomesa_spark.operators.dedup import winnow_fingerprints

    texts = {1: "a b c d e f g h i j", 2: "a b c x y z a b c d",
             3: "q r", 4: "m n o p"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in texts.items():
        want = _winnow_ref(t, 3, 4)
        assert got.get(i, set()) == want, i


def test_winnow_local_guarantee_and_pairs(spark):
    """Any shared run of w+k-1 words leaves >= 1 shared fingerprint
    VALUE (the winnowing guarantee); winnow_pairs surfaces the pair."""
    from geomesa_spark.operators.dedup import (winnow_fingerprints,
                                               winnow_pairs)

    shared = "the quick brown fox jumps over"   # 6 = w+k-1 words
    docs = spark.createDataFrame(
        [(1, "alpha beta " + shared + " gamma delta"),
         (2, shared + " unrelated tail words here"),
         (3, "completely different text with no overlap at all")],
        "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(docs, "doc_id", "text", k=3, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]
    pairs = winnow_pairs(docs, "doc_id", "text", k=3, w=4,
                         min_shared=1).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    with pytest.raises(ValueError, match="k >= 1"):
        winnow_fingerprints(docs, "doc_id", "text", k=0)


def _ngrams(text, n):
    ws = text.split()
    return {" ".join(ws[i:i + n]) for i in range(max(len(ws) - n + 1, 1))}


def test_containment_pairs_match_brute_force(spark):
    from geomesa_spark.operators.dedup import containment_pairs, release

    texts = {
        1: "a b c d e f g h",
        2: "x y a b c d e f g h z w q r s t u v m n o p",   # 1 inside 2
        3: "a b c d e f g h",                                # dup of 1
        4: "completely different words in this one here now",
        5: "x y z",
    }
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    out = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    got = {(r.id_a, r.id_b): (r.common, r.cont_a, r.cont_b)
           for r in out.collect()}
    release(out)
    want = {}
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            ga, gb = _ngrams(texts[a], 3), _ngrams(texts[b], 3)
            c = len(ga & gb)
            if c and max(c / len(ga), c / len(gb)) >= 0.8:
                want[(a, b)] = (c, c / len(ga), c / len(gb))
    assert got == want
    assert (1, 2) in got and got[(1, 2)][1] == 1.0   # asymmetric catch
    assert (1, 3) in got                              # exact dup


def test_containment_max_df_drops_hot_grams_only(spark):
    from geomesa_spark.operators.dedup import containment_pairs, release

    # the gram "t t t" occurs in all 6 docs; pairs held together only by
    # it vanish under max_df=3, the 1-in-2 containment pair survives
    rows = [(i, "t t t u%d v%d w%d" % (i, i, i)) for i in range(4)]
    rows += [(10, "p q r s a b c"), (11, "t t t p q r s a b c d e f g")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9)
    capped = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9,
                               max_df=3)
    ge = {(r.id_a, r.id_b) for r in exact.collect()}
    gc = {(r.id_a, r.id_b) for r in capped.collect()}
    release(exact); release(capped)
    assert (10, 11) in ge and (10, 11) in gc
    assert gc <= ge   # under-approximation, never invention


def _brute_edit_pairs(strings, d):
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    want = {}
    for a, b in itertools.combinations(sorted(strings), 2):
        dist = lev(strings[a], strings[b])
        if dist <= d:
            want[(a, b)] = dist
    return want


def test_edit_pairs_match_brute_force(spark):
    from geomesa_spark.operators.dedup import edit_pairs, release

    strings = {
        1: "the quick brown fox jumps",
        2: "the quick brown fox jumped",    # dist 2 from 1
        3: "the quick brown fox jumps",     # dup of 1
        4: "a completely different string",
        5: "ab",                            # shorts: pairwise close
        6: "abc",
        7: "abd",
        8: "",                              # empty vs shorts
        9: "zz",
    }
    docs = spark.createDataFrame(list(strings.items()),
                                 "doc_id long, s string")
    out = edit_pairs(docs, "doc_id", "s", max_dist=2, q=3)
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    release(out)
    assert got == _brute_edit_pairs(strings, 2)
    assert got[(1, 3)] == 0 and got[(1, 2)] == 2
    assert (5, 6) in got and (8, 5) in got or (5, 8) in got


def test_edit_pairs_threshold_and_validation(spark):
    from geomesa_spark.operators.dedup import edit_pairs, release
    import pytest as _pt

    strings = {1: "aaaaaaaaaaaa", 2: "aaaaaaaaaaab", 3: "aaaaaaaabbbb"}
    docs = spark.createDataFrame(list(strings.items()),
                                 "doc_id long, s string")
    out = edit_pairs(docs, "doc_id", "s", max_dist=1, q=2)
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    release(out)
    assert got == _brute_edit_pairs(strings, 1)    # (1,2) only
    with _pt.raises(ValueError, match="max_dist"):
        edit_pairs(docs, "doc_id", "s", max_dist=-1)
    with _pt.raises(ValueError, match="q must"):
        edit_pairs(docs, "doc_id", "s", q=1)


def test_host_boilerplate_per_site_threshold(spark):
    from geomesa_spark.operators.corpus import host_boilerplate

    # site-a: footer on 3/3 pages (stripped); "shared prose" on 2/3
    # pages clears min_pages=2 AND ratio 0.5 -> also stripped there.
    # site-b: the SAME footer text on only 1/2 pages -> kept (per-host
    # scoping: site-a's count must not bleed into site-b).
    docs = spark.createDataFrame(
        [("https://a.example/1", "FOOT\nshared prose\nalpha"),
         ("https://a.example/2", "FOOT\nshared prose"),
         ("https://a.example/3", "FOOT\nbeta"),
         ("https://b.example/1", "FOOT\ngamma"),
         ("https://b.example/2", "delta")],
        "url string, text string")
    out = {r["url"]: r for r in
           host_boilerplate(docs, "url", "text",
                            min_ratio=0.5, min_pages=2).collect()}
    assert set(out) == {"https://a.example/1", "https://a.example/3",
                        "https://b.example/1", "https://b.example/2"}
    assert out["https://a.example/1"]["text"] == "alpha"
    assert out["https://a.example/1"]["host"] == "a.example"
    assert (out["https://a.example/1"]["n_lines"],
            out["https://a.example/1"]["n_kept"]) == (3, 1)
    # page 2 of site-a lost every line -> dropped (drop_empty)
    assert out["https://b.example/1"]["text"] == "FOOT\ngamma"


def test_host_boilerplate_min_pages_guards_tiny_hosts(spark):
    from geomesa_spark.operators.corpus import host_boilerplate

    # one-page host: every line is 100% of the host's pages, but
    # min_pages=2 keeps single-page hosts intact
    docs = spark.createDataFrame(
        [("https://solo.example/only", "line one\nline two")],
        "url string, text string")
    out = host_boilerplate(docs, "url", "text").collect()
    assert len(out) == 1 and out[0]["text"] == "line one\nline two"


def test_host_boilerplate_rejects_reserved_columns(spark):
    from geomesa_spark.operators.corpus import host_boilerplate

    docs = spark.createDataFrame(
        [("https://a.example/1", "x", 0)],
        "url string, text string, __host__ int")
    with pytest.raises(ValueError, match="__host__"):
        host_boilerplate(docs, "url", "text")


def test_canonical_dedup_groups_and_keeps_newest(spark):
    from geomesa_spark.operators.corpus import canonical_dedup

    rows = [
        # three captures declaring the same canonical, mixed attribute
        # order and quoting; newest ts wins
        ("https://s.example/a?page=2",
         '<html><link rel="canonical" href="https://s.example/a"></html>', 2),
        ("https://s.example/a?utm=x",
         "<html><link href='https://s.example/a' rel='canonical'></html>", 5),
        ("https://s.example/amp/a",
         '<html><link rel=canonical href=https://s.example/a></html>', 3),
        # relative canonical -> falls back to own url (ungrouped)
        ("https://s.example/b",
         '<html><link rel="canonical" href="/b"></html>', 1),
        # no canonical at all
        ("https://s.example/c", "<html><p>hi</p></html>", 4),
    ]
    df = spark.createDataFrame(rows, "url string, html string, ts long")
    out = {r["canonical"]: r for r in
           canonical_dedup(df, "url", "html", ts_col="ts").collect()}
    assert set(out) == {"https://s.example/a", "https://s.example/b",
                        "https://s.example/c"}
    a = out["https://s.example/a"]
    assert (a["url"], a["ts"], a["n_dupes"]) == (
        "https://s.example/a?utm=x", 5, 3)
    assert out["https://s.example/b"]["n_dupes"] == 1


def test_canonical_dedup_no_ts_max_url(spark):
    from geomesa_spark.operators.corpus import canonical_dedup

    df = spark.createDataFrame(
        [("https://s.example/z1",
          '<link rel="canonical" href="https://s.example/z">'),
         ("https://s.example/z2",
          '<link rel="canonical" href="https://s.example/z">')],
        "url string, html string")
    out = canonical_dedup(df, "url", "html").collect()
    assert len(out) == 1
    assert out[0]["url"] == "https://s.example/z2"
    assert out[0]["n_dupes"] == 2


def test_host_boilerplate_matches_bruteforce(spark):
    """Randomized (seeded) equivalence vs a pure-Python reference:
    pages over few hosts drawing lines from a tiny vocabulary so
    per-host frequencies hit every regime (unique, = min_pages,
    above/below the ratio)."""
    import random

    from geomesa_spark.operators.corpus import host_boilerplate

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    rows = []
    for h in range(3):
        for p in range(rng.randint(1, 7)):
            n = rng.randint(1, 5)
            text = "\n".join(rng.choice(vocab) for _ in range(n))
            rows.append((f"https://h{h}.example/p{p}", f"h{h}.example", text))
    min_ratio, min_pages = 0.4, 2

    # pure-Python reference
    from collections import defaultdict
    host_pages = defaultdict(set)
    line_pages = defaultdict(set)
    for url, host, text in rows:
        host_pages[host].add(url)
        for ln in text.split("\n"):
            line_pages[(host, ln)].add(url)
    expect = {}
    for url, host, text in rows:
        np_ = len(host_pages[host])
        kept = [ln for ln in text.split("\n")
                if len(line_pages[(host, ln)]) < min_pages
                or float(len(line_pages[(host, ln)])) < min_ratio * np_]
        if kept:
            expect[url] = ("\n".join(kept), len(text.split("\n")), len(kept))

    df = spark.createDataFrame([(u, t) for u, _, t in rows],
                               "url string, text string")
    got = {r["url"]: (r["text"], r["n_lines"], r["n_kept"])
           for r in host_boilerplate(df, "url", "text", min_ratio=min_ratio,
                                     min_pages=min_pages).collect()}
    assert got == expect


def test_capture_churn_known_answer(spark):
    """Hand-traced change counts: url A changes digest once across 4
    captures (ppm = 1e6 * 1 // 3), url B is a single capture (ppm 0),
    url C never changes."""
    from geomesa_spark.operators.corpus import capture_churn

    caps = spark.createDataFrame(
        [("A", 1, 5), ("A", 2, 5), ("A", 3, 7), ("A", 4, 7),
         ("B", 10, 1),
         ("C", 1, 9), ("C", 5, 9)],
        "url string, warc_ts long, digest long")
    got = {r.url: (r.n_captures, r.n_changes, r.change_ppm,
                   r.first_ts, r.last_ts)
           for r in capture_churn(caps).collect()}
    assert got == {"A": (4, 1, 333_333, 1, 4),
                   "B": (1, 0, 0, 10, 10),
                   "C": (2, 0, 0, 1, 5)}


def test_crawl_diff_statuses(spark):
    """All four statuses from a hand-built pair of snapshots."""
    from geomesa_spark.operators.corpus import crawl_diff

    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("e", None), ("f", None)],
        "url string, digest long")
    new = spark.createDataFrame(
        [("a", 1), ("b", 9), ("d", 4), ("e", 5), ("f", None)],
        "url string, digest long")
    got = {r.url: (r.status, r.old_digest, r.new_digest)
           for r in crawl_diff(old, new).collect()}
    assert got == {"a": ("unchanged", 1, 1),
                   "b": ("changed", 2, 9),
                   "c": ("removed", 3, None),
                   "d": ("added", None, 4),
                   # NULL digests: presence decides added/removed, the
                   # null-safe compare decides changed/unchanged
                   "e": ("changed", None, 5),
                   "f": ("unchanged", None, None)}


def test_trending_terms_burst_detection(spark):
    """A term concentrated in one bucket outranks a uniform term; the
    lift matches the closed formula; min_count floors hapax spikes."""
    import pytest

    from geomesa_spark.operators.corpus import trending_terms

    rows = []
    # "steady" appears 4x per bucket across buckets 0..3 (lift 1.0)
    for i in range(8):
        rows.append((i % 4, "steady steady filler"))
    # "burst" appears 5 times, all in bucket 2 (lift = 4.0)
    rows.append((2, "burst burst burst burst burst"))
    # "spike" appears twice in bucket 1 — below min_count=3
    rows.append((1, "spike spike"))
    df = spark.createDataFrame(rows, "bucket long, text string")
    got = trending_terms(df, "text", "bucket", k=10, min_count=3).collect()
    by_tok = {(r.token, r.bucket): r for r in got}
    assert ("spike", 1) not in by_tok
    b = by_tok[("burst", 2)]
    assert (b.n_in_bucket, b.n_total, b.rank) == (5, 5, 1)
    assert abs(b.lift32 - 4.0) < 1e-6
    s = by_tok[("steady", 2)]
    assert abs(s.lift32 - 1.0) < 1e-6 and s.n_total == 16
    with pytest.raises(ValueError, match="k >="):
        trending_terms(df, "text", "bucket", k=0)
    with pytest.raises(ValueError, match="min_count"):
        trending_terms(df, "text", "bucket", min_count=0)


def test_embedding_outliers_known_answer(spark):
    """Hand-built vectors: assignment to the max-cosine centroid, the
    below-threshold flag, zero-vector exclusion, and validation. With
    seed=42 the two smallest-mix ids of {0..4} pick the centroids, so
    we pin the pick by construction: only ids 0 and 1 are non-parallel
    axes and n_clusters=2 selects the two smallest mix values among
    the non-zero rows — asserted from the op's own cluster count."""
    import pytest

    from geomesa_spark.operators.ann import embedding_outliers

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),    # near whichever centroid is x-axis
        (3, [0.0, 0.0, 1.0]),    # orthogonal to both axes -> outlier
        (4, [0.0, 0.0, 0.0]),    # zero norm -> excluded
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in
           embedding_outliers(df, threshold=0.5, n_clusters=2).collect()}
    assert set(got) == {0, 1, 2, 3}          # zero vector dropped
    # centroid members sit at sim 1.0 in their own cluster
    cents = {i for i in got if abs(got[i].sim32 - 1.0) < 1e-6}
    assert len(cents) == 2
    # the orthogonal vector is below threshold everywhere
    assert got[3].is_outlier and got[3].sim32 < 0.5
    # 2 is ~0.994-similar to the x-axis centroid: kept
    assert not got[2].is_outlier and got[2].sim32 > 0.9
    with pytest.raises(ValueError, match="n_clusters"):
        embedding_outliers(df, threshold=0.5, n_clusters=0)
    empty = spark.createDataFrame([(9, [0.0, 0.0])],
                                  "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="non-zero"):
        embedding_outliers(empty, threshold=0.5, n_clusters=1)
