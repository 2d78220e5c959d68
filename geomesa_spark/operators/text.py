"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything that CAN be a built-in Spark expression IS one (token/char
stats, quality ratios run inside whole-stage codegen); only the n-gram
language model and the rolling-hash fingerprint use Arrow-batched numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType

from .cache import attach_cached

__all__ = [
    "token_count", "approx_bpe_tokens", "text_stats", "quality_score",
    "repetition_stats", "langid_udf", "fingerprint_udf", "bm25_score",
    "phrase_search", "geo_search", "script_mix", "bm25_score_expr",
    "readability", "hard_negatives",
]


def token_count(col) -> Column:
    """Whitespace token count (built-in, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


# A BPE-ish tokenizer proxy: words + digits + punctuation runs; ~GPT-2 regex
# shape, counts matches without materializing them.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def approx_bpe_tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_RE), 0))


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc stats: chars, tokens, distinct tokens, punct/digit counts,
    mean word length (x100, integer — exact in any engine)."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_tokens = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    mean_wlen_x100 = F.floor((n_chars - n_space) * 100 / n_tokens)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_punct.alias("n_punct"),
        n_digit.alias("n_digit"),
        mean_wlen_x100.cast("long").alias("mean_word_len_x100"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str,
                  min_tokens: int = 20, max_mean_wlen: float = 12.0,
                  max_punct_ratio: float = 0.3) -> DataFrame:
    """Gopher-style quality gates as boolean columns + a 0-100 score.

    All built-in expressions; the score is integer-valued so results are
    engine-exact.
    """
    s = text_stats(df, id_col, text_col)
    len_ok = (F.col("n_tokens") >= min_tokens)
    # round, never truncate, caller thresholds: int(0.25 * 10) == 2 would
    # silently tighten a 0.25 gate to 0.20; ppm resolution keeps any
    # reasonable threshold exact (cross-multiplication stays integer)
    wlen_ok = (F.col("mean_word_len_x100") <= int(round(max_mean_wlen * 100)))
    punct_ok = (F.col("n_punct") * 1_000_000
                <= F.col("n_chars") * int(round(max_punct_ratio * 1_000_000)))
    rep_ok = (F.col("n_distinct_tokens") * 4 >= F.col("n_tokens"))  # <=4x repetition
    score = (len_ok.cast("int") * 25 + wlen_ok.cast("int") * 25
             + punct_ok.cast("int") * 25 + rep_ok.cast("int") * 25)
    return s.select(
        id_col,
        len_ok.alias("len_ok"), wlen_ok.alias("wlen_ok"),
        punct_ok.alias("punct_ok"), rep_ok.alias("rep_ok"),
        score.alias("quality_score"),
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease per document — the classic prose-difficulty
    score used as a curation signal in web-corpus quality pipelines
    (readable prose scores ~60-80; tables/code/keyword-stuffed pages
    score far lower or negative):

        flesch = 206.835 - 1.015 * (words/sentences)
                         - 84.6  * (syllables/words)

    Counting conventions (identical in the Java-regex and RE2/DuckDB
    dialects so oracles replay them verbatim):

    - words: whitespace-split of the trimmed lowercased text (the
      bm25/text_stats tokenization — one shared spelling);
    - sentences: runs of terminal punctuation ``[.!?]+`` in the raw
      text, floored at 1;
    - syllables: vowel-group runs ``[aeiouy]+`` per word, floored at 1
      per word (the standard cheap syllable estimator).

    Scale shape: one map-only pass, every expression a built-in
    higher-order function in whole-stage codegen — no shuffle, no
    Python. The counts are exact integers; the score is a fixed-order
    double chain over integer ratios (IEEE-exact in any engine), cast
    to float32 on output per the repo convention.
    """
    t = F.col(text_col)
    words = F.split(F.trim(F.lower(t)), r"\s+")
    n_words = F.size(words).cast("long")
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0))).cast("long")
    n_syll = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(w, F.lit(r"[aeiouy]+"), 0))))
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (F.col("n_words") / F.col("n_sent"))
              - F.lit(84.6) * (F.col("n_syll") / F.col("n_words")))
    return (df.select(F.col(id_col), n_words.alias("n_words"),
                      n_sent.alias("n_sent"), n_syll.alias("n_syll"))
              .select(id_col, "n_words", "n_sent", "n_syll",
                      flesch.cast("float").alias("flesch32")))


# --- language ID -----------------------------------------------------------

# character-trigram profiles (top discriminative trigrams per language,
# public knowledge: derived from common stopword shapes)
_LANG_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", " in", "ion", " is"],
    "de": ["er ", " de", "der", "ie ", "die", " un", "und", "nd ", "ch ", "sch",
           "ein", " ei", "en ", "ung", " da"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", " et",
           "et ", " pa", "que", " qu", "ais"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ión", " en", "en ",
           "ent", " qu", "que", "ado", " co"],
    "pt": [" de", "de ", " a ", "ão ", "os ", " o ", "ar ", " co", "ent", " qu",
           "que", "da ", " da", "em ", " em"],
}


def langid_udf(default: str = "und"):
    """pandas UDF: text -> predicted language code by trigram-profile vote.

    Deterministic: score = number of profile trigram occurrences, argmax
    with lexicographic tie-break; 'und' when no profile scores > 0.
    """
    langs = sorted(_LANG_PROFILES)

    @F.pandas_udf(StringType())
    def langid(texts: pd.Series) -> pd.Series:
        low = texts.fillna("").str.lower()
        scores = np.zeros((len(low), len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for tri in _LANG_PROFILES[lang]:
                scores[:, li] += low.str.count(__import__("re").escape(tri)).to_numpy()
        best = scores.argmax(axis=1)
        out = np.array(langs, dtype=object)[best]
        out[scores.max(axis=1) == 0] = default
        out[texts.isna().to_numpy()] = None
        return pd.Series(out)

    return langid


_MERSENNE61 = np.uint64((1 << 61) - 1)
_MASK53 = np.uint64((1 << 53) - 1)


def _mersenne61_reduce(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for x < 2^64 (two folds + conditional subtract)."""
    p = _MERSENNE61
    r = (x & p) + (x >> np.uint64(61))
    r = (r & p) + (r >> np.uint64(61))
    return np.where(r >= p, r - p, r)


def fingerprint_udf(window: int = 0, mod: int = (1 << 61) - 1, base: int = 257):
    """pandas UDF: text -> 63-bit rolling polynomial hash fingerprint.

    fingerprint(t) = sum(base^(n-1-i) * byte_i) mod p over utf-8 bytes —
    a Rabin-Karp content fingerprint; byte-identical text -> identical
    fingerprint (the corpus per-row invariant check).

    Vectorized exactly in uint64: one pass per byte POSITION across the
    whole Arrow batch. h*257 = (h<<8) + h would overflow, but with
    p = 2^61-1 the top bits fold back (x*2^61 === x mod p), so
    h*256 mod p == (h >> 53) + ((h & (2^53-1)) << 8) computed in-range,
    and the final sum Mersenne-reduces. Bit-identical to the per-byte
    Python loop for NUL-free text (property-tested incl. multibyte
    utf-8; an embedded NUL byte truncates via the S-dtype length). The
    DuckDB oracle mirrors it per CHARACTER, which coincides with bytes
    only for ASCII corpora — the driver testdata is verified pure ASCII.
    """
    assert mod == (1 << 61) - 1 and base == 257, "vectorized path is fixed-parameter"

    @F.pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        nulls = texts.isna().to_numpy()
        enc = np.char.encode(texts.fillna("").to_numpy(dtype=object).astype(str), "utf-8")
        padded = enc.astype(np.bytes_)
        width = max(padded.dtype.itemsize, 1)
        mat = padded.view(np.uint8).reshape(len(texts), width) if len(texts) else \
            np.empty((0, 1), dtype=np.uint8)
        lengths = np.char.str_len(padded).astype(np.int64)
        h = np.zeros(len(texts), dtype=np.uint64)
        for j in range(width):
            live = j < lengths
            if not live.any():
                break
            hl = h[live]
            h256 = (hl >> np.uint64(53)) + ((hl & _MASK53) << np.uint64(8))
            x = h256 + hl                      # h*257 folded, < 2^63
            x = _mersenne61_reduce(x) + mat[live, j].astype(np.uint64)
            h[live] = _mersenne61_reduce(x)
        out = pd.Series(h.astype(np.int64), dtype=object)
        out[nulls] = None
        return out

    return fp


def repetition_stats(df: DataFrame, id_col: str, text_col: str,
                     gram_n: int = 2) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1 —
    public): per-doc word and word-n-gram duplication fractions, the
    filters that kill boilerplate/listicle pages in web-corpus curation.

    Distributed shape: explode to (doc, token) and aggregate twice —
    Catalyst's map-side partial agg collapses token counts before the
    shuffle, so the shuffle carries one row per (doc, DISTINCT token);
    the doc rollup then shuffles one row per doc. All built-in
    expressions, no Python. Fractions are single divisions of exact
    integers, so doubles are engine-exact.

    Returns per doc: n_words, n_distinct_words, top_word_count,
    dup_word_frac (fraction of word occurrences whose word occurs >1x),
    top_word_charmass_frac (max over words of count*len(word) /
    total word chars — the deterministic tie-break of Gopher's
    "fraction of chars in the most frequent word"), n_grams,
    top_gram_count, dup_gram_frac.
    """
    # null text folds to the empty string (one empty token) so the doc
    # still emits a signals row — silently vanishing from the output
    # would desync this frame from text_stats/quality_score on a join
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - gram_n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, gram_n)))
    base = df.select(F.col(id_col).alias("__id__"),
                     words.alias("__w__"), grams.alias("__g__"))

    def _tok_agg(col, prefix):
        cnt = (base.select("__id__", F.explode(col).alias("__t__"))
                   .groupBy("__id__", "__t__").agg(F.count("*").alias("__c__")))
        dup = F.sum(F.when(F.col("__c__") > 1, F.col("__c__"))
                     .otherwise(F.lit(0))).alias(f"__dup_{prefix}__")
        aggs = [F.sum("__c__").alias(f"n_{prefix}s"),
                F.max("__c__").alias(f"top_{prefix}_count"), dup]
        if prefix == "word":
            aggs += [F.count("*").alias("n_distinct_words"),
                     F.max(F.col("__c__") * F.length("__t__")).alias("__topmass__"),
                     F.sum(F.col("__c__") * F.length("__t__")).alias("__mass__")]
        return cnt.groupBy("__id__").agg(*aggs)

    wa = _tok_agg(F.col("__w__"), "word")
    ga = _tok_agg(F.col("__g__"), "gram")
    return (wa.join(ga, on="__id__")
              .select(F.col("__id__").alias(id_col),
                      "n_words", "n_distinct_words", "top_word_count",
                      (F.col("__dup_word__").cast("double")
                       / F.col("n_words")).alias("dup_word_frac"),
                      (F.col("__topmass__").cast("double")
                       / F.col("__mass__")).alias("top_word_charmass_frac"),
                      "n_grams", "top_gram_count",
                      (F.col("__dup_gram__").cast("double")
                       / F.col("n_grams")).alias("dup_gram_frac")))


def bm25_score_expr(n_terms: int, k1: float = 1.2,
                    b: float = 0.75) -> F.Column:
    """The BM25 scoring expression over columns (dl, n, sdl, tf0..,
    df0..) — ONE spelling shared by :func:`bm25_score` (computing from
    raw text) and plans/text_index.ranked_query (computing from stored
    postings), so the two paths and their common DuckDB mirror
    (_bm25_ctes) can never drift. Fixed term-order summation; absent
    terms contribute an exact +0.0, so posting-only evaluation is
    bit-identical to the full chain."""
    nd = F.col("n").cast("double")
    avgdl = F.col("sdl").cast("double") / nd
    dl = F.col("dl").cast("double")
    k1p1 = float(k1) + 1.0
    score = F.lit(0.0)
    for i in range(int(n_terms)):
        tf = F.col(f"tf{i}").cast("double")
        dfd = F.col(f"df{i}").cast("double")
        idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
        denom = tf + F.lit(float(k1)) * (F.lit(1.0) - F.lit(float(b))
                                         + F.lit(float(b)) * dl / avgdl)
        score = score + idf * (tf * F.lit(k1p1)) / denom
    return score


def bm25_score(docs: DataFrame, id_col: str, text_col: str,
               terms: list[str], k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 relevance of every document against a literal query-term
    list (Robertson/Sparck Jones; the Lucene +1 idf form so idf > 0):

        score(d) = sum_t ln((N - df_t + .5)/(df_t + .5) + 1)
                         * tf_td*(k1+1) / (tf_td + k1*(1 - b + b*dl/avgdl))

    Scale shape: ONE map-only pass computes (dl, tf_t...) per doc as
    codegen'd array HOFs over the whitespace tokens (the engine's
    shared tokenization); that narrow frame is persisted so the global
    corpus-stats agg (N, sum dl, df_t — all exact integers) and the
    final scored scan share the single tokenize pass. Stats broadcast
    back and the score is a fixed-order literal expression — no shuffle
    touches doc text. Query terms are matched lowercase. The cache
    rides on the result; ``cache.release(result)`` frees it.

    Exactness: every corpus stat is an exact integer, so the only
    engine-dependent op is ln(); the returned score is float32
    (`score32`), absorbing the <=1-ulp libm differences (the
    unigram_logprob convention). Returns (id, dl, score32) for docs
    matching at least one term.
    """
    scored, base = _bm25_scored(docs, id_col, text_col, terms, k1, b)
    score = bm25_score_expr(len(terms), k1=k1, b=b)
    out = scored.select(F.col(id_col), F.col("dl"),
                        score.cast("float").alias("score32"))
    return attach_cached(out.filter(F.col("score32") > 0), base)


def _bm25_scored(docs: DataFrame, id_col: str, text_col: str,
                 terms: list[str], k1: float, b: float):
    """The shared tokenize / per-term tf / persist / corpus-stats prefix
    of :func:`bm25_score` AND :func:`hard_negatives` — ONE spelling so
    the two callers (and the single DuckDB ``_bm25_ctes`` mirror both
    oracles replay) can never drift. Returns ``(scored, base)``:
    ``scored`` is the narrow per-doc frame crossed with the broadcast
    (n, sdl, df...) stats row, tf columns intact for callers that need
    them; ``base`` is the persisted tokenize frame to ride on the
    result via ``attach_cached`` (both downstream scans share the one
    tokenize pass)."""
    if not terms:
        raise ValueError("bm25 scoring needs at least one query term")
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("__toks__"))
    base = base.withColumn("dl", F.size("__toks__").cast("long"))
    for i, t in enumerate(terms):
        tl = str(t).lower()
        tf = F.size(F.filter("__toks__", lambda x: x == F.lit(tl)))
        base = base.withColumn(f"tf{i}", tf.cast("long"))
    # persist the narrow (id, dl, tf...) frame: both the corpus-stats
    # agg and the scored scan read it, and without the cache the
    # dominant cost — tokenizing every document — runs twice
    base = base.drop("__toks__").persist()
    g = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
          for i in range(len(terms))])
    return base.crossJoin(F.broadcast(g)), base


def hard_negatives(docs: DataFrame, id_col: str, text_col: str,
                   terms: list[str], k: int = 25,
                   k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Lexical hard-negative mining for retrieval training: the top-k
    BM25-scored documents that match AT LEAST ONE query term but NOT
    ALL of them — high-scoring partial matches, exactly the confusable
    negatives contrastive retrievers train against (full matches are
    presumed positives and excluded).

    Scale shape: the single bm25_score tokenize pass (the per-term tf
    columns it already computes drive both the score and the
    all-terms exclusion — no second corpus scan), broadcast corpus
    stats, then a global top-k via ``orderBy().limit(k)``
    (TakeOrderedAndProject) with rank attached over only the k
    survivors (the geo_search convention). Returns
    (id, dl, score32, rank).

    Exactness: same contract as :func:`bm25_score` — exact integer
    stats, float32 score absorbing ln ulps, rank by the float32 key
    with an id tie-break.
    """
    if k < 1:
        raise ValueError(f"hard_negatives needs k >= 1, got {k}")
    if not terms:
        raise ValueError("hard_negatives needs at least one query term")
    from pyspark.sql import Window

    scored, base = _bm25_scored(docs, id_col, text_col, terms, k1, b)
    score = bm25_score_expr(len(terms), k1=k1, b=b)
    has_all = F.lit(True)
    for i in range(len(terms)):
        has_all = has_all & (F.col(f"tf{i}") > 0)
    neg = (scored.select(F.col(id_col), F.col("dl"),
                         score.cast("float").alias("score32"),
                         has_all.alias("__all__"))
                 .filter((F.col("score32") > 0) & ~F.col("__all__"))
                 .drop("__all__"))
    order = [F.col("score32").desc(), F.col(id_col).asc()]
    topk = neg.orderBy(*order).limit(int(k))
    win = Window.partitionBy(F.lit(0)).orderBy(*order)
    return attach_cached(topk.withColumn("rank", F.row_number().over(win)),
                         base)


def phrase_search(docs: DataFrame, id_col: str, text_col: str,
                  phrase: str, lowercase: bool = True) -> DataFrame:
    """Exact-phrase retrieval over whitespace tokens via POSITIONAL
    postings — the inverted-index phrase query (Manning/Raghavan/Schütze
    IR ch. 2 positional-intersection algorithm), the decontamination /
    attribution primitive that token-set ops (bm25_score, ngram keys)
    can't answer: *where* does this exact k-token sequence occur?

    Semantics: a hit at 1-based token position ``s`` means tokens
    ``s..s+k-1`` equal the phrase's tokens (lowercased on both sides by
    default). Overlapping hits all count. Returns
    ``(id_col, n_hits, first_pos)`` for matching docs only.

    Scale shape — the positional-posting plan, not a per-doc scan trick:

    1. tokenize + ``posexplode`` ONCE, keeping only postings whose term
       appears in the phrase (a literal isin: the posting stream is
       ∝ phrase-term frequency, not corpus size — for a typical query
       phrase this drops >99.9% of tokens map-side);
    2. each surviving posting (doc, pos, term) emits one candidate
       anchor ``start = pos - i`` per slot ``i`` where ``term ==
       phrase[i]`` (bounded ×k, map-only, and exactly the term-offset
       rewrite that turns phrase matching into equality on (doc,
       start));
    3. ONE combining groupBy (doc, start): the anchor is a hit iff all
       k distinct slots reported — ``count(distinct i) = k`` spelled as
       an exact bitmask OR (k ≤ 62) so the agg is a LongAccumulator,
       not a distinct-set;
    4. one more combining groupBy (doc) for (n_hits, first_pos).

    No join at all — duplicate phrase terms (e.g. "the x the") are
    handled by the slot bitmask. Both shuffles move (id, start, long)
    triples only; text never leaves the scan stage.
    """
    toks = [t for t in phrase.split() if t]
    if not toks:
        raise ValueError("phrase_search needs a non-empty phrase")
    if len(toks) > 62:
        raise ValueError(f"phrase too long ({len(toks)} tokens; max 62)")
    if lowercase:
        toks = [t.lower() for t in toks]
    k = len(toks)
    full = (1 << k) - 1
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.split(F.trim(text), r"\s+")

    post = (docs.select(F.col(id_col),
                        F.posexplode(words).alias("__p0__", "__t__"))
                .filter(F.col("__t__").isin(*set(toks))))
    # slot fan-out: term -> [i where phrase[i] == term], as a literal map
    slot_arr = F.array(*[
        F.when(F.col("__t__") == F.lit(t), F.lit(i)).otherwise(F.lit(-1))
        for i, t in enumerate(toks)])
    anchors = (post.select(
        F.col(id_col),
        F.explode(F.filter(slot_arr, lambda s: s >= 0)).alias("__i__"),
        F.col("__p0__"))
        .select(F.col(id_col),
                (F.col("__p0__") - F.col("__i__") + 1).alias("start"),
                F.call_function("shiftleft", F.lit(1).cast("long"),
                                F.col("__i__")).alias("__bit__"))
        .filter(F.col("start") >= 1))
    hits = (anchors.groupBy(id_col, "start")
                   .agg(F.bit_or("__bit__").alias("__m__"))
                   .filter(F.col("__m__") == F.lit(full)))
    return (hits.groupBy(id_col)
                .agg(F.count("*").alias("n_hits"),
                     F.min("start").alias("first_pos")))


def geo_search(docs: DataFrame, id_col: str, text_col: str,
               lon_col: str, lat_col: str, terms: list[str],
               qlon: float, qlat: float, k: int = 20,
               half_dist_m: float = 100_000.0,
               k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Geo-aware retrieval: BM25 text relevance x exponential distance
    decay, global top-k — "the most relevant pages NEAR here", the
    query shape a geospatial web-corpus engine exists to serve (the
    reference's attribute+spatial predicate combination expressed as a
    ranking instead of a filter). Combined score:

        geo_score = bm25(d, terms) * 0.5^(dist_sphere(d, q)/half_dist_m)

    so relevance halves every ``half_dist_m`` meters from the query
    point (the decayed_density half-life convention, applied to space).

    Scale shape: :func:`bm25_score` is the one corpus pass (map-only
    tokenize + broadcast corpus stats — doc text never shuffles); the
    haversine leg is map-only over (id, lon, lat); the two narrow
    frames join on id and the global top-k is ``orderBy().limit(k)``
    (TakeOrderedAndProject: per-partition heaps + driver merge, never a
    single-partition sort); rank attaches over only the k survivors.

    Exactness: the haversine double chain is engine-exact (the
    dwithin_sphere convention); bm25 and the decay product are float32
    (`score32`/`geo_score32`), absorbing ln/pow libm ulps; ordering is
    by the float32 key with an id tie-break (the weighted_sample
    rank-by-float32 convention). Returns
    (id, dl, dist32, geo_score32, rank).
    """
    if k < 1:
        raise ValueError(f"geo_search needs k >= 1, got {k}")
    if half_dist_m <= 0:
        raise ValueError(f"half_dist_m must be positive, "
                         f"got {half_dist_m}")
    from ..geom.measures import haversine_col
    from pyspark.sql import Window

    scored = bm25_score(docs, id_col, text_col, terms, k1=k1, b=b)
    dist = haversine_col(F.lit(float(qlon)), F.lit(float(qlat)),
                         F.col(lon_col), F.col(lat_col))
    pts = docs.select(F.col(id_col), dist.alias("__dist__"))
    geo = (F.col("score32").cast("double")
           * F.pow(F.lit(0.5), F.col("__dist__") / F.lit(float(half_dist_m))))
    ranked = (scored.join(pts, on=id_col)
                    .select(F.col(id_col), F.col("dl"),
                            F.col("__dist__").cast("float").alias("dist32"),
                            geo.cast("float").alias("geo_score32")))
    order = [F.col("geo_score32").desc(), F.col(id_col).asc()]
    topk = ranked.orderBy(*order).limit(int(k))
    win = Window.partitionBy(F.lit(0)).orderBy(*order)
    # carry bm25's persisted tokenize frame forward so
    # cache.release(result) still frees it
    return attach_cached(topk.withColumn("rank", F.row_number().over(win)),
                         *getattr(scored, "_geomesa_cached", []))


# Unicode script classes for script_mix. Character-class-only patterns
# (no alternation-with-backreference), valid in both the Java regex and
# RE2 (DuckDB) dialects so oracles replay them verbatim.
SCRIPT_CLASSES = (
    ("latin", "[A-Za-zÀ-ɏ]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("cjk", "[぀-ヿ一-鿿가-힯]"),
    ("space", "[ \\t\\n\\r]"),
)


def script_mix(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode-script composition — exact character counts
    per script class (latin/digit/cyrillic/greek/arabic/CJK/space plus
    an ``other`` remainder). The multilingual-curation signal that
    catches mislabeled-language and mixed-script (spam, encoding-mojibake)
    documents before language-ID sees them.

    Every count is length(text) - length(regexp_replace(text, cls, ''))
    — exact integers, map-only, whole-stage codegen, shuffle-free; the
    patterns are plain character classes shared verbatim with SQL
    engines. Returns (id, n_chars, n_latin, n_digit, n_cyrillic,
    n_greek, n_arabic, n_cjk, n_space, n_other).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    total = F.length(txt).cast("long")
    cols = [F.col(id_col), total.alias("n_chars")]
    for name, pat in SCRIPT_CLASSES:
        c = (F.length(txt)
             - F.length(F.regexp_replace(txt, pat, ""))).cast("long")
        cols.append(c.alias(f"n_{name}"))
    out = docs.select(*cols)
    other = F.col("n_chars")
    for name, _ in SCRIPT_CLASSES:
        other = other - F.col(f"n_{name}")
    return out.withColumn("n_other", other.cast("long"))
