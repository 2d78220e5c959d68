"""Corpus-preparation operators: the document-level transforms a
web-scale training-data pipeline runs between raw crawl and training
shards — line-level dedup (C4 §2.2 / CCNet style), benchmark
decontamination (n-gram overlap against an eval set), deterministic
stratified sampling for data mixing, near-dup cluster application
(keep-one-per-cluster), and per-stratum mixing statistics.

These extend the reference engine's analytics (its scans/joins/stats
operate on features; a web corpus is the same shape with text payloads
— see sources/pages.py) with the operations Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"), Raffel
et al. 2020 (C4), and Rae et al. 2021 (Gopher/MassiveText) describe.

Scale notes (100 TB corpus, 1000 executors):

* ``line_dedup`` is the one genuinely heavy op: it explodes documents
  into lines. All shuffles are keyed by the 8-byte xxhash64 of the
  line, never the line text; doc-frequency is a two-level aggregation
  (map-side partial distinct on (hash, doc)), and the line->frequency
  join is a plain shuffle join where AQE's skew-join split handles the
  boilerplate hot keys (a "© 2024" line appearing in 10^8 docs lands
  on one key; its frequency row is 1 row, so the split is cheap).
* ``decontaminate`` broadcasts the eval-set n-grams (eval benchmarks
  are ~10^5 docs; their distinct n-gram hashes fit executor memory by
  construction) — the 100 TB train side is map-only + one bounded
  per-doc aggregation.
* ``stratified_sample`` is map-only and shuffle-free: keep/drop is a
  pure function of (id, stratum), so it composes with any downstream
  plan and re-runs reproducibly on resume — the property data-mixing
  jobs need (Chowdhery et al. 2022 §3).
* ``dedup_apply`` anti-joins on the id only; document text never
  enters the shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .cache import attach_cached as _attach_cached

__all__ = [
    "line_dedup", "decontaminate", "stratified_sample", "exact_k_sample",
    "weighted_sample",
    "score_buckets", "dedup_apply",
    "mixing_stats", "word_ngrams", "tfidf_topk_terms", "unigram_logprob",
    "normalize_url", "write_shards", "duplicated_ngram_fraction",
    "bigram_logprob", "collocations", "dsir_weights",
    "zipf_fit", "heaps_law", "gini_concentration",
    "pack_sequences", "redact_pii", "pii_stats", "incremental_dedup",
    "gopher_quality", "chunk_text", "quality_classifier",
    "extract_html_text", "extract_main_content", "html_escape", "wrap_html",
    "extract_links", "url_host", "surt_key", "host_boilerplate",
    "canonical_dedup",
    "bloom_words", "bloom_dense", "bloom_probe",
    "robots_rules", "robots_filter", "fetch_schedule", "parse_sitemap",
    "capture_churn", "crawl_diff", "trending_terms",
]


# ---------------------------------------------------------------------------
# HTML -> text extraction (the warc ingest stage)

# Block elements whose CONTENT is boilerplate, not page text (trafilatura/
# jusText-style main-content extraction, reduced to a deterministic rule
# set). RE2 (DuckDB) has no backreferences, so each tag gets its own
# literal open..close pattern instead of <(a|b)>.*?</\1>. Patterns live
# in the Java-regex ∩ RE2 dialect subset (same convention as
# PII_PATTERNS): inline (?is) flags, lazy quantifiers, no lookaround.
_HTML_BLOCK_TAGS = ("script", "style", "head", "nav", "footer", "aside")
_HTML_COMMENT = r"(?s)<!--.*?-->"
_HTML_TAG = r"(?s)<[^>]*>"
# minimal entity set; &amp; decoded LAST so double-escapes stay literal
_HTML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"),
)
_WS_RUN = "[ \t\n\r]+"


def extract_html_text(html: Column) -> Column:
    """Deterministic HTML -> visible-text extraction as a pure JVM
    expression chain (map-only, shuffle-free, whole-stage codegen — the
    10^12-page ingest stage never leaves Tungsten):

    1. drop comments, then script/style/head/nav/footer/aside blocks
       (content included), 2. strip remaining tags to a space,
    3. decode the minimal entity set (&amp; last), 4. collapse
    [ \\t\\n\\r]+ runs to one space and trim.

    The per-row invariant of the corpus (BASELINE input_hint: byte-
    identical extracted text per url) holds because every step is a pure
    function of the html bytes. Accepts a binary or string column.
    """
    s = html.cast("string")
    s = F.regexp_replace(s, _HTML_COMMENT, " ")
    for tag in _HTML_BLOCK_TAGS:
        s = F.regexp_replace(s, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " ")
    s = F.regexp_replace(s, _HTML_TAG, " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_RUN, " "))


_BLOCK_SPLIT = (r"(?is)</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|article|"
                r"section|header|blockquote|br)[^>]*>")
_ANCHOR_INNER = r"(?is)<a\b[^>]*>(.*?)</a>"


def _visible(block: Column) -> Column:
    """Block html -> trimmed visible text (tags to spaces, minimal
    entities, whitespace collapsed) — the per-block twin of
    extract_html_text steps 2-4."""
    s = F.regexp_replace(block, _HTML_TAG, " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_RUN, " "))


def extract_main_content(html: Column, min_chars: int = 25,
                         max_link_ppt: int = 300) -> Column:
    """jusText/trafilatura-family main-content extraction as a pure JVM
    higher-order-expression chain (map-only, shuffle-free):

    1. drop comments + always-boilerplate containers (script/style/
       head/nav/footer/aside, content included);
    2. split what remains into candidate blocks at block-level tag
       boundaries;
    3. per block, compute the visible text and the visible text of its
       ``<a>`` anchors;
    4. keep a block iff ``len(visible) >= min_chars`` AND its link
       density ``len(anchor_text)/len(visible) <= max_link_ppt/1000``
       (exact integer cross-multiplication — no float compare);
    5. join kept blocks with a newline.

    This is the block-classification step the flat
    ``extract_html_text`` doesn't do: link farms, related-links lists
    and button rows inside the body are dropped even though they are
    not in a named boilerplate container. Patterns live in the
    Java-regex ∩ RE2 dialect subset so DuckDB replays them verbatim.
    """
    s = html.cast("string")
    s = F.regexp_replace(s, _HTML_COMMENT, " ")
    for tag in _HTML_BLOCK_TAGS:
        s = F.regexp_replace(s, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", " ")
    blocks = F.split(s, _BLOCK_SPLIT)
    # score each block ONCE (higher-order fns are interpreted, so an
    # element_at(blocks, i) inside the filter predicate would recompute
    # the whole per-document strip+split chain per block)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            _visible(b).alias("v"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_ANCHOR_INNER), F.lit(1)),
                F.lit(0),
                lambda acc, a: acc + F.length(_visible(a))).alias("ll")))
    kept = F.filter(
        scored,
        lambda x: (F.length(x["v"]) >= min_chars)
        & (x["ll"] * 1000 <= F.length(x["v"]) * max_link_ppt))
    return F.array_join(F.transform(kept, lambda x: x["v"]), "\n")


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL, ``www.`` stripped — the
    node key of host-level link graphs (shares normalize_url's
    first-occurrence split rules; pure JVM string expressions)."""
    nofrag = F.substring_index(url, "#", 1)
    sep = F.instr(nofrag, "://")
    hostpath = F.when(sep > 0,
                      nofrag.substr(sep + 3, F.length(nofrag))
                      ).otherwise(nofrag)
    rawhost = F.lower(F.substring_index(
        F.substring_index(hostpath, "/", 1), "?", 1))
    return F.when(rawhost.startswith("www."),
                  rawhost.substr(F.lit(5), F.length(rawhost))
                  ).otherwise(rawhost)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of an absolute
    URL — the canonical sort/lookup key of web-archive indexes (the
    Internet Archive / Common Crawl CDX convention, public):
    ``https://www.Example.com:443/Path?q`` -> ``com,example)/path?q``.
    Host labels reverse (comma-joined) so one domain's pages sort
    contiguously — prefix scans over a petabyte index answer "every
    capture under example.com" without a shuffle. Rules: scheme and
    fragment drop, host lowercases and loses ``www.`` + default ports
    (:80/:443; other ports kept as ``:port`` before ``)``), path+query
    lowercase. Compose with :func:`normalize_url` first when tracking
    params / param order should also collapse.

    Pure JVM string/array expressions (the normalize_url dialect — no
    Python, replayable verbatim by a SQL mirror).
    """
    nofrag = F.substring_index(url, "#", 1)
    sep = F.instr(nofrag, "://")
    hostpath0 = F.when(sep > 0,
                       nofrag.substr(sep + 3, F.length(nofrag))
                       ).otherwise(nofrag)
    # host ends at the first '/' OR '?' (implied-'/' trick)
    q0 = F.instr(hostpath0, "?")
    s0 = F.instr(hostpath0, "/")
    hostpath = F.when((q0 > 0) & ((s0 == 0) | (q0 < s0)),
                      F.concat(hostpath0.substr(F.lit(1), q0 - 1), F.lit("/"),
                               hostpath0.substr(q0, F.length(hostpath0)))
                      ).otherwise(hostpath0)
    hostport = F.lower(F.substring_index(hostpath, "/", 1))
    host = F.substring_index(hostport, ":", 1)
    host = F.when(host.startswith("www."),
                  host.substr(F.lit(5), F.length(host))).otherwise(host)
    port = F.when(F.instr(hostport, ":") > 0,
                  F.substring_index(hostport, ":", -1)).otherwise(F.lit(""))
    portpart = F.when(port.isin("", "80", "443"), F.lit("")) \
                .otherwise(F.concat(F.lit(":"), port))
    pathq = F.when(F.instr(hostpath, "/") > 0,
                   F.lower(hostpath.substr(F.instr(hostpath, "/"),
                                           F.length(hostpath)))
                   ).otherwise(F.lit("/"))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, portpart, F.lit(")"), pathq)


def canonical_dedup(df: DataFrame, url_col: str, html_col: str,
                    ts_col: str | None = None) -> DataFrame:
    """rel=canonical dedup — the crawl-side complement of
    :func:`normalize_url`: group captures by the canonical URL the page
    itself declares (``<link rel="canonical" href="...">``; CMSes emit
    one per template page, so /article?page=2, /article?utm_source=x and
    /amp/article all point at /article) and keep ONE representative per
    canonical — the newest capture when ``ts_col`` is given (ties break
    to the max url), else the lexicographically greatest url.

    Only absolute http(s) canonicals are honored (the extract_links
    convention); relative or missing canonicals fall back to the page's
    own url, which leaves undeclared pages ungrouped. Both attribute
    orders are matched (``rel`` before ``href`` and ``href`` before
    ``rel``), double- or single-quoted (the Java∩RE2 dialect subset).

    Returns (canonical, url[, ts_col], n_dupes) — one row per canonical.

    Plan shape (100 TB): map-only regexp extract + ONE combining
    struct-max aggregation keyed by canonical (map-side partial agg, no
    window, no Python). Hot canonicals (a CMS pointing a million spam
    pages at one URL) are a single-row-out agg key — partial aggregation
    absorbs them before the shuffle.
    """
    html = F.col(html_col).cast("string")
    pat_rel_first = (r'(?i)<link[^>]*rel=["\']?canonical["\']?[^>]*'
                     r'href=["\']?(https?://[^"\'\s>]+)')
    pat_href_first = (r'(?i)<link[^>]*href=["\']?(https?://[^"\'\s>]+)'
                      r'["\']?[^>]*rel=["\']?canonical')
    c1 = F.regexp_extract(html, pat_rel_first, 1)
    c2 = F.regexp_extract(html, pat_href_first, 1)
    declared = F.when(c1 != "", c1).when(c2 != "", c2) \
                .otherwise(F.col(url_col))
    rep_cols = ([F.col(ts_col)] if ts_col else []) + [F.col(url_col)]
    best = F.max(F.struct(*rep_cols)).alias("__best__")
    out = (df.withColumn("__canon__", declared)
             .groupBy("__canon__")
             .agg(best, F.count("*").alias("n_dupes")))
    keep = [F.col("__canon__").alias("canonical")]
    if ts_col:
        keep += [F.col(f"__best__.{url_col}").alias(url_col),
                 F.col(f"__best__.{ts_col}").alias(ts_col)]
    else:
        keep += [F.col(f"__best__.{url_col}").alias(url_col)]
    return out.select(*keep, "n_dupes")


def extract_links(df: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Outlink extraction — the crawl-graph ingest stage: one row
    ``(url_col, href)`` per ABSOLUTE http(s) ``href`` in the page's
    html (double-quoted, single-quoted, or unquoted attribute forms),
    in document order. Relative links (``/about``) carry no cross-host
    edge and are skipped. The URL is taken up to the first quote,
    whitespace, or ``>`` — a literal space inside a quoted URL (illegal
    unescaped per RFC 3986; real crawls %-encode it) truncates there.

    Map-only JVM chain (regexp_extract_all + explode): no Python, no
    shuffle — at 10^12 pages this runs inside the ingest scan, and the
    follow-on host-graph groupBy is the first (and only) shuffle,
    keyed by the tiny (src_host, dst_host) pair. Pattern lives in the
    Java-regex ∩ RE2 dialect subset (the extract_html_text convention)
    so an engine mirror can run it verbatim.
    """
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"),
        F.lit("(?i)href=[\"']?(https?://[^\"'\\s>]+)"), F.lit(1))
    return (df.select(F.col(url_col), F.explode(hrefs).alias("href")))


def extract_anchors(df: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """Anchor-text extraction — the link-feature stage of a web-ranking
    / training-data pipeline: one row ``(url_col, href, anchor)`` per
    ABSOLUTE http(s) link whose ``<a>`` element body contains no nested
    markup (the common case; nested-element anchors would need a real
    HTML parser and are out of scope, like the reference's converters
    which are also regex/field-based — geomesa-convert
    Converters.scala:37-88). Relative links are skipped, matching
    ``extract_links``.

    Two-stage map-only JVM chain: ``regexp_extract_all`` captures whole
    ``<a ...>text</a>`` elements, then per-element ``regexp_extract``
    pulls the href (double-quoted / single-quoted / unquoted attribute
    forms) and the inner text. No Python, no shuffle — the follow-on
    per-(host, anchor) rollup is the first shuffle, keyed by the tiny
    pair. Patterns live in the Java-regex ∩ RE2 dialect subset so an
    engine mirror can run them verbatim.
    """
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"),
        F.lit("(?i)(<a\\s[^>]*>[^<]*</a>)"), F.lit(1))
    tagged = df.select(F.col(url_col), F.explode(tags).alias("__tag__"))
    href = F.regexp_extract(
        F.col("__tag__"), "(?i)href=[\"']?(https?://[^\"'\\s>]+)", 1)
    anchor = F.regexp_extract(F.col("__tag__"), ">([^<]*)<", 1)
    return (tagged.select(F.col(url_col), href.alias("href"),
                          anchor.alias("anchor"))
                  .filter(F.col("href") != ""))


def html_escape(text: Column) -> Column:
    """Minimal-entity escape (&, <, > — in that order) so arbitrary text
    embeds losslessly in an element body."""
    out = F.replace(text, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def wrap_html(text: Column, doc_id: Column) -> Column:
    """Deterministic messy-page template around escaped ``text``: title/
    script/style in head, nav + footer boilerplate (with entities and a
    bare ``<`` inside the script body) around the one real paragraph.
    ``extract_html_text(wrap_html(t, i))`` == whitespace-normalized
    ``t`` — the round-trip the ingest invariant test pins down."""
    return F.concat(
        F.lit("<html><head><title>doc "), doc_id.cast("string"),
        F.lit('</title><script type="text/javascript">var t = 1 < 2;'
              '</script><style>p { margin: 0 }</style></head><body>'
              '<nav><a href="/">Home</a> &amp; <a href="/about">About</a>'
              '</nav>\n<p>'),
        html_escape(text),
        F.lit("</p>\n<!-- generated -->"
              "<footer>&copy; example&nbsp;site</footer></body></html>"))


def line_dedup(df: DataFrame, id_col: str, text_col: str, sep: str = "\n",
               min_docs: int = 2, drop_empty: bool = True) -> DataFrame:
    """Remove every line that occurs in >= ``min_docs`` distinct
    documents (C4's "three-sentence span" rule collapsed to lines, the
    CCNet paragraph-hash dedup): boilerplate navigation, cookie
    banners, and license blurbs repeat across pages; unique prose does
    not.

    Returns one row per surviving document: (id, text with offending
    lines removed and original order preserved, n_lines, n_kept).
    Documents whose every line is boilerplate disappear when
    ``drop_empty`` (they carry no signal).

    Plan shape: explode -> per-(line-hash) doc-frequency (two-level
    agg) -> hash-keyed join back -> per-doc ordered reassembly. Three
    shuffles, all on 8-byte or (8+8)-byte keys; the full line text
    travels only inside the doc-keyed reassembly where it must.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep)))
         .alias("__pos__", "__line__"),
    ).withColumn("__lh__", F.xxhash64("__line__")).persist()
    # ^ the exploded lines feed BOTH the doc-frequency aggregation and
    # the join probe; without persist the scan+explode runs twice.
    # (cache.release(out) frees it; at corpus sizes where caching the
    # exploded lines is worse than a second scan, unpersist eagerly.)
    # doc-frequency of each distinct line: distinct (hash, doc) pairs
    # first so a line repeated inside one doc counts that doc once
    docfreq = (lines.select("__lh__", id_col).distinct()
                    .groupBy("__lh__")
                    .agg(F.count("*").alias("__df__")))
    flagged = (lines.join(docfreq, on="__lh__")
                    .withColumn("__keep__", F.col("__df__") < min_docs))
    parts = F.array_sort(F.collect_list(
        F.struct(F.col("__pos__"), F.col("__line__"), F.col("__keep__"))))
    kept = F.filter(parts, lambda s: s["__keep__"])
    out = (flagged.groupBy(id_col).agg(
        F.array_join(F.transform(kept, lambda s: s["__line__"]), sep)
         .alias(text_col),
        F.count("*").alias("n_lines"),
        F.sum(F.col("__keep__").cast("long")).alias("n_kept")))
    if drop_empty:
        out = out.filter(F.col("n_kept") > 0)
    return _attach_cached(out, lines)


def host_boilerplate(df: DataFrame, url_col: str, text_col: str,
                     sep: str = "\n", min_ratio: float = 0.5,
                     min_pages: int = 2, drop_empty: bool = True
                     ) -> DataFrame:
    """Per-site boilerplate strip (the site-scoped variant of C4 §2.2 /
    CCNet paragraph dedup): a line is template chrome when it appears on
    >= ``min_pages`` distinct pages AND on >= ``min_ratio`` of ALL pages
    of the SAME host — nav bars, cookie banners, and copyright footers
    repeat within a site; prose does not. ``line_dedup`` removes lines
    duplicated across the whole corpus; this catches site templates too
    rare globally to clear a corpus-wide threshold (a 30-page blog's
    footer occurs 30 times in 10^12 documents).

    Returns one surviving row per page:
    (url, host, text with offending lines removed in original order,
    n_lines, n_kept).

    Plan shape (100 TB): explode -> distinct (host, line-hash, url) ->
    per-(host, line-hash) page counts (two-level agg) -> join per-host
    page totals (host-keyed; one row per host) -> hash-keyed join back
    -> per-page ordered reassembly. Every shuffle rides (host, 8-byte
    hash) keys — the line text travels only inside the page-keyed
    reassembly where it must; AQE skew-join covers mega-hosts.
    """
    reserved = {"__host__", "__pos__", "__line__", "__lh__", "__pf__",
                "__np__", "__keep__"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input must not carry the reserved internal columns: "
            f"{sorted(reserved)}")
    lines = df.select(
        F.col(url_col), url_host(F.col(url_col)).alias("__host__"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep)))
         .alias("__pos__", "__line__"),
    ).withColumn("__lh__", F.xxhash64("__line__")).persist()
    # one row per host: how many distinct pages it has
    totals = (lines.select("__host__", url_col).distinct()
                   .groupBy("__host__").agg(F.count("*").alias("__np__")))
    # per-(host, line) distinct-page frequency; a line repeated inside
    # one page counts that page once
    freq = (lines.select("__host__", "__lh__", url_col).distinct()
                 .groupBy("__host__", "__lh__")
                 .agg(F.count("*").alias("__pf__"))
                 .join(totals, on="__host__"))
    flagged = (lines.join(freq, on=["__host__", "__lh__"])
                    .withColumn(
                        "__keep__",
                        (F.col("__pf__") < F.lit(int(min_pages))) |
                        (F.col("__pf__").cast("double") <
                         F.lit(float(min_ratio)) * F.col("__np__"))))
    parts = F.array_sort(F.collect_list(
        F.struct(F.col("__pos__"), F.col("__line__"), F.col("__keep__"))))
    kept = F.filter(parts, lambda s: s["__keep__"])
    out = (flagged.groupBy(url_col, "__host__").agg(
        F.array_join(F.transform(kept, lambda s: s["__line__"]), sep)
         .alias(text_col),
        F.count("*").alias("n_lines"),
        F.sum(F.col("__keep__").cast("long")).alias("n_kept"))
        .withColumnRenamed("__host__", "host"))
    if drop_empty:
        out = out.filter(F.col("n_kept") > 0)
    return _attach_cached(out, lines)


def word_ngrams(text: Column, n: int, word_sep: str = " ") -> Column:
    """Array of word ``n``-grams of ``text`` (space-joined), entirely in
    JVM expressions (split -> sequence -> slice/array_join) so the
    explode that usually follows stays inside whole-stage codegen.
    Shorter-than-``n`` texts yield an empty array (sequence() would
    otherwise count DOWN and fabricate grams)."""
    words = F.split(text, re.escape(word_sep))
    n_ = F.lit(n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n_),
        lambda i: F.array_join(F.slice(words, i + 1, n_), word_sep))
    return F.when(F.size(words) >= n_, grams).otherwise(
        F.array().cast("array<string>"))


def decontaminate(train: DataFrame, eval_df: DataFrame, id_col: str,
                  text_col: str, n: int = 8) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / PaLM §3.2 style):
    flag every training document sharing at least one word ``n``-gram
    with the evaluation set. Returns (id, n_hits, n_distinct_hits) for
    flagged docs — the caller anti-joins to drop or audits the counts.

    The eval side collapses to DISTINCT n-gram hashes and broadcasts;
    the train side is map-only (JVM n-gram expressions, no Python) into
    a per-doc aggregation. n_hits counts gram *positions* that match;
    n_distinct_hits counts distinct matching grams.
    """
    ev = (eval_df.select(F.explode(word_ngrams(F.col(text_col), n))
                          .alias("__ng__"))
                 .select(F.xxhash64("__ng__").alias("__ngh__"))
                 .distinct())
    tr = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("__ng__"),
    ).select(id_col, F.xxhash64("__ng__").alias("__ngh__"))
    return (tr.join(F.broadcast(ev), on="__ngh__")
              .groupBy(id_col)
              .agg(F.count("*").alias("n_hits"),
                   F.countDistinct("__ngh__").alias("n_distinct_hits")))


def _mix_bucket_udf(seed: int, buckets: int):
    """(coalesced id, is-null flag) -> bucket, null on null id.

    Two columns instead of one nullable long on purpose: Arrow hands a
    long batch CONTAINING nulls to pandas as float64, which silently
    rounds ids above 2^53 — a 64-bit hash id would land in a different
    bucket depending on whether its batch happened to contain a null,
    breaking the deterministic shard/sample contract. The coalesced
    column is null-free, so every batch arrives as exact int64.
    """
    from .ann import mix64

    @F.pandas_udf(LongType())
    def bucket(ids: pd.Series, isnull: pd.Series) -> pd.Series:
        mask = ~isnull.to_numpy(dtype=bool)
        out = pd.array(np.zeros(len(ids), dtype=np.int64), dtype="Int64")
        out[~mask] = pd.NA
        if mask.any():
            m = mix64(ids.to_numpy(np.int64)[mask], seed)
            out[mask] = (m % np.uint64(buckets)).astype(np.int64)
        return pd.Series(out)

    def apply(col: Column) -> Column:
        return bucket(F.coalesce(col, F.lit(0)), col.isNull())

    return apply


def score_buckets(df: DataFrame, id_col: str, score_col: str,
                  strata_col: str, n_buckets: int = 3,
                  bucket_col: str = "bucket") -> DataFrame:
    """CCNet-style quality bucketing: within each stratum (language),
    rank rows by score DESCENDING and assign equal-population buckets —
    bucket 0 = head (best), n-1 = tail. CCNet keeps/weights buckets
    differently when building the training mixture.

    Exact integer arithmetic: ``bucket = (rank - 1) * n_buckets DIV
    count`` over a deterministic (score desc, id) order — no quantile
    sketch, no float thresholds, bit-reproducible. Scale shape: ONE
    stratum-keyed window (rank streams) + a broadcast per-stratum count
    join (|strata| rows)."""
    if n_buckets < 1:
        raise ValueError(f"score_buckets: n_buckets >= 1, got {n_buckets}")
    reserved = {"__sbrk__", "__sbn__", bucket_col} & set(df.columns)
    if reserved:
        raise ValueError(f"score_buckets: reserved columns {reserved}")
    w = Window.partitionBy(strata_col).orderBy(F.col(score_col).desc(),
                                               id_col)
    counts = (df.groupBy(strata_col)
                .agg(F.count("*").alias("__sbn__")))
    return (df.withColumn("__sbrk__", F.row_number().over(w))
              .join(F.broadcast(counts), strata_col)
              .withColumn(bucket_col,
                          F.call_function(
                              "div", (F.col("__sbrk__") - 1) * n_buckets,
                              F.col("__sbn__")).cast("int"))
              .drop("__sbrk__", "__sbn__"))


def exact_k_sample(df: DataFrame, id_col: str, strata_col: str, k: int,
                   seed: int = 42) -> DataFrame:
    """Deterministic EXACT-quota sampling: the k rows with the smallest
    splitmix64(id) per stratum (ties broken by id). Complements
    stratified_sample — that one is ppm-proportional and shuffle-free
    but only approximates counts; this one guarantees exactly
    min(k, |stratum|) rows when a mixture recipe demands hard quotas.

    Retry-stable and incremental-friendly: the keep set is a pure
    function of (id, seed), so re-runs and re-partitions agree, and
    growing a stratum only ever evicts the largest-hash members.
    Scale shape: ONE stratum-keyed window shuffle (rank streams;
    per-stratum state is O(1)); k plays no part in memory."""
    if k < 1:
        raise ValueError(f"exact_k_sample: k must be >= 1, got {k}")
    from .ann import mix64

    @F.pandas_udf(LongType())
    def mixv(ids: pd.Series) -> pd.Series:
        # mix64 output is already 63-bit (>>1 inside) -> int64-safe
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    w = Window.partitionBy(strata_col).orderBy("__smp__", id_col)
    return (df.withColumn("__smp__", mixv(F.col(id_col)))
              .withColumn("__rk__", F.row_number().over(w))
              .filter(F.col("__rk__") <= k)
              .drop("__smp__", "__rk__"))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str, k: int,
                    strata_col: str | None = None, seed: int = 42,
                    key_col: str = "es_key32") -> DataFrame:
    """Deterministic weight-proportional sampling WITHOUT replacement
    (Efraimidis & Spirtes 2006, algorithm A-ES): every row gets the key
    ``-ln(u) / w`` with ``u = (splitmix64(id) + 1) / 2^63 in (0, 1]``,
    and the ``k`` smallest keys are an exact weight-proportional WOR
    sample — the temperature-/size-weighted corpus sampling step of a
    data-mixing pipeline (upweight long or high-quality documents
    without replacement artifacts). With ``strata_col``, k rows per
    stratum. Rows with NULL or non-positive weight are outside the
    algorithm's domain and are dropped.

    Deterministic and retry-stable: u is a pure function of (id, seed),
    every arithmetic step is a correctly-rounded IEEE op shared by any
    replaying engine, and the key is cast to float32 BEFORE ranking
    (the collocations convention — absorbs the <=1-ulp ln() spread)
    with ties broken by id.

    Scale shape: map-only key computation (one Arrow-batched splitmix64
    UDF on the 8-byte id, everything after in codegen), then the global
    top-k plans as TakeOrderedAndProject — per-partition bounded heaps
    merged on the driver, never a single-partition sort; the stratified
    variant is ONE stratum-keyed window shuffle (rank streams, O(1)
    state per stratum, same as exact_k_sample).
    """
    if k < 1:
        raise ValueError(f"weighted_sample: k must be >= 1, got {k}")
    if key_col in df.columns:
        raise ValueError(f"input already carries the key column {key_col!r}")
    from .ann import mix64

    @F.pandas_udf(LongType())
    def mixv(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    w = F.col(weight_col).cast("double")
    u = (mixv(F.col(id_col).cast("long")).cast("double") + F.lit(1.0)) \
        / F.lit(9223372036854775808.0)   # 2^63, exact as a double
    keyed = (df.filter(F.col(weight_col).isNotNull() & (w > 0.0))
               .withColumn(key_col, (-F.log(u) / w).cast("float")))
    if strata_col is None:
        return keyed.orderBy(F.col(key_col).asc(), F.col(id_col).asc()) \
                    .limit(int(k))
    win = Window.partitionBy(strata_col).orderBy(
        F.col(key_col).asc(), F.col(id_col).asc())
    return (keyed.withColumn("__rk__", F.row_number().over(win))
                 .filter(F.col("__rk__") <= int(k))
                 .drop("__rk__"))


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions_ppm: dict[str, int], default_ppm: int = 0,
                      seed: int = 42) -> DataFrame:
    """Deterministic per-stratum sampling for data mixing: keep a row
    iff splitmix64(id) mod 1e6 < fractions_ppm[stratum]. Fractions are
    parts-per-million integers so the predicate is exact (no float
    compare) and cross-engine reproducible.

    Map-only and shuffle-free — membership is a pure function of
    (id, stratum), so the sample is stable under retries, resumes, and
    re-partitioning, unlike df.sample() whose output depends on the
    partitioning. The splitmix64 finalizer decorrelates the keep set
    from any id structure (sequential crawl ids, host-prefixed ids).
    """
    bucket = _mix_bucket_udf(seed, 1_000_000)
    limit = F.lit(default_ppm)
    for key, ppm in sorted(fractions_ppm.items()):
        limit = F.when(F.col(strata_col) == key, F.lit(int(ppm))).otherwise(limit)
    return (df.withColumn("__bkt__", bucket(F.col(id_col).cast("long")))
              .filter(F.col("__bkt__") < limit)
              .drop("__bkt__"))


def dedup_apply(docs: DataFrame, pairs: DataFrame, id_col: str,
                left_col: str = "id_a", right_col: str = "id_b") -> DataFrame:
    """Keep-one-per-cluster: resolve the duplicate-pair graph to
    connected components (dedup.dedup_clusters: min-label + pointer
    jumping) and keep only each cluster's canonical member (the min
    id). Returns the surviving rows of ``docs`` unchanged.

    The anti-join ships only ids; at web scale the loser set is the
    ~30-50% of the corpus dedup typically removes, keyed by 8-byte ids
    — small next to the document payload it prunes.
    """
    from .dedup import dedup_clusters

    cl = dedup_clusters(pairs, left_col, right_col)
    losers = (cl.filter(F.col("id") != F.col("cluster_id"))
                .select(F.col("id").alias(id_col)))
    return docs.join(losers, on=id_col, how="left_anti")


def mixing_stats(docs: DataFrame, strata_col: str, id_col: str,
                 text_col: str) -> DataFrame:
    """Per-stratum corpus mixing report: document/token/char totals and
    each stratum's integer token share in ppm — the input to a mixing-
    weight decision (what fraction of each source/language the training
    run draws). All sums are exact integers (token counts), so the
    report is bit-reproducible; the share is integer division, not a
    float ratio. One aggregation; the global total rides a window over
    the (tiny) per-stratum frame.
    """
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = (docs.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("long")).alias("n_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("n_chars"),
        F.min(F.length(text_col)).cast("long").alias("min_chars"),
        F.max(F.length(text_col)).cast("long").alias("max_chars")))
    total = F.sum("n_tokens").over(Window.partitionBy())
    # decimal multiply: n_tokens * 1e6 overflows int64 past ~9.2e12
    # tokens — below a 100 TB corpus's ~2.5e13; DECIMAL(38,0) keeps the
    # share exact at any scale (the DuckDB mirror uses HUGEINT)
    return (per.withColumn("__tot__", total)
               .withColumn("token_share_ppm",
                           F.expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) "
                                  "* 1000000) DIV __tot__ AS BIGINT)"))
               .drop("__tot__"))


def tfidf_topk_terms(docs: DataFrame, id_col: str, text_col: str,
                     k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — keyword extraction for
    topic bucketing / quality filtering. Returns (id, term, tf,
    idf_ppm, score, rank).

    IDF is the integer ratio ``(N * 1e6) DIV doc_freq`` (N = corpus
    size) rather than a log: monotone in 1/df, so ranks are the
    classic TF-IDF ranks for any fixed df, and every arithmetic step
    is exact integers — bit-reproducible across engines and cluster
    layouts, no transcendental parity to defend. Ties break on the
    term string.

    Plan shape: explode -> (doc, term) counts (map-side combine) ->
    term doc-frequency (second small agg) -> join back on the term ->
    per-doc top-k window. The join key is the term string; at corpus
    scale the doc-frequency side is Zipf-bounded (vocab << corpus) and
    usually broadcastable, but the shuffle join is the safe default.
    """
    n_docs = docs.count()   # one scalar action; N is a job parameter
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    tf = (docs.select(F.col(id_col), F.explode(words).alias("term"))
              .groupBy(id_col, "term").agg(F.count("*").alias("tf"))
              .persist())   # feeds both the df agg and the join back
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df__"))
    scored = (tf.join(dfreq, on="term")
                .withColumn("idf_ppm",
                            F.expr(f"CAST({n_docs} AS BIGINT) * 1000000 "
                                   f"DIV __df__"))
                .withColumn("score", F.col("tf") * F.col("idf_ppm")))
    win = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                             F.col("term").asc())
    return _attach_cached(
        scored.withColumn("rank", F.row_number().over(win))
              .filter(F.col("rank") <= k)
              .select(id_col, "term", "tf", "idf_ppm", "score", "rank"), tf)


def unigram_logprob(docs: DataFrame, id_col: str, text_col: str,
                    vocab_size: int = 65536) -> DataFrame:
    """Per-document mean unigram log-probability — the lightweight
    stand-in for the LM-perplexity quality filter of CCNet (Wenzek et
    al. 2020): boilerplate and gibberish score far from fluent prose
    under even a unigram model. Returns (id, n_words, logprob_mean32).

    The model is the corpus itself: p(w) = count(w)/total over the top
    ``vocab_size`` words (deterministic count-then-term tiebreak);
    rarer words take the floor probability 1/total. The per-document
    sum folds over terms sorted by word (array_sort -> aggregate), so
    the float additions happen in a defined order; the mean is cast to
    float32, absorbing the <=1-ulp ln() differences between math
    libraries (same trick the CRS transforms use — see
    sources/tpch_geo.py).

    Scale: the vocab is bounded and broadcast; everything else is one
    explode-aggregate and a per-doc fold.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = (docs.select(F.col(id_col), F.explode(words).alias("w"))
                    .persist())   # scanned for counts AND the lp join
    counts = exploded.groupBy("w").agg(F.count("*").alias("c")).persist()
    total = counts.agg(F.sum("c")).first()[0]   # materializes both
    vocab = (counts.orderBy(F.col("c").desc(), F.col("w").asc())
                   .limit(vocab_size))
    per = (exploded.join(F.broadcast(vocab), on="w", how="left")
                   .withColumn("__lp__", F.log(
                       F.coalesce(F.col("c"), F.lit(1)).cast("double")
                       / F.lit(float(total)))))
    folded = (per.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("w"), F.col("__lp__")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__lp__"]).alias("__sum__")))
    return _attach_cached(
        folded.select(
            id_col, "n_words",
            (F.col("__sum__") / F.col("n_words")).cast("float")
             .alias("logprob_mean32")), exploded, counts)


def bigram_logprob(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram log-probability — one rung up the
    CCNet-style LM-quality ladder from :func:`unigram_logprob`: word
    ORDER now matters, so shuffled/boilerplate-stitched text scores
    below fluent prose even when its word histogram looks normal.

    The model is the corpus itself (maximum-likelihood conditionals):
    p(w2|w1) = c(w1 w2) / c(w1·) where c(w1·) counts w1 as a bigram
    PREFIX — scoring the corpus it was counted from, every bigram is
    in the model by construction, so no smoothing term exists to
    drift between engines. Returns (id, n_bigrams, logprob_mean32);
    docs with < 2 words have no bigram and are absent.

    Scale shape: one explode to (doc, bigram) rows, two combining
    count aggs (bigram table, prefix table), a shuffle join back keyed
    by the bigram string (Zipf-bounded model side, AQE handles hot
    boilerplate bigrams), and the per-doc fold sorted by bigram for a
    defined float addition order; the float32 mean absorbs <=1-ulp
    ln() differences (the unigram_logprob convention).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat(F.element_at(words, i), F.lit("\x1f"),
                           F.element_at(words, i + 1)))
    bigr = (docs.filter(F.size(words) >= 2)
                .select(F.col(id_col), F.explode(pairs).alias("b"))
                .withColumn("w1", F.substring_index(F.col("b"), "\x1f", 1))
                .persist())   # feeds both count aggs and the join back
    cb = bigr.groupBy("b").agg(F.count("*").alias("c12"))
    cw = bigr.groupBy("w1").agg(F.count("*").alias("c1"))
    per = (bigr.join(cb, on="b")
               .join(cw, on="w1")
               .withColumn("__lp__", F.log(
                   F.col("c12").cast("double")
                   / F.col("c1").cast("double"))))
    folded = (per.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("b"), F.col("__lp__")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__lp__"]).alias("__sum__")))
    return _attach_cached(
        folded.select(
            id_col, "n_bigrams",
            (F.col("__sum__") / F.col("n_bigrams")).cast("float")
             .alias("logprob_mean32")), bigr)


def kneser_ney_bigrams(docs: DataFrame, text_col: str,
                       discount: float = 0.75, k: int = 500) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram model (Kneser & Ney
    1995; Chen & Goodman 1999 eq. 4.25, absolute discount, bigram
    order) over the corpus — the classical n-gram LM that perplexity
    gates (CCNet-style quality filtering) actually train:

        P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1·)
                   + (D * N1+(w1,·) / c(w1·)) * (N1+(·,w2) / T)

    where c(w1·) is w1's bigram-prefix token count, N1+(w1,·) its
    distinct continuations, N1+(·,w2) the distinct histories of w2 (the
    continuation probability's numerator — the KN insight: "Francisco"
    is frequent but follows only "San"), and T the number of distinct
    bigram types. Returns the top-``k`` bigrams by count —
    (w1, w2, c12, p_kn), tie-broken on (w1, w2) so the cutoff is total.

    Exactness: every input is an exact integer < 2^53 and the smoothing
    chain is pure +,-,*,/ — correctly-rounded IEEE ops any engine
    replays bit-for-bit given the same expression tree (no
    transcendental, so no float32 absorption needed).

    Scale shape: one explode to bigram rows, ONE combining count to the
    Zipf-bounded (w1, w2, c12) type table, two combining re-aggs of
    that table (prefix stats, continuation counts), one single-row type
    count broadcast back, joins keyed by word strings, and a global
    top-k via orderBy().limit(k) = TakeOrderedAndProject. The corpus is
    touched once; everything after the first agg is type-table-sized.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.struct(F.element_at(words, i).alias("w1"),
                           F.element_at(words, i + 1).alias("w2")))
    tab = (docs.filter(F.size(words) >= 2)
               .select(F.explode(pairs).alias("p"))
               .select("p.w1", "p.w2")
               .groupBy("w1", "w2").agg(F.count("*").alias("c12"))
               .persist())
    pre = tab.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                F.count("*").alias("n1"))
    cont = tab.groupBy("w2").agg(F.count("*").alias("n2"))
    types = tab.agg(F.count("*").alias("tt"))
    d = F.lit(float(discount))
    p_kn = (F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
            / F.col("c1").cast("double")
            + d * F.col("n1").cast("double") / F.col("c1").cast("double")
            * (F.col("n2").cast("double") / F.col("tt").cast("double")))
    out = (tab.join(pre, "w1").join(cont, "w2")
              .crossJoin(F.broadcast(types))
              .select("w1", "w2", F.col("c12").cast("long").alias("c12"),
                      p_kn.alias("p_kn"))
              .orderBy(F.col("c12").desc(), F.col("w1").asc(),
                       F.col("w2").asc())
              .limit(int(k)))
    return _attach_cached(out, tab)


def kn_perplexity(docs: DataFrame, id_col: str, text_col: str,
                  discount: float = 0.75) -> DataFrame:
    """Per-document perplexity under the corpus-trained interpolated
    Kneser-Ney bigram model (:func:`kneser_ney_bigrams`) — the actual
    CCNet-style LM quality gate: documents whose word sequences the
    corpus LM finds surprising (boilerplate soup, shuffled scrapes,
    wrong-language fragments) score high and get filtered/bucketed.
    ppl(d) = exp(-mean ln P_KN(w2|w1)) over d's bigrams. Returns
    (id, n_bigrams, ppl32); docs with < 2 words have no bigram and are
    absent (the bigram_logprob convention). Scoring the training
    corpus itself every bigram is seen, so P_KN > 0 by construction
    and the discount mass only redistributes — no floor needed.

    Scale shape: one explode to per-doc bigram rows (persisted — feeds
    the model counts AND the join back, so the corpus is tokenized
    once), the three Zipf-bounded model re-aggs of kneser_ney_bigrams,
    model joins keyed by word strings, then a per-doc fold sorted by
    (w1, w2, lp) for a defined float addition order; float32 out
    absorbs the <=1-ulp ln/exp engine differences (the unigram_logprob
    convention).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.struct(F.element_at(words, i).alias("w1"),
                           F.element_at(words, i + 1).alias("w2")))
    bigr = (docs.filter(F.size(words) >= 2)
                .select(F.col(id_col), F.explode(pairs).alias("p"))
                .select(id_col, "p.w1", "p.w2")
                .persist())
    tab = bigr.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    pre = tab.groupBy("w1").agg(F.sum("c12").alias("c1"),
                                F.count("*").alias("n1"))
    cont = tab.groupBy("w2").agg(F.count("*").alias("n2"))
    types = tab.agg(F.count("*").alias("tt"))
    d = F.lit(float(discount))
    p_kn = (F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
            / F.col("c1").cast("double")
            + d * F.col("n1").cast("double") / F.col("c1").cast("double")
            * (F.col("n2").cast("double") / F.col("tt").cast("double")))
    scored = (bigr.join(tab, ["w1", "w2"]).join(pre, "w1").join(cont, "w2")
                  .crossJoin(F.broadcast(types))
                  .withColumn("__lp__", F.log(p_kn)))
    folded = (scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(
                F.struct(F.col("w1"), F.col("w2"), F.col("__lp__")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__lp__"]).alias("__sum__")))
    return _attach_cached(
        folded.select(
            id_col, "n_bigrams",
            F.exp(-(F.col("__sum__") / F.col("n_bigrams")))
             .cast("float").alias("ppl32")), bigr)


def collocations(docs: DataFrame, id_col: str, text_col: str,
                 k: int = 50, min_count: int = 2) -> DataFrame:
    """Top-k PMI collocations: adjacent word pairs occurring together
    far more than their unigram frequencies predict (Church & Hanks
    1990) — the phrase-mining pass of corpus pipelines (multi-word
    expressions, boilerplate phrases, named entities).

    Ranking uses the PMI ratio r = N * c(w1 w2) / (c(w1) * c(w2))
    (PMI = ln r; ln is monotone so ranks are identical and the ratio
    needs no transcendental). All inputs are exact integers below
    2^53, so the one double division is bit-reproducible; ties break
    on (w1, w2). ``min_count`` floors the bigram count (raw PMI is
    maximized by hapax pairs). Returns (w1, w2, n_pair, ratio32,
    rank).

    Scale shape: two explode + combining-count passes (bigrams,
    unigrams), joins keyed by the word string (Zipf-bounded model
    sides), then a global top-k via ``orderBy().limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition bounded top-k heaps merged on
    the driver, no single-partition sort); rank is attached by a window
    over only the k surviving rows.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.struct(F.element_at(words, i).alias("w1"),
                           F.element_at(words, i + 1).alias("w2")))
    bigr = (docs.filter(F.size(words) >= 2)
                .select(F.explode(pairs).alias("p"))
                .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))
    uni = (docs.select(F.explode(words).alias("w"))
               .persist())   # feeds N and the unigram counts
    cw = uni.groupBy("w").agg(F.count("*").alias("c"))
    n_words = uni.count()
    cb = (bigr.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
              .filter(F.col("n_pair") >= int(min_count)))
    scored = (cb.join(cw.select(F.col("w").alias("w1"),
                                F.col("c").alias("c1")), on="w1")
                .join(cw.select(F.col("w").alias("w2"),
                                F.col("c").alias("c2")), on="w2")
                # each factor cast to double BEFORE multiplying: a long
                # product would silently wrap past 2^63 at web corpus
                # scale (Spark non-ANSI) while the oracle errors
                .withColumn("ratio32",
                            ((F.col("n_pair").cast("double")
                              * F.lit(float(n_words)))
                             / (F.col("c1").cast("double")
                                * F.col("c2").cast("double")))
                            .cast("float")))
    # top-k first (TakeOrderedAndProject: per-partition heaps + driver
    # merge — every bigram does NOT flow through one partition), THEN a
    # rank window over the k surviving rows only (partitionBy a constant
    # makes the bounded k-row partition explicit).
    order = [F.col("ratio32").desc(), F.col("w1").asc(), F.col("w2").asc()]
    topk = scored.orderBy(*order).limit(int(k))
    win = Window.partitionBy(F.lit(0)).orderBy(*order)
    out = (topk.withColumn("rank", F.row_number().over(win))
               .select("w1", "w2", "n_pair", "ratio32", "rank"))
    return _attach_cached(out, uni)


def zipf_fit(docs: DataFrame, id_col: str, text_col: str,
             top_n: int = 100) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: OLS of
    ln(frequency) on ln(rank) across the ``top_n`` most frequent
    tokens — the standard corpus-health diagnostic (natural text slopes
    ~ -1; template/boilerplate-heavy or deduplicated-to-death corpora
    drift visibly). Returns one row (n_top, slope32, intercept32).

    Scale shape: one explode + combining count per token (the
    collocations unigram pass), global top-n via ``orderBy().limit``
    (TakeOrderedAndProject), rank attached over the n survivors only,
    then one tiny aggregation. The four OLS sums are ordered left folds
    over the rank-sorted n-row list (collect_list + array_sort +
    F.aggregate — the idw deterministic-fold convention) so the double
    chain is bit-reproducible in any engine; ln ulps are absorbed by
    the float32 outputs.
    """
    if top_n < 2:
        raise ValueError(f"zipf_fit needs top_n >= 2, got {top_n}")
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    freq = (docs.select(F.explode(words).alias("w"))
                .groupBy("w").agg(F.count("*").alias("n")))
    order = [F.col("n").desc(), F.col("w").asc()]
    top = freq.orderBy(*order).limit(int(top_n))
    win = Window.partitionBy(F.lit(0)).orderBy(*order)
    ranked = (top.withColumn("rank", F.row_number().over(win))
                 .select("rank",
                         F.log(F.col("rank").cast("double")).alias("lx"),
                         F.log(F.col("n").cast("double")).alias("ly")))
    arr = F.array_sort(F.collect_list(F.struct("rank", "lx", "ly")))

    def _fold(a, field):
        return F.aggregate(a, F.lit(0.0),
                           lambda acc, s: acc + s.getField(field))

    agg = ranked.agg(
        F.count("*").cast("long").alias("n_top"),
        _fold(arr, "lx").alias("sx"),
        _fold(arr, "ly").alias("sy"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s.getField("lx")
                    * s.getField("ly")).alias("sxy"),
        F.aggregate(arr, F.lit(0.0),
                    lambda acc, s: acc + s.getField("lx")
                    * s.getField("lx")).alias("sxx"))
    nn = F.col("n_top").cast("double")
    slope = ((nn * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (nn * F.col("sxx") - F.col("sx") * F.col("sx")))
    return agg.select(
        "n_top",
        slope.cast("float").alias("slope32"),
        ((F.col("sy") - slope * F.col("sx")) / nn)
        .cast("float").alias("intercept32"))


def heaps_law(docs: DataFrame, id_col: str, text_col: str,
              n_points: int = 20) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-vocabulary size as a
    function of corpus prefix size, at ``n_points`` evenly spaced
    document-id thresholds — the other classic corpus diagnostic
    (vocabulary should keep growing ~ n^beta; a flattening curve means
    the crawl is re-reading the same template text).

    The curve is computed WITHOUT any prefix re-scan: vocabulary first
    appearance is ``min(doc_id)`` per token (one combining agg over the
    exploded corpus — the only corpus-sized pass), and
    ``vocab(t) = #{tokens: first_doc <= t}`` needs only that
    token-level frame crossed with the tiny broadcast threshold list
    (n_points rows) and one combining count per threshold. Document
    counts per threshold come the same way from the distinct doc-id
    frame. Returns (threshold_doc, n_docs, vocab) — all exact integers.
    """
    if n_points < 1:
        raise ValueError(f"heaps_law needs n_points >= 1, got {n_points}")
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    spark = docs.sparkSession
    lo, hi = docs.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return spark.createDataFrame(
            [], "threshold_doc long, n_docs long, vocab long")
    # n_points evenly spaced id thresholds, always ending at hi
    ths = sorted({int(lo) + (int(hi) - int(lo)) * (i + 1) // int(n_points)
                  for i in range(int(n_points))})
    tdf = F.broadcast(spark.createDataFrame(
        [(t,) for t in ths], "threshold_doc long"))
    first = (docs.select(F.col(id_col).alias("__id__"),
                         F.explode(words).alias("w"))
                 .groupBy("w").agg(F.min("__id__").alias("fdoc")))
    vocab = (first.join(tdf, F.col("fdoc") <= F.col("threshold_doc"))
                  .groupBy("threshold_doc")
                  .agg(F.count("*").alias("vocab")))
    ndocs = (docs.select(F.col(id_col).alias("__id__"))
                 .join(tdf, F.col("__id__") <= F.col("threshold_doc"))
                 .groupBy("threshold_doc")
                 .agg(F.count("*").alias("n_docs")))
    return (ndocs.join(vocab, "threshold_doc", "left")
                 .select("threshold_doc", "n_docs",
                         F.coalesce("vocab", F.lit(0)).alias("vocab")))


_DSIR_P31 = (1 << 31) - 1   # Mersenne-31 modulus of the feature hash


def _dsir_features(docs: DataFrame, id_col: str, text_col: str,
                   n_buckets: int) -> DataFrame:
    """(id, bucket) feature stream: hashed unigrams + word bigrams.

    The bucket hash is a per-character Mersenne-31 polynomial fold
    (h <- (h*257 + ascii(c)) mod 2^31-1, then mod n_buckets) spelled as
    a JVM higher-order expression — no Python, and character-exact so a
    SQL engine replays it verbatim (the fingerprint_udf convention; the
    corpus is verified pure ASCII, where ascii() == byte). A production
    deployment on non-verification data would swap in
    ``xxhash64(gram) pmod n_buckets`` — same semantics, one codegen'd
    call — via the ``bucket_expr`` hook on :func:`dsir_weights`.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    unis = (docs.select(F.col(id_col),
                        F.explode(F.filter(words, lambda w: F.length(w) > 0))
                         .alias("__g__")))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat(F.element_at(words, i), F.lit("\x1f"),
                           F.element_at(words, i + 1)))
    bis = (docs.filter(F.size(words) >= 2)
               .select(F.col(id_col), F.explode(pairs).alias("__g__")))
    g = F.col("__g__")
    h = F.aggregate(
        F.sequence(F.lit(1), F.length(g)),
        F.lit(0).cast("long"),
        lambda a, i: (a * 257 + F.ascii(F.substr(g, i, F.lit(1))))
        % F.lit(_DSIR_P31))
    return (unis.unionByName(bis)
                .select(F.col(id_col),
                        (h % F.lit(int(n_buckets))).cast("int")
                        .alias("bucket")))


def dsir_weights(raw: DataFrame, target: DataFrame, id_col: str,
                 text_col: str, n_buckets: int = 4096,
                 alpha: int = 1) -> DataFrame:
    """DSIR data-selection importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — public):
    score every raw-corpus document by how target-like its hashed
    n-gram profile is, ``w(doc) = sum over features of
    ln(p_target(bucket) / p_raw(bucket))`` under add-``alpha``-smoothed
    bag-of-hashed-ngrams models (unigrams + word bigrams hashed into
    ``n_buckets``). Selecting the top-weight (or Gumbel-resampled) slice
    of a web crawl against a trusted target corpus (e.g. its en/wiki
    subset) is the standard pretraining-data-curation step between
    quality filtering and mixing. Returns ``(id_col, n_feats,
    dsir_weight32)``; docs with no feature (empty text) are absent.

    Scale shape (100 TB raw corpus, bounded target): the two model
    tables are combining count aggs over the feature stream, each at
    most ``n_buckets`` rows — broadcast material by construction, so
    model lookup is a BROADCAST join, never a shuffle of the corpus.
    The per-doc profile is pre-reduced by a combining
    ``groupBy(id, bucket)`` (Zipf repetition collapses map-side), so
    the only corpus-sized shuffles carry (id, bucket[, cnt]) longs —
    document text never moves. Determinism: every division is a
    correctly-rounded op on exact integers, the per-doc sum folds in
    bucket order (buckets unique per doc after the pre-reduce), and the
    final float32 cast absorbs the <=1-ulp ln() spread between engines
    (the bigram_logprob convention).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if alpha < 1:
        raise ValueError(f"alpha must be a positive integer, got {alpha}")
    rf = _dsir_features(raw, id_col, text_col, n_buckets).persist()
    tf = _dsir_features(target, id_col, text_col, n_buckets)
    rc = rf.groupBy("bucket").agg(F.count("*").alias("__cr__")).persist()
    tc = tf.groupBy("bucket").agg(F.count("*").alias("__ct__"))
    n_raw = rc.agg(F.sum("__cr__")).first()[0] or 0
    n_tgt = tc.agg(F.sum("__ct__")).first()[0] or 0
    a, b = int(alpha), int(n_buckets)
    model = (rc.join(tc, on="bucket", how="left")
               .select("bucket",
                       F.log(((F.coalesce(F.col("__ct__"), F.lit(0)) + a)
                              .cast("double") / F.lit(float(n_tgt + a * b)))
                             / ((F.col("__cr__") + a).cast("double")
                                / F.lit(float(n_raw + a * b))))
                       .alias("__lp__")))
    docb = rf.groupBy(id_col, "bucket").agg(F.count("*").alias("__cnt__"))
    per = docb.join(F.broadcast(model), on="bucket")
    folded = per.groupBy(id_col).agg(
        F.sum("__cnt__").alias("n_feats"),
        F.aggregate(
            F.array_sort(F.collect_list(
                F.struct(F.col("bucket"), F.col("__cnt__"), F.col("__lp__")))),
            F.lit(0.0),
            lambda acc, s: acc + s["__cnt__"].cast("double") * s["__lp__"])
        .cast("float").alias("dsir_weight32"))
    return _attach_cached(folded.select(id_col, "n_feats", "dsir_weight32"),
                          rf, rc)


_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = ("fbclid", "gclid", "ref")


def normalize_url(url: Column) -> Column:
    """Canonical URL (the dedup key of a crawl frontier): lowercase
    scheme and host, strip ``www.``, drop the fragment, remove tracking
    parameters (utm_*, fbclid, gclid, ref), sort surviving query
    parameters. Two pages differing only in these never differ in
    content, so canonicalization before exact/URL dedup collapses the
    recrawl noise that dominates raw crawls.

    Pure JVM string/HOF expressions (split / substring_index /
    filter / array_sort) — no regex beyond what both engines share, no
    Python, composes inside whole-stage codegen. Assumes an absolute
    URL with an explicit ``scheme://``.
    """
    nofrag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(nofrag, "://", 1))
    # split on the FIRST occurrence of each delimiter — a query value
    # may itself contain '://' or '?' (redirect/next params), and a
    # last-occurrence split would replace the host with query text
    sep = F.instr(nofrag, "://")
    hostpath = F.when(sep > 0,
                      nofrag.substr(sep + 3, F.length(nofrag))
                      ).otherwise(nofrag)
    # a URL may carry a query with NO path ('host?a=1'): the host ends at
    # the first '/' OR '?', whichever comes first — insert the implied
    # '/' so the host never swallows the query string
    q0 = F.instr(hostpath, "?")
    s0 = F.instr(hostpath, "/")
    hostpath = F.when((q0 > 0) & ((s0 == 0) | (q0 < s0)),
                      F.concat(hostpath.substr(F.lit(1), q0 - 1), F.lit("/"),
                               hostpath.substr(q0, F.length(hostpath)))
                      ).otherwise(hostpath)
    rawhost = F.lower(F.substring_index(hostpath, "/", 1))
    host = F.when(rawhost.startswith("www."),
                  rawhost.substr(F.lit(5), F.length(rawhost))
                  ).otherwise(rawhost)
    slash = F.instr(hostpath, "/")
    pathq = F.when(slash > 0,
                   hostpath.substr(slash, F.length(hostpath))
                   ).otherwise(F.lit("/"))
    path = F.substring_index(pathq, "?", 1)
    qpos = F.instr(pathq, "?")
    query = F.when(qpos > 0,
                   pathq.substr(qpos + 1, F.length(pathq))).otherwise(F.lit(""))
    def _param_keep(x):
        cond = x != ""
        for p in _TRACKING_PREFIXES:
            cond = cond & ~x.startswith(p)
        name = F.substring_index(x, "=", 1)
        for p in _TRACKING_PARAMS:
            cond = cond & (name != p)
        return cond

    keep = F.filter(F.split(query, "&"), _param_keep)
    qnorm = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")))


def bpe_train(docs: DataFrame, id_col: str, text_col: str,
              num_merges: int, merge_passes: int = 3,
              max_word_len: int = 64, return_table: bool = False):
    """Distributed BPE tokenizer training (Sennrich et al. 2016 — the
    merge-rule learning a training-data pipeline runs before token
    counting / packing). Returns the learned merge table as
    ``[(round, left, right, merged, pair_count), ...]``.

    The classic scalable formulation: the corpus collapses ONCE into a
    (word, freq) table — Zipf-bounded, orders of magnitude smaller than
    the corpus and still distributed — and every merge round operates on
    that table only. Per round: adjacent-symbol pairs explode from each
    word (weighted by freq), ONE combining count aggregation, the argmax
    pair comes back via ``orderBy().limit(1)`` (TakeOrderedAndProject —
    per-partition top-1 + driver merge, deterministic tie-break: highest
    count, then lexicographically smallest pair), and the merge applies
    as a pure-JVM literal ``replace`` over the space-joined symbol
    string. No Python touches row data at any point.

    Merge application runs ``merge_passes`` left-to-right
    non-overlapping replace passes. One pass already equals canonical
    greedy BPE except on runs of 4+ identical symbols (replace consumes
    the shared separator space); each extra pass doubles the handled run
    length, so the default 3 passes are exact for runs < 8 — beyond
    that the result is still deterministic and engine-portable, just not
    canonical (SentencePiece's max-length caps make such runs moot).
    Words longer than ``max_word_len`` chars are dropped up front (the
    standard max-sentencepiece-length guard; also bounds symbol-array
    width). Each word carries an ``</w>`` end marker, per the paper.
    ``return_table=True`` additionally returns the final (freq, sym)
    word table for inspection / tokenizer application.

    100 TB shape: one corpus-wide shuffle total (the word-freq groupBy,
    map-side combined); each round then shuffles only the pair counts of
    the word table, broadcasts nothing, and applies the merge map-only.
    ``localCheckpoint`` pins the word table per round so lineage stays
    O(1) like graph.py's iterations.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if merge_passes < 1:
        raise ValueError(f"merge_passes must be >= 1, got {merge_passes}")
    word = F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    words = (docs.select(word)
                 .filter((F.col("word") != "")
                         & (F.length("word") <= max_word_len))
                 .groupBy("word").agg(F.count("*").alias("freq")))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1))
    sym = F.concat(F.lit(" "),
                   F.array_join(F.concat(chars, F.array(F.lit("</w>"))), " "),
                   F.lit(" "))
    tbl = words.select("freq", sym.alias("sym")).localCheckpoint()
    merges = []
    for rnd in range(1, num_merges + 1):
        syms = F.split(F.trim(F.col("sym")), " ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(" ", F.element_at(syms, i),
                                  F.element_at(syms, i + 1)))
        top = (tbl.select(F.explode(pairs).alias("pair"), "freq")
                  .groupBy("pair").agg(F.sum("freq").alias("cnt"))
                  .orderBy(F.desc("cnt"), F.asc("pair"))
                  .limit(1).collect())
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        left, right = pair.split(" ", 1)
        merged = left + right
        merges.append((rnd, left, right, merged, cnt))
        col = F.col("sym")
        for _ in range(merge_passes):
            col = F.replace(col, F.lit(f" {left} {right} "),
                            F.lit(f" {merged} "))
        tbl = tbl.select("freq", col.alias("sym")).localCheckpoint()
    return (merges, tbl) if return_table else merges


def bpe_encode(docs: DataFrame, id_col: str, text_col: str,
               merges: list[tuple], merge_passes: int = 3,
               max_word_len: int = 64, extra_cols: tuple = (),
               return_symbols: bool = False) -> DataFrame:
    """Apply a learned BPE merge table (from ``bpe_train``) to every
    document and count the resulting tokens — the tokenizer-application
    / token-budget stage of a training pipeline.

    Entirely map-only JVM: each document becomes one space-joined
    symbol string (per-word chars + ``</w>`` markers — the marker
    terminates every word, so no merge can ever span a word boundary),
    then the k merges apply IN LEARNED ORDER as ``k x merge_passes``
    chained literal replaces inside a single codegen stage. Zero
    shuffles, zero Python; token counts come straight off the final
    string. Words longer than ``max_word_len`` are dropped, matching
    the training-side cap.

    Returns ``(id_col, *extra_cols, n_words, n_bpe_tokens)`` (+ ``sym``
    when ``return_symbols`` — test/debug only; at scale the symbol
    string is corpus-sized and should not be materialized downstream).
    """
    if merge_passes < 1:
        raise ValueError(f"merge_passes must be >= 1, got {merge_passes}")
    words = F.filter(
        F.split(F.col(text_col), r"\s+"),
        lambda w: (w != "") & (F.length(w) <= max_word_len))
    per_word = F.transform(
        words,
        lambda w: F.concat(
            F.transform(F.sequence(F.lit(1), F.length(w)),
                        lambda i: F.substring(w, i, 1)),
            F.array(F.lit("</w>"))))
    sym = F.concat(F.lit(" "),
                   F.array_join(F.flatten(per_word), " "), F.lit(" "))
    for _, left, right, merged, _cnt in merges:
        for _ in range(merge_passes):
            sym = F.replace(sym, F.lit(f" {left} {right} "),
                            F.lit(f" {merged} "))
    toks = F.split(F.trim(sym), " ")
    n_tokens = F.when(F.trim(sym) == "", F.lit(0)).otherwise(F.size(toks))
    out = docs.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.size(words).alias("n_words"),
        n_tokens.alias("n_bpe_tokens"),
        *([sym.alias("sym")] if return_symbols else []))
    return out


def normalize_unicode(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC by default) — the text-canonicalization
    step a multilingual crawl pipeline runs before hashing/dedup, so
    that NFD 'e'+combining-acute and NFC 'é' (byte-different, render-
    identical) collapse to one form and cannot defeat exact dedup.

    A genuinely byte-level Unicode op, so this is one of the few
    deliberate Python paths: an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (map-only, composes with any plan; both
    CPython and DuckDB's ``nfc_normalize`` implement the same Unicode
    standard, which is what the cross-engine oracle certifies).
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC|NFD|NFKC|NFKD, got {form}")

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: None if t is None
                     else unicodedata.normalize(form, t))

    return norm(text)


def domain_suffixes(host: Column) -> Column:
    """All registrable suffixes of a hostname, most-specific first:
    ``a.b.example`` -> ``[a.b.example, b.example, example]``. Pure JVM
    split + transform/slice HOFs — composes inside codegen."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."))


def filter_blocklist(df: DataFrame, blocklist: DataFrame,
                     url_col: str = "url",
                     domain_col: str = "domain",
                     keep_blocked: bool = False,
                     max_depth: int = 6) -> DataFrame:
    """URL filtering against a domain blocklist — the C4/RefinedWeb
    "bad-domain" stage of a crawl pipeline: a row is blocked when ANY
    suffix of its URL's host (``a.b.example`` -> a.b.example, b.example,
    example) appears in ``blocklist[domain_col]``, so listing a
    registrable domain blocks every subdomain under it, like the UT1 /
    adult-blocklist convention. Hosts deeper than ``max_depth`` labels
    are rejected (raise) rather than silently part-checked.

    Plan shape for 100 TB: one chained BROADCAST LEFT join per suffix
    depth (host depth is bounded — ~3-5 labels — so this is a fixed
    handful of map-side hash probes; the blocklist, even the
    multi-million-entry UT1 list at ~50 MB, ships once per executor).
    The corpus side never shuffles, never explodes, and the whole
    predicate stays in one codegen stage per probe. ``keep_blocked=True``
    inverts the filter (audit mode).
    """
    reserved = [c for c in df.columns if c.startswith("__bl_")]
    if reserved:
        raise ValueError(f"filter_blocklist: input carries reserved "
                         f"column(s) {reserved}")
    bl = F.broadcast(
        blocklist.select(F.col(domain_col).alias("__bl_d__")).distinct())
    host = url_host(F.col(url_col))
    labels = F.split(host, "\\.")
    out = (df.withColumn("__bl_l__", labels)
             .withColumn("__bl_n__", F.size(F.col("__bl_l__"))))
    marks = []
    for k in range(1, max_depth + 1):
        # suffix starting at label k (1-based); null when host is shallower
        sfx = F.when(F.col("__bl_n__") >= k,
                     F.array_join(F.slice(F.col("__bl_l__"), k, 1 << 20),
                                  "."))
        key, mark = f"__bl_s{k}__", f"__bl_m{k}__"
        out = (out.withColumn(key, sfx)
                  .join(bl.withColumnRenamed("__bl_d__", mark),
                        F.col(key) == F.col(mark), "left")
                  .drop(key))
        marks.append(mark)
    blocked = None
    for mark in marks:
        m = F.col(mark).isNotNull()
        blocked = m if blocked is None else (blocked | m)
    keep = blocked if keep_blocked else ~blocked
    # depth guard stays lazy and distributed (no extra scan): assert_true
    # aborts the job on the first too-deep host instead of part-checking it
    depth_ok = F.assert_true(
        F.col("__bl_n__") <= max_depth,
        F.concat(F.lit(f"filter_blocklist: host deeper than max_depth="
                       f"{max_depth} labels: "), F.col(url_col)))
    return (out.filter(F.when(depth_ok.isNull(), keep))
               .drop("__bl_l__", "__bl_n__", *marks))


def write_shards(df: DataFrame, path: str, id_col: str, n_shards: int,
                 seed: int = 42, fmt: str = "parquet",
                 mode: str = "overwrite") -> None:
    """Deterministic training-shard writer: shard(id) = splitmix64(id)
    mod ``n_shards``, written as ``shard=K`` hive directories with one
    file per shard (repartition on the shard value first).

    Why hash shards and not round-robin repartition: the dataloader
    contract for a training run is *fixed shard count, size-balanced,
    reproducible* — a retried/re-run job must land every document in
    the same shard (checkpointable data order), which round-robin
    partitioning does not guarantee. splitmix64 balances shard sizes to
    sqrt-law fluctuations regardless of id structure. The shard column
    doubles as the pushdown key for shard-subset reads
    (``read.parquet(path).filter("shard = 7")`` prunes directories).
    """
    bucket = _mix_bucket_udf(seed, n_shards)
    (df.withColumn("shard", bucket(F.col(id_col).cast("long")))
       .repartition(n_shards, "shard")
       .write.partitionBy("shard").mode(mode).format(fmt).save(path))


def duplicated_ngram_fraction(docs: DataFrame, id_col: str, text_col: str,
                              n: int = 8, min_docs: int = 2) -> DataFrame:
    """Per-document fraction of word ``n``-grams that also occur in
    >= ``min_docs`` - 1 OTHER documents — the document-level signal of
    Lee et al. 2022's ExactSubstr dedup (theirs cuts the duplicated
    spans via a suffix array; at Spark scale the doc-frequency of
    fixed-length windows gives the same "how much of this doc is
    copied" measure as one aggregation). Filter on ``dup_frac`` to drop
    template pages and near-total copies that survive whole-doc hashing.

    Returns (id, n_grams, n_dup_grams, dup_frac). Shuffle keys are
    8-byte gram hashes (two-level distinct agg), then one join back and
    a per-doc rollup; the fraction is a single exact-integer division.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("__ng__"),
    ).select(id_col, F.xxhash64("__ng__").alias("__ngh__")).persist()
    dfreq = (grams.select("__ngh__", id_col).distinct()
                  .groupBy("__ngh__")
                  .agg(F.count("*").alias("__df__")))
    return _attach_cached(
        grams.join(dfreq, on="__ngh__")
             .groupBy(id_col)
             .agg(F.count("*").alias("n_grams"),
                  F.sum((F.col("__df__") >= min_docs).cast("long"))
                   .alias("n_dup_grams"))
             .withColumn("dup_frac",
                         F.col("n_dup_grams").cast("double")
                         / F.col("n_grams")), grams)


def duplicated_spans(docs: DataFrame, id_col: str, text_col: str,
                     w: int = 8, min_occurrences: int = 2) -> DataFrame:
    """ExactSubstr-style duplicated-SPAN detection at word-window
    granularity (Lee et al. 2022 §ExactSubstr — theirs finds 50-token
    repeated substrings with a corpus suffix array; re-expressed for
    Spark as fixed-width sliding windows, which find exactly the spans
    whose every length-``w`` window repeats): a word position is covered
    when some ``w``-word window containing it occurs at least
    ``min_occurrences`` times in the whole corpus (same-document repeats
    count, as in ExactSubstr); maximal runs of covered positions are the
    spans to cut. Complements :func:`duplicated_ngram_fraction` (the
    document-level signal) by returning WHERE the copied material sits,
    so the pipeline can surgically remove boilerplate instead of
    dropping documents.

    Returns (id_col, span_start, span_len) in word offsets, one row per
    maximal span.

    Scale shape: one explode to window rows (~n_words), a combining
    count keyed by the window text (content-addressed shuffle), a
    left-semi join back, and a per-document gaps-and-islands window
    (partitionBy doc id — bounded by document length, never global) to
    merge overlapping windows. At 100 TB the window-string key would be
    a 128-bit hash (identical plan, collision odds ~2^-128-scale); exact
    strings here keep the cross-engine oracle bit-exact.
    """
    if w < 1:
        raise ValueError(f"window width must be >= 1, got {w}")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    wn = F.lit(int(w))
    wins = F.transform(
        F.sequence(F.lit(0), F.size(words) - wn),
        lambda i: F.struct(i.alias("pos"),
                           F.array_join(F.slice(words, i + 1, wn), " ")
                            .alias("g")))
    base = (docs.filter(F.size(words) >= wn)
                .select(F.col(id_col), F.explode(wins).alias("w"))
                .select(id_col, F.col("w.pos").cast("long").alias("__pos__"),
                        F.col("w.g").alias("__g__")))
    dup = (base.groupBy("__g__").agg(F.count("*").alias("__c__"))
               .filter(F.col("__c__") >= int(min_occurrences))
               .select("__g__"))
    hits = base.join(dup, on="__g__", how="left_semi").select(id_col, "__pos__")
    byid = Window.partitionBy(id_col).orderBy("__pos__")
    # gaps-and-islands over window STARTS: all intervals are [pos, pos+w),
    # so a new span begins exactly when the gap to the previous start
    # exceeds w (covered positions stop being consecutive)
    marked = hits.withColumn(
        "__new__",
        (F.col("__pos__") - F.lag("__pos__", 1, -(1 << 40)).over(byid)
         > wn.cast("long")).cast("int"))
    grp = marked.withColumn("__isl__", F.sum("__new__").over(byid))
    return (grp.groupBy(id_col, "__isl__")
               .agg(F.min("__pos__").alias("span_start"),
                    (F.max("__pos__") + wn.cast("long")
                     - F.min("__pos__")).alias("span_len"))
               .select(id_col, "span_start", "span_len"))


def cut_spans(docs: DataFrame, spans: DataFrame, id_col: str,
              text_col: str) -> DataFrame:
    """Apply :func:`duplicated_spans` (or any (id, span_start, span_len)
    word-offset table): delete the spanned words and return the
    surgically cleaned corpus — the ExactSubstr REMOVAL step, the part
    of the pipeline that keeps a document's unique prose while cutting
    its boilerplate. Returns (id_col, text_col, n_words, n_cut); word
    boundaries re-join with single spaces.

    Scale shape: the span table folds to one bounded array per document
    (collect_list partitioned by doc id — span count is bounded by
    document length), a shuffle-or-broadcast equi-join back to the
    corpus, then a pure JVM higher-order filter (position-indexed lambda
    with an exists() over the doc's spans) — no Python anywhere.
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct(F.col("span_start").alias("s"),
                                F.col("span_len").alias("n"))).alias("__sp__"))
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    spans_arr = F.coalesce(F.col("__sp__"),
                           F.array().cast("array<struct<s:long,n:long>>"))
    keep = F.filter(
        words,
        lambda w, i: ~F.exists(
            spans_arr,
            lambda t: (i.cast("long") >= t["s"])
            & (i.cast("long") < t["s"] + t["n"])))
    return (docs.join(sp, on=id_col, how="left")
                .select(F.col(id_col),
                        F.array_join(keep, " ").alias(text_col),
                        F.size(words).cast("long").alias("n_words"),
                        (F.size(words) - F.size(keep)).cast("long")
                         .alias("n_cut")))


# ---------------------------------------------------------------------------
# robots.txt — Robots Exclusion Protocol (crawl-permission filtering)

def robots_rules(robots: DataFrame, host_col: str = "host",
                 robots_col: str = "robots") -> DataFrame:
    """Parse robots.txt bodies into ``(host, allow:boolean, prefix,
    plen)`` rules for the ``*`` user-agent — the 1994 REP subset
    (literal path prefixes; ``*``/``$`` wildcard extensions are out of
    scope and their rules are still collected as literal prefixes,
    documented).

    Grammar handling is the gaps-and-islands trick: a GROUP is a run of
    consecutive ``User-agent`` lines plus the rule lines that follow it
    (until the next such run) — one lag + running-sum window per host,
    then a per-group "does it name *" max. Empty-path rules are dropped
    (``Disallow:`` with no value means allow-all per spec). Comments
    (#...) and unknown directives are ignored.

    Scale shape: robots bodies are per-host tiny; everything here is
    one window shuffle keyed by host + a combining agg — the output
    rule table is what ``robots_filter`` broadcasts."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\r?\n"))
         .alias("idx", "line"))
    # strip comments, then "Directive: value"
    body = F.trim(F.regexp_replace("line", "#.*", ""))
    directive = F.lower(F.regexp_extract(body, "^([A-Za-z-]+)\\s*:", 1))
    value = F.trim(F.regexp_extract(body, "^[A-Za-z-]+\\s*:(.*)$", 1))
    parsed = lines.select("host", "idx", directive.alias("d"),
                          value.alias("v"))
    w = Window.partitionBy("host").orderBy("idx")
    is_ua = (F.col("d") == "user-agent").cast("int")
    run_start = ((is_ua == 1)
                 & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)) \
        .cast("int")
    segged = parsed.withColumn(
        "seg", F.sum(run_start).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    star = (segged.filter((F.col("d") == "user-agent")
                          & (F.col("v") == "*"))
                  .select("host", "seg").distinct())
    rules = (segged.join(star, ["host", "seg"], "left_semi")
                   .filter(F.col("d").isin("allow", "disallow")
                           & (F.col("v") != ""))
                   .select("host",
                           (F.col("d") == "allow").alias("allow"),
                           F.col("v").alias("prefix"),
                           F.length("v").alias("plen")))
    return rules


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url", keep_col: str = "allowed"
                  ) -> DataFrame:
    """Apply robots rules to a URL corpus: adds ``keep_col`` boolean.

    REP precedence: among the host's rules whose prefix matches the
    URL path, the LONGEST wins; on a length tie allow wins; no match
    (or no rules for the host) means allowed.

    Scale shape: rules roll up to ONE array per host (bounded — robots
    files are small by nature) and that table broadcasts; the corpus
    side takes a single BROADCAST left join on host and evaluates the
    longest-match fold per row inside whole-stage codegen. Map-only,
    shuffle-free on the corpus, no join-back."""
    reserved = {c for c in urls.columns
                if c in ("__rb_host__", "__rb_rs__")}
    if reserved:
        raise ValueError(f"robots_filter: reserved columns {reserved}")
    per_host = (rules.groupBy(F.col("host").alias("__rb_host__"))
                     .agg(F.collect_list(
                         F.struct(F.col("prefix").alias("prefix"),
                                  F.col("plen").alias("plen"),
                                  F.col("allow").cast("int").alias("a")))
                          .alias("__rb_rs__")))
    host = url_host(F.col(url_col))
    # scheme is case-insensitive per RFC 3986 (and may contain digits/+/
    # -/.) — url_host already lowercases, so the path extract must too
    path = F.regexp_extract(F.col(url_col),
                            "(?i)^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$", 1)
    path = F.when(path == "", "/").otherwise(path)
    joined = urls.withColumn("__rb_host__", host) \
                 .join(F.broadcast(per_host), "__rb_host__", "left")
    init = F.struct(F.lit(-1).alias("plen"), F.lit(1).alias("a"))
    best = F.aggregate(
        F.col("__rb_rs__"), init,
        lambda acc, r: F.when(
            path.startswith(r["prefix"])
            & ((r["plen"] > acc["plen"])
               | ((r["plen"] == acc["plen"]) & (r["a"] > acc["a"]))),
            F.struct(r["plen"].alias("plen"), r["a"].alias("a")))
        .otherwise(acc))
    return (joined.withColumn(
                keep_col, F.coalesce(best["a"] == 1, F.lit(True)))
                  .drop("__rb_host__", "__rb_rs__"))


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap",
                  key_cols: list | None = None) -> DataFrame:
    """Parse sitemap.org ``<urlset>`` documents (the crawl DISCOVERY
    stage) into one row per ``<url>`` entry: ``(loc, lastmod_ts,
    changefreq, priority_ppm)``. Map-only JVM regexp chain — each
    ``<url>`` block is extracted, then its child elements; lastmod
    accepts bare dates or full W3C datetimes; priority scales to exact
    ppm (no float parse drift). ``<sitemapindex>`` files are just urls
    pointing at more sitemaps — run this again on the fetched children.
    Entries without a ``<loc>`` are dropped (spec: loc is required)."""
    keys = [F.col(c) for c in (key_cols or [])]
    blocks = F.regexp_extract_all(F.col(xml_col),
                                  F.lit(r"(?is)<url>(.*?)</url>"), F.lit(1))
    out = df.select(*keys, F.explode(blocks).alias("__sm__"))
    loc = F.trim(F.regexp_extract("__sm__", r"(?is)<loc>(.*?)</loc>", 1))
    lastmod = F.trim(F.regexp_extract(
        "__sm__", r"(?is)<lastmod>(.*?)</lastmod>", 1))
    # W3C datetime: fractional seconds (any digit count) drop before the
    # parse; seconds-, minutes- and date-precision forms all accepted;
    # junk values null out (try_*) instead of killing the job
    nofrac = F.regexp_replace(lastmod, r"\.\d+", "")
    lastmod_ts = F.coalesce(
        F.try_to_timestamp(nofrac, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(nofrac, F.lit("yyyy-MM-dd'T'HH:mmXXX")),
        F.try_to_timestamp(nofrac, F.lit("yyyy-MM-dd")))
    freq = F.lower(F.trim(F.regexp_extract(
        "__sm__", r"(?is)<changefreq>(.*?)</changefreq>", 1)))
    prio = F.trim(F.regexp_extract(
        "__sm__", r"(?is)<priority>(.*?)</priority>", 1))
    prio_ppm = F.when(prio != "",
                      F.round(prio.try_cast("decimal(8,6)") * 1_000_000)
                       .cast("long"))
    return (out.select(*keys, loc.alias("loc"),
                       lastmod_ts.alias("lastmod_ts"),
                       F.when(freq != "", freq).alias("changefreq"),
                       prio_ppm.alias("priority_ppm"))
               .filter(F.col("loc") != ""))


def fetch_schedule(urls: DataFrame, delays: DataFrame | None = None,
                   url_col: str = "url", t0_s: int = 0,
                   default_delay_s: int = 1) -> DataFrame:
    """Politeness scheduling for a crawl frontier: per host, URLs get
    sequential fetch slots spaced ``Crawl-delay`` seconds apart —
    ``(url, host, slot, fetch_at_s)`` with ``fetch_at_s = t0_s + slot *
    delay(host)``. Slot order is deterministic (url ascending) so a
    re-plan of the same frontier is idempotent.

    ``delays`` is an optional ``(host, delay_s)`` table (e.g. parsed
    from robots.txt Crawl-delay lines); hosts not in it use
    ``default_delay_s``. Scale shape: ONE window shuffle keyed by host
    + a broadcast left join for delays. Per-host serialization is the
    politeness constraint itself — a host with a million URLs takes a
    million delays regardless of cluster size, which is exactly what
    the schedule must express; hot hosts bound wall-clock, not memory
    (the window streams)."""
    reserved = {"host", "slot", "fetch_at_s", "delay_s"} & set(urls.columns)
    if reserved:
        raise ValueError(f"fetch_schedule: reserved columns {reserved}")
    host = url_host(F.col(url_col))
    out = urls.withColumn("host", host)
    w = Window.partitionBy("host").orderBy(url_col)
    out = out.withColumn("slot", F.row_number().over(w) - 1)
    if delays is not None:
        out = out.join(F.broadcast(delays), "host", "left")
        delay = F.coalesce(F.col("delay_s"), F.lit(default_delay_s))
        return out.withColumn("fetch_at_s",
                              F.lit(t0_s) + F.col("slot") * delay) \
                  .drop("delay_s")
    return out.withColumn("fetch_at_s",
                          F.lit(t0_s) + F.col("slot")
                          * F.lit(default_delay_s))


# ---------------------------------------------------------------------------
# Bloom-filter membership — the crawl-frontier / seen-URL set

def _bloom_positions(col: Column, m_bits: int, k: int) -> list:
    """k bit positions for a string value: disjoint 8-hex-char slices of
    sha256 (a hash BOTH engines implement identically, the hash_attr
    convention) mod m_bits. Independent-enough hashes without any
    engine-specific mixer."""
    if k < 1 or k > 8:
        raise ValueError(f"bloom: k must be in 1..8 (got {k})")
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"bloom: m_bits must be a multiple of 64 (got {m_bits})")
    h = F.sha2(col.cast("string"), 256)
    return [F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long")
            % F.lit(m_bits) for j in range(k)]


def bloom_words(df: DataFrame, col: str, m_bits: int = 1 << 20,
                k: int = 3) -> DataFrame:
    """Build a Bloom filter over ``df[col]`` as its nonzero 64-bit words:
    ``(word:int, bits:long)``. The membership structure for incremental
    crawl-frontier dedup: probing a later batch against it needs no scan
    of the original corpus (the approximate twin of
    ``incremental_dedup``'s exact digest index; no false negatives,
    false-positive rate ~ (1 - e^(-k*n/m))^k).

    Scale shape: explode to k 16-byte (word, bitval) rows, ONE combining
    bit_or agg -> at most m_bits/64 rows out, regardless of corpus size.
    Everything stays in whole-stage codegen (sha2/conv/shift exprs)."""
    pos = _bloom_positions(F.col(col), m_bits, k)
    pairs = df.select(F.explode(F.array(*pos)).alias("__bp__"))
    word = F.col("__bp__").cast("long")
    bv = F.call_function("shiftleft", F.lit(1).cast("long"),
                         (word % 64).cast("int"))
    return (pairs.select((word / 64).cast("int").alias("word"),
                         bv.alias("__bv__"))
                 .groupBy("word").agg(F.bit_or("__bv__").alias("bits")))


def bloom_dense(words_df: DataFrame, m_bits: int) -> list:
    """Collect a bloom_words result to the dense word list (length
    m_bits/64) for broadcasting into probes. Bounded by m_bits, never by
    data size."""
    dense = [0] * (m_bits // 64)
    for r in words_df.collect():
        dense[r["word"]] = r["bits"]
    return dense


def bloom_probe(df: DataFrame, col: str, words, k: int = 3,
                hit_col: str = "bloom_hit", m_bits: int | None = None
                ) -> DataFrame:
    """Test each row's ``col`` against a Bloom filter: adds ``hit_col``
    boolean. A hit may be a false positive; a miss is definite.

    ``words`` is either the dense word list from ``bloom_dense`` (small
    filters: ships as an array literal in the plan — keep under ~2^16
    bits or the literal bloats codegen) or the ``bloom_words`` DataFrame
    itself (the scale path: k BROADCAST hash left-joins on the word
    index, one per hash — still shuffle-free on the probe side, and the
    filter size is bounded by executor broadcast memory, not plan size;
    ``m_bits`` is required in this mode)."""
    if isinstance(words, DataFrame):
        if m_bits is None:
            raise ValueError("bloom_probe: m_bits is required when words "
                             "is a DataFrame")
        reserved = {c for c in df.columns if c.startswith("__blm")}
        if reserved:
            raise ValueError(f"bloom_probe: reserved columns {reserved}")
        out = df
        hit = F.lit(True)
        for j, p in enumerate(_bloom_positions(F.col(col), m_bits, k)):
            w = F.broadcast(words.select(
                F.col("word").alias(f"__blmw{j}__"),
                F.col("bits").alias(f"__blmb{j}__")))
            out = out.withColumn(f"__blmw{j}__", (p / 64).cast("int")) \
                     .join(w, f"__blmw{j}__", "left")
            bit = F.call_function(
                "shiftright", F.coalesce(F.col(f"__blmb{j}__"), F.lit(0)),
                (p % 64).cast("int")).bitwiseAND(F.lit(1).cast("long"))
            hit = hit & (bit == 1)
        return out.withColumn(hit_col, hit) \
                  .drop(*[c for j in range(k)
                          for c in (f"__blmw{j}__", f"__blmb{j}__")])
    m_bits = 64 * len(words)
    arr = F.lit(words)
    hit = F.lit(True)
    for p in _bloom_positions(F.col(col), m_bits, k):
        w = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function("shiftright", w, (p % 64).cast("int")) \
            .bitwiseAND(F.lit(1).cast("long"))
        hit = hit & (bit == 1)
    return df.withColumn(hit_col, hit)


def _token_count(text_col: str) -> Column:
    """Whitespace token count, same convention as mixing_stats (empty
    text counts one empty token — consistent cross-engine with
    len(regexp_split_to_array(trim(text), '\\s+')))."""
    return F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))),
                          r"\s+")).cast("long")


def chunk_text(docs: DataFrame, id_col: str, text_col: str,
               chunk_tokens: int = 512, overlap: int = 64) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    context-window chunking step of a RAG/embedding/training pipeline
    (the HF tokenizers ``stride`` convention). Returns one row per
    chunk::

        (id, chunk_idx, n_tokens, chunk_text)

    Tokens are whitespace words (the ``mixing_stats`` counting
    convention); windows start every ``chunk_tokens - overlap`` words; a
    trailing window is emitted only if it reaches PAST the previous
    window's end (no chunk is a suffix of its predecessor), so short
    documents yield exactly one chunk and empty documents none.

    Scale shape: map-only, shuffle-free — one pure-JVM whole-stage pass
    (split / sequence / slice / array_join HOF expressions, no Python),
    so it pipelines into the downstream embed/pack stage with zero extra
    exchanges, and chunk identity is a pure function of (id, text) — a
    re-run after failure reproduces the same chunk keys (idempotent
    resume, same property as ``stratified_sample``).
    """
    chunk_tokens, overlap = int(chunk_tokens), int(overlap)
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    # filter empty fragments instead of trim(): trim strips SPACES only,
    # so text starting/ending with \n or \t would contribute a phantom
    # '' token that shifts every chunk boundary
    words = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                     lambda t: t != F.lit(""))
    n = F.size(words)
    # candidate starts 0, stride, 2*stride, ... < n; keep a start only if
    # its window extends past the previous window's end (s - stride +
    # chunk_tokens < n) so the tail never re-emits a pure suffix
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s - stride + chunk_tokens < n))
    base = (docs.select(F.col(id_col), F.col(text_col), n.alias("__n__"))
                .filter(F.col("__n__") > 0)
                .select(id_col, text_col,
                        F.posexplode(starts).alias("chunk_idx", "__s__")))
    piece = F.slice(words, F.col("__s__") + 1, chunk_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


def quality_classifier(docs: DataFrame, id_col: str, text_col: str,
                       weights: list[float] | None = None, bias: float = 0.0,
                       threshold: float = 0.0, dim: int = 1024) -> DataFrame:
    """fastText-style hashed linear document scorer — the model-based
    quality-filter stage of CCNet / DCLM pipelines (Wenzek et al. 2020;
    Li et al. 2024): each token hashes to a weight, the document score is
    the mean token weight plus a bias, ``keep`` thresholds it. Returns
    (id, score, keep); empty/null documents score NULL.

    Two weight sources:

    * ``weights`` (a learned model): the hashing trick — bucket =
      int(sha256(token)[:8 hex]) mod ``dim``, weight = weights[bucket].
      ``dim`` floats inline into the plan as an array literal (a real
      fastText bigram model is ~10^6 buckets — still a few MB, and the
      literal ships once per task, not per row).
    * default (``weights=None``): deterministic pseudo-weights derived
      from hex digits 9..16 of the token's sha256 — the cross-engine
      reproducible mode the DuckDB oracle mirrors (a stand-in proving
      the plumbing; swap in learned weights for a real filter).

    Scale shape: map-only and shuffle-free — tokenize/hash/fold are all
    JVM HOF expressions (sha256 per token is the same per-row cost the
    exact-dedup digest already pays), composing with any downstream plan.
    The per-doc fold runs in document token order, so the float sum is
    bit-reproducible run-to-run and across engines.
    """
    # empty fragments filtered, not trim()-ed: leading \n/\t would
    # otherwise add a phantom '' token whose sha-weight skews the mean
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != F.lit(""))
    if weights is None:
        def wexpr(tok):
            h = F.conv(F.substring(F.sha2(tok, 256), 9, 8), 16, 10).cast("long")
            return (h % 2001 - 1000) / F.lit(1000.0)
    else:
        if len(weights) != int(dim):
            raise ValueError(f"weights must have dim={dim} entries, got {len(weights)}")
        # single ArrayType literal, NOT F.array(*[F.lit(w) ...]): a real
        # fastText model is ~10^6 buckets, and a million-child CreateArray
        # costs a py4j call per element plus a million-node tree for the
        # analyzer; one Literal ships once per task either way
        warr = F.lit([float(w) for w in weights])

        def wexpr(tok):
            b = F.conv(F.substring(F.sha2(tok, 256), 1, 8), 16, 10).cast("long")
            return F.element_at(warr, (b % dim + 1).cast("int"))
    ws = F.transform(toks, wexpr)
    total = F.aggregate(ws, F.lit(0.0), lambda a, x: a + x)
    score = F.when(F.size(toks) > 0,
                   F.lit(float(bias)) + total / F.size(toks))
    return docs.select(
        F.col(id_col), score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"))



def _two_phase_offsets(df, k: int, order_cols: list, measure):
    """The shared scaffold of the two-phase distributed prefix
    (pack_sequences offsets, gini_concentration ranks): range-partition
    ``df`` into ``k`` total-order partitions by ``order_cols``, bring
    ONE ``measure`` subtotal per partition to the driver, and return
    ``(ranged, offsets)`` — the persisted ordered frame (with a
    ``__pid__`` column) and the exclusive-prefix base per partition.
    Callers add partition-local running values to their base inside a
    map-only pass; no global window, no single-task sort."""
    ranged = (df.repartitionByRange(k, *order_cols)
                .sortWithinPartitions(*order_cols)
                .withColumn("__pid__", F.spark_partition_id())
                .persist())
    totals = {r["__pid__"]: r["s"] for r in
              ranged.groupBy("__pid__").agg(measure.alias("s")).collect()}
    base, offsets = 0, {}
    for pid in range(int(k)):
        offsets[pid] = base
        base += int(totals.get(pid, 0) or 0)
    return ranged, offsets


def pack_sequences(docs: DataFrame, id_col: str, text_col: str,
                   seq_len: int, seed: int = 42,
                   num_partitions: int | None = None) -> DataFrame:
    """GPT-style sequence packing offsets: concatenate every document
    (in a deterministic splitmix64-shuffled order) into one virtual
    token stream and chunk it into fixed-length training sequences of
    ``seq_len`` tokens, documents straddling boundaries (Brown et al.
    2020 §2.1 packing). Returns per document::

        (id, n_tokens, start_offset, seq_first, seq_last)

    where ``start_offset`` is the document's position in the global
    stream, ``seq_first``/``seq_last`` the training-sequence ids its
    tokens land in. The dataloader contract this feeds needs the
    assignment to be a pure function of the corpus content — stable
    under retries, resumes, and re-partitioning — so the order key is
    splitmix64(id) (decorrelates crawl-id structure; the same mix the
    sampling/shard ops use), never a nondeterministic zipWithIndex.

    Scale shape (the interesting part — a global running sum is the
    textbook "doesn't distribute" trap): one range-repartition shuffle
    of 24-byte (key, id, n_tokens) rows establishes a total order;
    per-partition token subtotals (one map-side agg down to
    #partitions rows) come to the driver, an exclusive prefix over
    them is broadcast back, and a map-only pass adds partition-local
    running sums to the partition's base offset. No global window, no
    single-task sort, no second shuffle: classic two-phase parallel
    prefix sum. Document text never moves — only the three integer
    columns enter the shuffle. (At extreme scale, pack per shard
    instead and prefix seq ids by shard id: drops the global shuffle
    entirely at the cost of shard-local order.)
    """
    from .ann import mix64

    @F.pandas_udf(LongType())
    def _mixkey(ids: pd.Series) -> pd.Series:
        return pd.Series(mix64(ids.to_numpy(np.int64), seed)
                         .astype(np.int64))

    spark = docs.sparkSession
    k = num_partitions or spark.sparkContext.defaultParallelism
    slim = (docs.select(F.col(id_col).cast("long").alias("__id__"),
                        _token_count(text_col).alias("__nt__"))
                .filter(F.col("__id__").isNotNull())
                # ^ filter AFTER the cast: a string id the cast nulls
                # must not reach the int64 mix UDF
                .withColumn("__key__", _mixkey(F.col("__id__"))))
    # partition subtotals -> driver (k rows) -> exclusive prefix
    ranged, offsets = _two_phase_offsets(
        slim, k, ["__key__", "__id__"], F.sum("__nt__"))

    def _scan(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["__pid__"].iloc[0])]
            nt = pdf["__nt__"].to_numpy(np.int64)
            ends = nt.cumsum() + run
            run = int(ends[-1])
            yield pd.DataFrame({"__id__": pdf["__id__"],
                                "__nt__": pdf["__nt__"],
                                "__start__": ends - nt})

    packed = ranged.mapInPandas(
        _scan, schema="__id__ long, __nt__ long, __start__ long")
    # DIV, not float division: a 100 TB corpus is ~2.5e13 tokens and
    # double division starts dropping ulps past 2^53 — seq ids must be
    # exact integers at any offset
    out = packed.select(
        F.col("__id__").alias(id_col),
        F.col("__nt__").alias("n_tokens"),
        F.col("__start__").alias("start_offset"),
        F.expr(f"__start__ DIV {int(seq_len)}").alias("seq_first"),
        F.expr(f"(__start__ + __nt__ - 1) DIV {int(seq_len)}")
            .alias("seq_last"))
    return _attach_cached(out, ranged)


# PII patterns: the Java (Spark) and RE2 (DuckDB/common tooling) regex
# dialects agree on this subset — character classes, bounded repeats,
# non-capturing groups, \b — so redaction is cross-engine reproducible.
# Applied in order: emails first (their digit runs must not be eaten by
# the phone pattern), then dotted quads, then phone-like digit runs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens — the standard pre-training scrub (C4 and
    successors strip pages on badword lists; modern pipelines redact
    spans instead so the surrounding prose survives). Pure JVM
    regexp_replace chain: map-only, shuffle-free, whole-stage codegen.
    """
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document redaction report: the redacted text plus a count
    per PII class. Counts are taken on the progressively redacted text
    (emails removed before IPs are counted, etc.) so they equal the
    number of replacements actually made, and sum to the total spans
    redacted — double-counting a dotted quad inside an email as both
    classes would break that audit identity.
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col)]
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
                     .cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(*cols, cur.alias("redacted"))


def incremental_dedup(batch: DataFrame, seen_hashes: DataFrame,
                      id_col: str, *content_cols: str) -> DataFrame:
    """Exact dedup of an incoming batch against an already-ingested
    corpus: drop rows whose content digest appears in ``seen_hashes``
    (one column ``content_hash``), then keep min-id per digest within
    the batch. Returns the surviving rows with their ``content_hash``
    attached — append that column back to the digest index to make the
    next batch incremental.

    This is how exact dedup actually runs at 100 TB: the corpus is
    never re-scanned — the digest index (32-byte hash + nothing else)
    is ~0.1% of corpus bytes, the anti-join shuffles only (hash, id),
    and each day's crawl joins against it. Digest convention matches
    operators/dedup.exact_dedup, so an index bootstrapped by a full
    exact_dedup pass is directly reusable.
    """
    from .dedup import content_digest

    hashed = batch.withColumn("content_hash", content_digest(*content_cols))
    fresh = hashed.join(seen_hashes.select("content_hash").distinct(),
                        on="content_hash", how="left_anti").persist()
    # ^ fresh feeds BOTH the min-id agg and the final semi-join probe;
    # without persist the digest + anti-join run twice (cache.release
    # frees it)
    win_min = (fresh.groupBy("content_hash")
                    .agg(F.min(F.col(id_col)).alias(id_col)))
    out = fresh.join(win_min, on=["content_hash", id_col], how="left_semi")
    return _attach_cached(out, fresh)


GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, id_col: str, text_col: str,
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: int = 3, max_mean_word_len: int = 10,
                   max_hash_word_ratio_ppm: int = 100_000,
                   min_alpha_word_ppm: int = 800_000,
                   min_stopwords: int = 2) -> DataFrame:
    """Gopher quality gates (Rae et al. 2021 table A1) as one map-only
    pass: word count bounds, mean word length bounds, '#'-symbol to
    word ratio, fraction of words containing an alphabetic character,
    and a minimum stop-word count. Returns the per-doc signals plus the
    combined ``keep`` flag.

    Every ratio test is an exact integer cross-multiplication (ppm
    thresholds), never a float divide — the keep set is bit-identical
    across engines, retries, and hardware, which a 0.1 float threshold
    straddled by rounding is not. Shuffle-free: pure split/filter HOF
    expressions, whole-stage codegen, composable with repetition_stats
    (the corpus-level duplication gates) by a map-side join on id.
    """
    words = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    lw = F.transform(words, lambda w: F.lower(w))
    n_words = F.size(words).cast("long")
    n_word_chars = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w)).alias("n_word_chars")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_hash = (F.length(txt)
              - F.length(F.replace(txt, F.lit("#"), F.lit("")))
              ).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(F.filter(
        lw, lambda w: w.isin(*GOPHER_STOPWORDS))).cast("long")
    sig = docs.select(
        F.col(id_col), n_words.alias("n_words"),
        n_word_chars.alias("n_word_chars"), n_hash.alias("n_hash"),
        n_alpha.alias("n_alpha_words"), n_stop.alias("n_stopwords"))
    keep = (
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("n_word_chars") >= min_mean_word_len * F.col("n_words"))
        & (F.col("n_word_chars") <= max_mean_word_len * F.col("n_words"))
        & (F.col("n_hash") * 1_000_000
           <= F.lit(max_hash_word_ratio_ppm) * F.col("n_words"))
        & (F.col("n_alpha_words") * 1_000_000
           >= F.lit(min_alpha_word_ppm) * F.col("n_words"))
        & (F.col("n_stopwords") >= min_stopwords))
    return sig.withColumn("keep", keep)


def capture_churn(captures: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  digest_col: str = "digest") -> DataFrame:
    """Per-URL content-churn profile over a multi-capture crawl store —
    the signal a recrawl scheduler feeds on (Cho & Garcia-Molina 2003
    poisson-change estimation; Common Crawl / Wayback stores keep every
    capture, so change history is a pure scan). For each url: capture
    count, how many consecutive-capture pairs changed content digest,
    the change rate, and the observed span.

    One lag window partitioned by url (per-key state, no global sort)
    feeding one combining aggregate — at 10^12 captures the shuffle key
    is the url, skew is bounded by captures-per-url (crawl stores cap
    revisit frequency), and nothing but (url, ts, digest) scalars move.
    ``change_ppm`` is an exact integer cross-multiplication
    (1e6 * changes DIV (n-1)) so the result is bit-identical across
    engines — no float division to defend.

    Returns (url, n_captures, n_changes, change_ppm, first_ts, last_ts);
    single-capture urls report change_ppm = 0.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col)
    prev = F.lag(F.col(digest_col)).over(w)
    changed = (prev.isNotNull()
               & (prev != F.col(digest_col))).cast("long")
    agg = (captures.select(F.col(url_col).alias("url"),
                           F.col(ts_col).alias("__ts__"),
                           changed.alias("__chg__"))
                   .groupBy("url")
                   .agg(F.count("*").alias("n_captures"),
                        F.sum("__chg__").alias("n_changes"),
                        F.min("__ts__").alias("first_ts"),
                        F.max("__ts__").alias("last_ts")))
    rate = F.when(
        F.col("n_captures") > 1,
        F.call_function("div", F.col("n_changes") * 1_000_000,
                        F.col("n_captures") - 1)).otherwise(F.lit(0))
    return agg.select("url", "n_captures", "n_changes",
                      rate.cast("long").alias("change_ppm"),
                      "first_ts", "last_ts")


def crawl_diff(old: DataFrame, new: DataFrame, url_col: str = "url",
               digest_col: str = "digest") -> DataFrame:
    """Snapshot diff between two crawls — which URLs were added,
    removed, changed, or unchanged (the incremental-recrawl report;
    pairs with :func:`capture_churn`, which profiles the full capture
    history instead of two snapshots). Inputs carry one row per url
    (run latest-capture selection upstream when they don't).

    Plan: ONE url-keyed full-outer hash join of two (url, digest)
    projections — at 10^12 urls that is a single co-partitioned
    shuffle of two scalars per row, AQE handles skew, no window, no
    Python. Returns (url, status, old_digest, new_digest) with status
    in ('added', 'removed', 'changed', 'unchanged').
    """
    # explicit presence markers: digest nullity is NOT a presence proxy
    # (a crawl may legitimately store a NULL digest, e.g. fetch errors)
    o = old.select(F.col(url_col).alias("url"),
                   F.col(digest_col).alias("old_digest"),
                   F.lit(True).alias("__in_old__"))
    n = new.select(F.col(url_col).alias("url"),
                   F.col(digest_col).alias("new_digest"),
                   F.lit(True).alias("__in_new__"))
    j = o.join(n, on="url", how="full_outer")
    status = (F.when(F.col("__in_old__").isNull(), F.lit("added"))
               .when(F.col("__in_new__").isNull(), F.lit("removed"))
               .when(~F.col("old_digest").eqNullSafe(F.col("new_digest")),
                     F.lit("changed"))
               .otherwise(F.lit("unchanged")))
    return j.select("url", status.alias("status"),
                    "old_digest", "new_digest")


def trending_terms(docs: DataFrame, text_col: str, bucket_col: str,
                   k: int = 50, min_count: int = 5) -> DataFrame:
    """Burst detection over time-bucketed token counts — the trend-
    mining pass (Kleinberg 2002's burst intuition reduced to the
    mergeable statistic): a term trends in a bucket when its count
    there exceeds its uniform share across buckets,

        lift = n_tb * B / n_t

    (n_tb = term count in the bucket, n_t = corpus-wide term count,
    B = number of buckets). ``min_count`` floors n_tb (hapax spikes
    are noise, same rationale as collocations). Returns the global
    top-k (token, bucket, n_in_bucket, n_total, lift32, rank).

    Scale shape: one token explode + combining (token, bucket) count;
    per-token totals REUSE that count frame (two-level aggregation —
    the corpus is read once); the bucket count B is a one-row
    broadcast; top-k is ``orderBy().limit(k)`` (TakeOrderedAndProject)
    with rank attached over only the k survivors. All counts exact
    integers; the one double chain is fixed-order and lands in
    float32 (the collocations convention).
    """
    if k < 1:
        raise ValueError(f"trending_terms needs k >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = docs.select(F.col(bucket_col).alias("bucket"),
                      F.explode(words).alias("token"))
    ctb = (tok.groupBy("token", "bucket")
              .agg(F.count("*").alias("n_in_bucket"))
              .persist())   # feeds totals, B, and the scored scan
    ct = ctb.groupBy("token").agg(F.sum("n_in_bucket").alias("n_total"))
    nb = ctb.select(F.countDistinct("bucket").alias("__nb__"))
    scored = (ctb.filter(F.col("n_in_bucket") >= int(min_count))
                 .join(ct, on="token")
                 .crossJoin(F.broadcast(nb))
                 .withColumn(
                     "lift32",
                     (F.col("n_in_bucket").cast("double")
                      * F.col("__nb__").cast("double")
                      / F.col("n_total").cast("double")).cast("float")))
    order = [F.col("lift32").desc(), F.col("token").asc(),
             F.col("bucket").asc()]
    topk = scored.orderBy(*order).limit(int(k))
    win = Window.partitionBy(F.lit(0)).orderBy(*order)
    out = (topk.withColumn("rank", F.row_number().over(win))
               .select("token", "bucket", "n_in_bucket", "n_total",
                       "lift32", "rank"))
    return _attach_cached(out, ctb)


def gini_concentration(df: DataFrame, key_col: str,
                       num_partitions: int | None = None) -> DataFrame:
    """Gini coefficient of row concentration over ``key_col`` — the
    domain-diversity governance gate of a web corpus ("is the crawl
    10% example.com?"): 0 = rows spread evenly over keys, -> 1 = one
    key owns everything. Standard exact form over per-key counts x
    sorted ascending with 1-based global rank i::

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    reported as exact-integer ``gini_ppm`` (the tfidf/transition ppm
    convention — no float division to defend across engines). Returns
    one row (n_keys, total_rows, gini_ppm); an empty input yields the
    defined (0, 0, 0) row so threshold gates fail closed.

    Scale shape: one combining count per key (map-side partials absorb
    hot keys), then the global ascending rank via the pack_sequences
    two-phase distributed prefix: range-repartition of the narrow
    (cnt, key) frame, per-partition ROW subtotals to the driver
    (#partitions integers), broadcast base offsets, map-only local
    ranks — no global window, no single-task sort. The rank-weighted
    sums are exact int64 at any realistic key cardinality times corpus
    size below ~2^63 ppm-scaled (a 10^8-host, 10^12-page corpus needs
    the same plan with DECIMAL(38) sums — one cast, shape unchanged).
    """
    spark = df.sparkSession
    k = num_partitions or spark.sparkContext.defaultParallelism
    cnt = (df.groupBy(F.col(key_col).alias("__k__"))
             .agg(F.count("*").alias("__c__")))
    ranged, offsets = _two_phase_offsets(
        cnt, k, ["__c__", "__k__"], F.count("*"))

    def _rank(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["__pid__"].iloc[0])]
            n = len(pdf)
            yield pd.DataFrame({
                "__c__": pdf["__c__"],
                "__i__": np.arange(run + 1, run + n + 1, dtype=np.int64)})
            run += n

    ranked = ranged.mapInPandas(_rank, schema="__c__ long, __i__ long")
    agg = ranked.agg(F.count("*").alias("n"),
                     F.sum("__c__").alias("t"),
                     F.sum(F.col("__i__") * F.col("__c__")).alias("s2"))
    # empty input: a defined (0, 0, 0) row, not NULLs — a governance
    # gate applied as `gini_ppm > threshold` must FAIL-CLOSED on a
    # degenerate slice, never vanish through a NULL comparison
    out = agg.select(
        F.col("n").alias("n_keys"),
        F.coalesce(F.col("t"), F.lit(0)).alias("total_rows"),
        # Spark DIV truncates toward zero; DuckDB // floors. They agree
        # here ONLY because the numerator 2*s2 - (n+1)*t is provably
        # non-negative for ascending ranks i=1..n with non-negative
        # counts (rearrangement inequality: sum(i*c_i) >= (n+1)/2 *
        # sum(c_i) when c is sorted ascending by rank order). Any
        # respelling that can go negative (signed measures, descending
        # ranks) must switch to an explicit floor on both engines.
        F.when(F.col("n") == 0, F.lit(0).cast("long"))
         .otherwise(F.expr("CAST(1000000 * (2 * s2 - (n + 1) * t) "
                           "DIV (n * t) AS BIGINT)")).alias("gini_ppm"))
    return _attach_cached(out, ranged)
