"""WARC (ISO 28500) ingest — the Common-Crawl wire format.

The north-star corpus is "Common-Crawl-style web pages"; this reads the
real thing: WARC files of ``WARC/1.0`` records (headers, blank line,
Content-Length payload bytes, two CRLFs), either plain or in the
standard ``.warc.gz`` layout where EVERY RECORD IS ITS OWN GZIP MEMBER
(that per-record framing is what makes Common Crawl's offsets work; a
whole-file gzip stream also decodes, since members concatenate).

Scale shape: WARC is not block-splittable — parallelism is per FILE
(Common Crawl ships ~1 GB segment files by design, so a crawl dump is
tens of thousands of files and the per-file layout parallelizes fine;
the same bound every WARC reader has, including the reference's
converter-based ingest path). Files arrive through ``binaryFile``; one
``mapInPandas`` pass parses bytes with no per-row Python beyond the
record loop itself.

Returns one row per record:
``(path, rec_type, url, warc_ts, content_type, payload binary)`` —
matching the input-hint shape (url, warc_ts, html payload); run a
convert() spec to extract text / cast types.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["read_warc", "parse_warc_bytes", "build_warc", "write_wet",
           "warc_record_spans", "read_warc_cdx", "wat_metadata",
           "write_wat"]

_CRLF = b"\r\n"


def _gunzip_members(buf: bytes) -> bytes:
    """Decode a concatenation of gzip members (the .warc.gz layout)."""
    out = []
    while buf:
        d = zlib.decompressobj(31)
        out.append(d.decompress(buf))
        out.append(d.flush())
        buf = d.unused_data
    return b"".join(out)


def parse_warc_bytes(buf: bytes):
    """Yield ``(rec_type, url, warc_ts, content_type, payload)`` per
    record of one WARC file (gzip'd or plain). HTTP response records
    carry the full HTTP message as payload; the HTTP headers are split
    off so ``payload`` is the body (the html bytes), matching what a
    Common-Crawl text pipeline consumes."""
    if buf[:2] == b"\x1f\x8b":
        buf = _gunzip_members(bytes(buf))
    else:
        buf = bytes(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: bad record header at byte {pos}")
        hdr_end = buf.index(_CRLF + _CRLF, pos)
        headers = {}
        for line in buf[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers[b"content-length"])
        body = buf[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get(b"warc-type", b"").decode("ascii", "replace")
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        ts = None
        if ts_raw:
            ts = datetime.strptime(
                ts_raw, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
        ctype = headers.get(b"content-type", b"").decode("ascii", "replace")
        if rec_type == "response" and body.startswith(b"HTTP/"):
            # split the HTTP message: payload = body after HTTP headers
            sep = body.find(_CRLF + _CRLF)
            if sep >= 0:
                body = body[sep + 4:]
        yield rec_type, url or None, ts, ctype or None, body


_WARC_SCHEMA = ("path string, rec_type string, url string, "
                "warc_ts timestamp, content_type string, payload binary")


def read_warc(spark, path: str, record_types: tuple = ("response",)
              ) -> DataFrame:
    """Read WARC/WARC.gz files under ``path``; keep ``record_types``
    (default: response records only — the pages). One task per file."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    keep = set(record_types)

    def parse(batches):
        for pdf in batches:
            rows = {k: [] for k in ("path", "rec_type", "url", "warc_ts",
                                    "content_type", "payload")}
            for p, content in zip(pdf["path"], pdf["content"]):
                for rt, url, ts, ct, body in parse_warc_bytes(content):
                    if keep and rt not in keep:
                        continue
                    rows["path"].append(p)
                    rows["rec_type"].append(rt)
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["content_type"].append(ct)
                    rows["payload"].append(body)
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, _WARC_SCHEMA)


def build_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Assemble a WARC file from ``[{url, ts (datetime), body (bytes),
    rec_type?, http?}, ...]`` — fixture/export builder (the inverse of
    the parser, like shapefile.build_shp). ``gzip_members=True`` writes
    the Common-Crawl layout: one gzip member per record."""
    out = []
    for r in records:
        body = r["body"]
        if r.get("http", True):
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b"Content-Length: " + str(len(body)).encode()
                    + b"\r\n\r\n")
            body = http + body
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        ctype = r.get("content_type",
                      "application/http;msgtype=response"
                      if r.get("http", True) else "text/plain")
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: " + r.get("rec_type", "response").encode()
               + b"\r\nWARC-Target-URI: " + r["url"].encode()
               + b"\r\nWARC-Date: " + ts.encode()
               + b"\r\nContent-Type: " + ctype.encode() + b"\r\n"
               + b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n")
        rec = hdr + body + _CRLF + _CRLF
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = c.compress(rec) + c.flush()
        out.append(rec)
    return b"".join(out)


def write_wet(df: DataFrame, path: str, url_col: str = "url",
              ts_col: str = "warc_ts", text_col: str = "text",
              gzip_members: bool = True) -> list:
    """WET export — Common Crawl's extracted-text sidecar format: one
    ``part-<partition>.warc.wet.gz`` of ``conversion`` records
    (Content-Type text/plain, no HTTP message) per partition, written
    EXECUTOR-side like sinks.write_arrow_ipc (rows never pass the
    driver; the collected manifest is one row per partition). Compose
    ``corpus.extract_html_text`` upstream to produce ``text_col`` from
    raw html — together that is the WARC -> WET derivation CC itself
    ships. Read back with ``read_warc(record_types=('conversion',))``.
    Rows with a NULL url/timestamp/text are SKIPPED (a WET record needs
    all three; serializing Python's None repr would corrupt the sidecar).
    Overwrite semantics: the directory is cleared first."""
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ext = "warc.wet.gz" if gzip_members else "warc.wet"

    def dump(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for url, ts, text in zip(pdf[url_col], pdf[ts_col],
                                     pdf[text_col]):
                if url is None or text is None or pd.isna(ts):
                    continue
                recs.append({"url": url, "ts": ts,
                             "body": str(text).encode("utf-8"),
                             "rec_type": "conversion", "http": False})
        if not recs:
            return
        fname = os.path.join(path, f"part-{pid:05d}.{ext}")
        with open(fname, "wb") as f:
            f.write(build_warc(recs, gzip_members=gzip_members))
        yield pd.DataFrame({"file": [fname], "rows": [len(recs)]})

    manifest = df.mapInPandas(dump, "file string, rows long").collect()
    return sorted((r.file, r.rows) for r in manifest)


def warc_record_spans(buf: bytes):
    """Yield the (offset, length) byte span of every record in a WARC
    file — the random-access contract of the public CDX index:
    ``buf[offset:offset+length]`` parses (or gunzips-then-parses) to
    exactly that one record. For ``.warc.gz`` spans are COMPRESSED gzip
    member boundaries (the Common-Crawl one-member-per-record layout);
    for plain WARC they run from the ``WARC/`` header through the
    record's two trailing CRLFs."""
    buf = bytes(buf)
    n = len(buf)
    pos = 0
    if buf[:2] == b"\x1f\x8b":
        while pos < n:
            d = zlib.decompressobj(31)
            d.decompress(buf[pos:])
            d.flush()
            end = n - len(d.unused_data)
            yield pos, end - pos
            pos = end
        return
    while pos < n:
        while pos < n and buf[pos:pos + 2] == _CRLF:
            pos += 2   # leading separators outside any record
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: bad record header at byte {pos}")
        hdr_end = buf.index(_CRLF + _CRLF, pos)
        length = None
        for line in buf[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v.strip())
        end = hdr_end + 4 + length
        for _ in range(2):   # the record's own two trailing CRLFs
            if buf[end:end + 2] == _CRLF:
                end += 2
        yield pos, end - pos
        pos = end


_CDX_SCHEMA = ("path string, url string, warc_ts timestamp, "
               "rec_type string, offset long, length long")


def read_warc_cdx(spark, path: str) -> DataFrame:
    """CDX capture-index rows for WARC files under ``path``: one row
    ``(path, url, warc_ts, rec_type, offset, length)`` per record,
    where (offset, length) is the record's byte span in the stored
    file (compressed member span for .warc.gz). This is the ingest
    half of a Common-Crawl-style CDX index: sort by
    ``surt_key(url), warc_ts`` and write, and any consumer can fetch
    one page from a 100 TB WARC store with a single ranged read —
    no scan, no Spark job.

    Self-certifying by construction: every field is parsed FROM the
    span slice itself, so a row that comes back wrong cannot exist —
    a bad span fails to parse instead (and the round-trip is also
    asserted in tests)."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def index(batches):
        for pdf in batches:
            rows = {k: [] for k in ("path", "url", "warc_ts", "rec_type",
                                    "offset", "length")}
            for p, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                for off, ln in warc_record_spans(content):
                    rec = next(parse_warc_bytes(content[off:off + ln]))
                    rt, url, ts, _ct, _body = rec
                    rows["path"].append(p)
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["rec_type"].append(rt)
                    rows["offset"].append(off)
                    rows["length"].append(ln)
            yield pd.DataFrame(rows)

    return files.mapInPandas(index, _CDX_SCHEMA)


def wat_metadata(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """Derive the WAT metadata sidecar column — Common Crawl's third
    wire format alongside WARC (raw) and WET (text): a JSON envelope of
    per-page metadata (target URI, page title, extracted absolute
    links in the public ``{"path": "A@/href", "url": ...}`` shape).
    This reduced envelope is deliberately timezone-free (the UTC
    WARC-Date lives in the record header build_warc writes, not in the
    JSON), so the bytes are a pure function of (url, html).

    Pure JVM expression chain (regexp extract + to_json over nested
    structs) — map-only, shuffle-free, whole-stage codegen. Returns the
    input plus a ``wat`` JSON string column; write with
    :func:`write_wat`, read back with
    ``read_warc(record_types=("metadata",))``.
    """
    html = F.col(html_col).cast("string")
    title = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    links = F.regexp_extract_all(html, F.lit(r'href="(https?://[^"]+)"'),
                                 F.lit(1))
    env = F.struct(
        F.struct(F.col(url_col).alias("WARC-Target-URI"))
         .alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    title.alias("Title"),
                    F.transform(
                        links,
                        lambda u: F.struct(F.lit("A@/href").alias("path"),
                                           u.alias("url"))).alias("Links"),
                ).alias("HTML-Metadata"),
            ).alias("HTTP-Response-Metadata"),
        ).alias("Payload-Metadata"),
    )
    return pages.withColumn("wat", F.to_json(F.struct(env.alias("Envelope"))))


def write_wat(df: DataFrame, path: str, url_col: str = "url",
              ts_col: str = "warc_ts", wat_col: str = "wat",
              gzip_members: bool = True) -> list:
    """WAT export — ``metadata`` records (Content-Type application/json,
    no HTTP message) holding the :func:`wat_metadata` envelope, one
    ``part-<partition>.warc.wat.gz`` per partition, written
    EXECUTOR-side exactly like :func:`write_wet` (rows never pass the
    driver; returns the per-partition manifest). Rows with a NULL
    url/timestamp/envelope are skipped. Overwrite semantics."""
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ext = "warc.wat.gz" if gzip_members else "warc.wat"

    def dump(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs = []
        for pdf in batches:
            for url, ts, wat in zip(pdf[url_col], pdf[ts_col],
                                    pdf[wat_col]):
                if url is None or wat is None or pd.isna(ts):
                    continue
                recs.append({"url": url, "ts": ts,
                             "body": str(wat).encode("utf-8"),
                             "rec_type": "metadata", "http": False,
                             "content_type": "application/json"})
        if not recs:
            return
        fname = os.path.join(path, f"part-{pid:05d}.{ext}")
        with open(fname, "wb") as f:
            f.write(build_warc(recs, gzip_members=gzip_members))
        yield pd.DataFrame({"file": [fname], "rows": [len(recs)]})

    manifest = df.mapInPandas(dump, "file string, rows long").collect()
    return sorted((r.file, r.rows) for r in manifest)
