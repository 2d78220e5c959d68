"""WARC source (sources/warc.py): synthesized ISO-28500 records, plain
and per-record-gzip, parsed back row-for-row."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from geomesa_spark.sources.warc import (build_warc, parse_warc_bytes,
                                        read_warc)


def _recs(n=3):
    return [{"url": f"https://site{i}.example/p{i}",
             "ts": datetime(2024, 1, 1 + i, 12, 0, i, tzinfo=timezone.utc),
             "body": f"<html><body>page {i}</body></html>".encode()}
            for i in range(n)]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_warc_roundtrip(gz):
    buf = build_warc(_recs(), gzip_members=gz)
    got = list(parse_warc_bytes(buf))
    assert len(got) == 3
    for i, (rt, url, ts, ct, body) in enumerate(got):
        assert rt == "response"
        assert url == f"https://site{i}.example/p{i}"
        assert ts.second == i and ts.day == 1 + i
        assert body == f"<html><body>page {i}</body></html>".encode()


def test_parse_warc_non_response_and_http_split():
    recs = [{"url": "https://a.example/", "rec_type": "request",
             "ts": datetime(2024, 1, 1, tzinfo=timezone.utc),
             "body": b"GET / HTTP/1.1", "http": False},
            {"url": "https://a.example/",
             "ts": datetime(2024, 1, 1, tzinfo=timezone.utc),
             "body": b"<html>x</html>"}]
    got = list(parse_warc_bytes(build_warc(recs)))
    assert [g[0] for g in got] == ["request", "response"]
    assert got[0][4] == b"GET / HTTP/1.1"       # non-response kept whole
    assert got[1][4] == b"<html>x</html>"       # HTTP headers split off
    with pytest.raises(ValueError, match="bad record header"):
        list(parse_warc_bytes(b"NOT A WARC RECORD\r\n\r\n"))


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(build_warc(_recs(4)))
    (tmp_path / "b.warc").write_bytes(build_warc(_recs(2),
                                                 gzip_members=False))
    out = read_warc(spark, str(tmp_path))
    rows = out.collect()
    assert len(rows) == 6
    assert all(r.rec_type == "response" for r in rows)
    assert all(bytes(r.payload).startswith(b"<html>") for r in rows)
    urls = sorted(r.url for r in rows)
    assert urls[0] == "https://site0.example/p0" and len(set(urls)) == 4
    # timestamps land as proper timestamps
    assert all(r.warc_ts.year == 2024 for r in rows)
    # convert() spec types the payload into the input-hint shape
    from geomesa_spark.sources.converter import convert

    txt = convert(out, {"url": "url", "warc_ts": "warc_ts",
                        "html": "payload",
                        "text": "cast(payload as string)"},
                  required=["url", "html"])
    assert txt.count() == 6


@pytest.mark.parametrize("gz", [True, False])
def test_write_wet_roundtrip(spark, tmp_path, gz):
    """WET export: conversion records, text payload byte-identical,
    timestamps preserved, per-partition files + bounded manifest."""
    from datetime import datetime, timezone

    from geomesa_spark.sources.warc import write_wet

    rows = [(f"https://s{i}.example/p", 
             datetime.fromtimestamp(1704067200 + i * 7, tz=timezone.utc),
             f"extracted text {i} é")
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string").repartition(4)
    out = str(tmp_path / ("wet_gz" if gz else "wet_plain"))
    manifest = write_wet(df, out, gzip_members=gz)
    assert sum(n for _, n in manifest) == 40 and len(manifest) <= 4
    back = read_warc(spark, out, record_types=("conversion",))
    got = {r["url"]: r for r in back.collect()}
    assert len(got) == 40
    for url, ts, text in rows:
        r = got[url]
        assert bytes(r["payload"]) == text.encode("utf-8")
        # Spark collects naive session-tz datetimes (session tz = UTC)
        assert r["warc_ts"].replace(tzinfo=timezone.utc) == ts
        assert r["content_type"] == "text/plain"


@pytest.mark.parametrize("gz", [False, True])
def test_warc_record_spans_tile_and_roundtrip(gz):
    """Spans partition the file exactly and every slice re-parses to the
    same record — the CDX random-access contract, both layouts."""
    from geomesa_spark.sources.warc import warc_record_spans

    buf = build_warc(_recs(5), gzip_members=gz)
    spans = list(warc_record_spans(buf))
    assert len(spans) == 5
    assert spans[0][0] == 0
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2            # contiguous
    assert spans[-1][0] + spans[-1][1] == len(buf)
    full = list(parse_warc_bytes(buf))
    for (off, ln), want in zip(spans, full):
        got = list(parse_warc_bytes(buf[off:off + ln]))
        assert got == [want]


def test_read_warc_cdx_spark(spark, tmp_path):
    """read_warc_cdx rows carry working spans for a .warc.gz file: a
    ranged read of [offset, offset+length) yields that record."""
    from geomesa_spark.sources.warc import read_warc_cdx

    recs = _recs(4)
    p = tmp_path / "c.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))
    rows = sorted(read_warc_cdx(spark, str(tmp_path)).collect(),
                  key=lambda r: r["offset"])
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
    raw = p.read_bytes()
    for row, want in zip(rows, recs):
        sl = raw[row["offset"]:row["offset"] + row["length"]]
        rt, url, ts, _ct, body = next(parse_warc_bytes(sl))
        assert (rt, url) == ("response", want["url"])
        assert body == want["body"]
        assert row["rec_type"] == "response"
        assert row["warc_ts"].replace(tzinfo=timezone.utc) == want["ts"]


def test_surt_key_known_answers(spark):
    from pyspark.sql import functions as F

    from geomesa_spark.operators.corpus import surt_key

    cases = [
        ("HTTPS://WWW.Example.COM/Path/One?Q=1#frag",
         "com,example)/path/one?q=1"),
        ("http://a.b.example.org:8080/x", "org,example,b,a:8080)/x"),
        ("https://Example.com:443", "com,example)/"),
        ("http://example.com:80?z=1", "com,example)/?z=1"),
        ("https://sub.site.example/p/2", "example,site,sub)/p/2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["s"] for r in
           df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [want for _, want in cases]


def test_wat_metadata_and_roundtrip(spark, tmp_path):
    """Envelope JSON content (title, absolute-double-quoted links only,
    empty-title and no-link edge cases), null-row skip, and the full
    write_wat -> read_warc metadata round trip."""
    import json
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from geomesa_spark.sources.warc import (read_warc, wat_metadata,
                                            write_wat)

    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    rows = [
        ("https://a.example/1",
         b'<html><head><title>Page One</title></head><body>'
         b'<a href="https://x.example/p">x</a>'
         b"<a href='https://skipped.example/'>q</a>"
         b'<a href="/relative">r</a>'
         b'<a href="http://y.example/q">y</a></body></html>', ts),
        ("https://a.example/2", b"<html><body>no title no links</body></html>",
         ts),
        (None, b"<html></html>", ts),   # skipped by write_wat
    ]
    df = spark.createDataFrame(rows, "url string, html binary, warc_ts timestamp")
    wat = wat_metadata(df)
    env1 = json.loads(wat.filter(F.col("url") == "https://a.example/1")
                         .select("wat").collect()[0][0])["Envelope"]
    assert env1["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://a.example/1"
    hm = env1["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Title"] == "Page One"
    # absolute double-quoted links only, document order, public shape
    assert hm["Links"] == [
        {"path": "A@/href", "url": "https://x.example/p"},
        {"path": "A@/href", "url": "http://y.example/q"}]
    env2 = json.loads(wat.filter(F.col("url") == "https://a.example/2")
                         .select("wat").collect()[0][0])["Envelope"]
    hm2 = env2["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm2["Title"] == "" and hm2["Links"] == []

    path = str(tmp_path / "wat_store")
    manifest = write_wat(wat, path)
    assert sum(r for _, r in manifest) == 2   # null-url row skipped
    back = read_warc(spark, path, record_types=("metadata",))
    got = {r.url: (r.content_type, bytes(r.payload).decode())
           for r in back.collect()}
    assert set(got) == {"https://a.example/1", "https://a.example/2"}
    assert all(ct == "application/json" for ct, _ in got.values())
    w1 = wat.filter(F.col("url") == "https://a.example/1") \
            .select("wat").collect()[0][0]
    assert got["https://a.example/1"][1] == w1
