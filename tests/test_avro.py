"""Avro OCF source (sources/avro.py): typed round trip both codecs,
block framing, union/array/timestamp decode, Spark end-to-end, and
loud failures on unsupported shapes."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.avro import (avro_spark_schema, build_avro,
                                        parse_avro_bytes, read_avro)

_SCHEMA = {"type": "record", "name": "ev", "fields": [
    {"name": "id", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "ok", "type": "boolean"},
    {"name": "score", "type": ["null", "double"]},
    {"name": "ts", "type": {"type": "long",
                            "logicalType": "timestamp-micros"}},
    {"name": "payload", "type": "bytes"},
    {"name": "tags", "type": {"type": "array", "items": "string"}},
    {"name": "small", "type": "int"},
]}


def _rows(n=123):
    return [{"id": i - 3, "name": f"n{i}é", "ok": i % 2 == 0,
             "score": None if i % 4 == 0 else i / 8,
             "ts": pd.Timestamp(1704067200_000000 + i * 1_000_003,
                                unit="us", tz="UTC"),
             "payload": bytes([i % 256]) * (i % 5),
             "tags": [f"t{j}" for j in range(i % 4)],
             "small": -i}
            for i in range(n)]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(codec):
    rows = _rows()
    buf = build_avro(rows, _SCHEMA, codec=codec, records_per_block=17)
    back = list(parse_avro_bytes(buf))
    assert len(back) == len(rows)
    for r0, r1 in zip(rows, back):
        for k in ("id", "name", "ok", "score", "payload", "tags",
                  "small", "ts"):
            assert r0[k] == r1[k], k


def test_spark_schema_mapping():
    assert avro_spark_schema(_SCHEMA) == (
        "`id` bigint, `name` string, `ok` boolean, `score` double, "
        "`ts` timestamp, `payload` binary, `tags` array<string>, "
        "`small` int")


def test_bad_magic_and_bad_sync():
    with pytest.raises(ValueError, match="magic"):
        list(parse_avro_bytes(b"PAR1" + b"\x00" * 64))
    buf = bytearray(build_avro(_rows(10), _SCHEMA, codec="null",
                               records_per_block=5))
    buf[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(ValueError, match="sync"):
        list(parse_avro_bytes(bytes(buf)))


def test_unsupported_shapes_raise():
    with pytest.raises(NotImplementedError, match="codec"):
        build_avro([], _SCHEMA, codec="snappy")
    fancy = {"type": "record", "name": "r", "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}}]}
    with pytest.raises(NotImplementedError):
        build_avro([{"m": {}}], fancy)


def test_read_avro_spark(spark, tmp_path):
    rows = _rows(200)
    p1 = os.path.join(str(tmp_path), "a.avro")
    p2 = os.path.join(str(tmp_path), "b.avro")
    with open(p1, "wb") as f:
        f.write(build_avro(rows[:120], _SCHEMA, codec="deflate",
                           records_per_block=31))
    with open(p2, "wb") as f:
        f.write(build_avro(rows[120:], _SCHEMA, codec="null"))
    df = read_avro(spark, str(tmp_path))
    assert df.columns == ["id", "name", "ok", "score", "ts", "payload",
                          "tags", "small"]
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 200
    for r0 in rows:
        r1 = got[r0["id"]]
        assert r1["name"] == r0["name"] and r1["ok"] == r0["ok"]
        assert r1["score"] == r0["score"]
        assert bytes(r1["payload"]) == r0["payload"]
        assert list(r1["tags"]) == r0["tags"]
    # timestamp lands as a real Spark timestamp with exact epoch micros
    n_bad = df.filter(
        (F.unix_timestamp("ts") * 1_000_000
         + F.date_format("ts", "SSSSSS").cast("long"))
        != (F.lit(1704067200_000000)
            + (F.col("id") + 3) * 1_000_003)).count()
    assert n_bad == 0
