"""Avro Object Container File ingest — the geomesa-convert-avro analog.

The reference ships an Avro converter (geomesa-convert-avro; see
/root/reference/docs/user/convert/avro.rst) that ingests Avro container
files into features. This container has the avro-core jars but NOT the
``spark-avro`` data source, so ``spark.read.format("avro")`` is
unavailable; the OCF wire format (one JSON schema in the header, then
sync-delimited blocks of binary-encoded records) is a public spec and
small enough to decode directly, the same way ``sources/warc.py`` and
``sources/shapefile.py`` handle their wire formats: ``binaryFile`` +
one ``mapInPandas`` pass.

Supported subset (covers the converter-ingest use case):
- top-level ``record`` schemas; field types ``null boolean int long
  float double string bytes``, nullable unions ``[null, T]`` (and any
  union of one non-null branch), ``array`` of a supported type, and the
  ``timestamp-micros``/``timestamp-millis`` logical types on long;
- codecs ``null`` and ``deflate`` (raw zlib), the two every Avro
  implementation must support.
Anything else raises with the offending type — never a silent wrong
answer.

Scale shape: OCF *is* block-splittable (the 16-byte sync marker exists
precisely so readers can split between blocks), but ``binaryFile``
delivers whole files, so parallelism here is per FILE — identical to
the WARC/shapefile readers and fine at 100 TB where a dump is many
files. The byte-level decode is necessarily Python (a deliberate,
documented exception to the no-Python-hot-path rule, same as the other
wire-format parsers: this is the INGEST boundary, runs once, and
everything downstream is parquet + JVM exprs).

``build_avro`` writes the same subset (fixtures, exports, tests).
"""

from __future__ import annotations

import glob
import json
import os
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["read_avro", "parse_avro_bytes", "build_avro", "avro_spark_schema"]

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode

def _read_long(buf: bytes, pos: int):
    """Zigzag varint -> (python int, new pos)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: bytes, pos: int):
    n, pos = _read_long(buf, pos)
    return buf[pos:pos + n], pos + n


def _norm_type(t):
    """Schema node -> (kind, node). Unwraps {"type": "long", ...} dicts."""
    if isinstance(t, str):
        return t, {"type": t}
    if isinstance(t, list):
        return "union", t
    if isinstance(t, dict):
        return t["type"], t
    raise ValueError(f"avro: unsupported schema node {t!r}")


def _decoder(t):
    """Return fn(buf, pos) -> (value, pos) for a schema node."""
    kind, node = _norm_type(t)
    if kind == "null":
        return lambda buf, pos: (None, pos)
    if kind == "boolean":
        return lambda buf, pos: (buf[pos] != 0, pos + 1)
    if kind in ("int", "long"):
        logical = node.get("logicalType") if isinstance(node, dict) else None
        if logical in ("timestamp-micros", "timestamp-millis"):
            unit = "us" if logical == "timestamp-micros" else "ms"

            def dec_ts(buf, pos, _u=unit):
                v, pos = _read_long(buf, pos)
                return pd.Timestamp(v, unit=_u, tz="UTC"), pos
            return dec_ts
        return _read_long
    if kind == "float":
        return lambda buf, pos: (struct.unpack_from("<f", buf, pos)[0],
                                 pos + 4)
    if kind == "double":
        return lambda buf, pos: (struct.unpack_from("<d", buf, pos)[0],
                                 pos + 8)
    if kind == "bytes":
        return _read_bytes
    if kind == "string":
        def dec_str(buf, pos):
            b, pos = _read_bytes(buf, pos)
            return b.decode("utf-8"), pos
        return dec_str
    if kind == "union":
        branches = [_decoder(b) for b in node]

        def dec_union(buf, pos):
            idx, pos = _read_long(buf, pos)
            return branches[idx](buf, pos)
        return dec_union
    if kind == "array":
        item = _decoder(node["items"])

        def dec_array(buf, pos):
            out = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # negative count: byte size follows (skippable)
                    _, pos = _read_long(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = item(buf, pos)
                    out.append(v)
        return dec_array
    raise NotImplementedError(f"avro: unsupported type {t!r}")


def _header(buf: bytes):
    """Parse the OCF header -> (schema dict, codec, sync, pos)."""
    if buf[:4] != _MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    pos = 4
    meta = {}
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    sync = buf[pos:pos + 16]
    return schema, codec, sync, pos + 16


def parse_avro_bytes(buf: bytes):
    """Yield one dict per record of an OCF byte string."""
    buf = bytes(buf)
    schema, codec, sync, pos = _header(buf)
    if schema.get("type") != "record":
        raise NotImplementedError("avro: top-level schema must be a record")
    fields = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]
    n_total = len(buf)
    while pos < n_total:
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = buf[pos:pos + size]
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError(f"avro: sync marker mismatch at byte {pos}")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bp = 0
        for _ in range(count):
            row = {}
            for name, dec in fields:
                row[name], bp = dec(block, bp)
            yield row


# ------------------------------------------------------- schema mapping

_SPARK_TYPES = {"boolean": "boolean", "int": "int", "long": "bigint",
                "float": "float", "double": "double", "string": "string",
                "bytes": "binary", "null": "string"}


def _spark_type(t) -> str:
    kind, node = _norm_type(t)
    if kind in ("int", "long") and isinstance(node, dict) and \
            node.get("logicalType", "").startswith("timestamp-"):
        return "timestamp"
    if kind == "union":
        non_null = [b for b in node if _norm_type(b)[0] != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"avro: multi-branch union {node!r}")
        return _spark_type(non_null[0])
    if kind == "array":
        return f"array<{_spark_type(node['items'])}>"
    if kind in _SPARK_TYPES:
        return _SPARK_TYPES[kind]
    raise NotImplementedError(f"avro: unsupported type {t!r}")


def avro_spark_schema(schema: dict) -> str:
    """Avro record schema -> Spark DDL string (column order preserved)."""
    return ", ".join(f"`{f['name']}` {_spark_type(f['type'])}"
                     for f in schema["fields"])


# --------------------------------------------------------------- reader

def read_avro(spark, path: str, schema: dict | None = None) -> DataFrame:
    """Read Avro OCF files under ``path`` (file, dir, or glob) into a
    DataFrame, one task per file. ``schema`` (the Avro record schema as
    a dict) pins the plan-time schema; when omitted it is read from the
    header of the first matching file on the driver — fine on a local
    or mounted FS (the header is the first few hundred bytes; on object
    storage pass ``schema`` explicitly to avoid the driver read)."""
    if schema is None:
        if os.path.isdir(path):
            cands = sorted(glob.glob(os.path.join(path, "*")))
        else:
            cands = sorted(glob.glob(path)) or [path]
        # match binaryFile's own listing rules: plain files only, no
        # _SUCCESS/.crc markers (which would fail the magic check)
        cands = [c for c in cands
                 if os.path.isfile(c)
                 and not os.path.basename(c).startswith(("_", "."))]
        if not cands:
            raise ValueError(
                f"avro: no data files under {path!r} to infer the schema "
                "from — pass schema= explicitly")
        with open(cands[0], "rb") as f:
            schema, _, _, _ = _header(f.read(1 << 16))
    ddl = avro_spark_schema(schema)
    cols = [f["name"] for f in schema["fields"]]
    files = (spark.read.format("binaryFile").load(path)
             .select("content"))

    def parse(batches):
        for pdf in batches:
            rows = {c: [] for c in cols}
            for content in pdf["content"]:
                for rec in parse_avro_bytes(content):
                    for c in cols:
                        rows[c].append(rec[c])
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, ddl)


# --------------------------------------------------------------- writer

def _enc_long(n: int) -> bytes:
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _encoder(t):
    kind, node = _norm_type(t)
    if kind == "null":
        return lambda v: b""
    if kind == "boolean":
        return lambda v: b"\x01" if v else b"\x00"
    if kind in ("int", "long"):
        logical = node.get("logicalType") if isinstance(node, dict) else None
        if logical in ("timestamp-micros", "timestamp-millis"):
            mult = 1 if logical == "timestamp-micros" else 1000

            def enc_ts(v, _m=mult):
                us = pd.Timestamp(v).value // 1000  # ns -> us
                return _enc_long(us // _m)
            return enc_ts
        return lambda v: _enc_long(int(v))
    if kind == "float":
        return lambda v: struct.pack("<f", float(v))
    if kind == "double":
        return lambda v: struct.pack("<d", float(v))
    if kind == "bytes":
        return lambda v: _enc_bytes(bytes(v))
    if kind == "string":
        return lambda v: _enc_bytes(str(v).encode("utf-8"))
    if kind == "union":
        branches = [(i, _norm_type(b)[0], _encoder(b))
                    for i, b in enumerate(node)]
        null_i = next((i for i, k, _ in branches if k == "null"), None)
        non_null = [br for br in branches if br[1] != "null"]
        if len(non_null) != 1:
            # same contract as avro_spark_schema: no silent branch pick
            raise NotImplementedError(f"avro: multi-branch union {node!r}")

        def enc_union(v):
            if v is None:
                if null_i is None:
                    raise ValueError("avro: None for non-nullable union")
                return _enc_long(null_i)
            i, _, enc = non_null[0]
            return _enc_long(i) + enc(v)
        return enc_union
    if kind == "array":
        item = _encoder(node["items"])

        def enc_array(vs):
            if vs is None or len(vs) == 0:
                return _enc_long(0)
            return (_enc_long(len(vs)) + b"".join(item(v) for v in vs)
                    + _enc_long(0))
        return enc_array
    raise NotImplementedError(f"avro: unsupported type {t!r}")


def build_avro(rows, schema: dict, codec: str = "deflate",
               records_per_block: int = 100) -> bytes:
    """Encode ``rows`` (list of dicts) as one OCF byte string."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r} not supported")
    encs = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]
    # deterministic sync marker (fixtures diff cleanly run-to-run)
    sync = bytes((i * 73 + 11) & 0xFF for i in range(16))
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = bytearray(_MAGIC)
    out += _enc_long(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_bytes(k.encode()) + _enc_bytes(v)
    out += _enc_long(0)
    out += sync
    for i in range(0, len(rows), records_per_block):
        chunk = rows[i:i + records_per_block]
        body = b"".join(b"".join(enc(r.get(name)) for name, enc in encs)
                        for r in chunk)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = c.compress(body) + c.flush()
        out += _enc_long(len(chunk)) + _enc_long(len(body)) + body + sync
    return bytes(out)
