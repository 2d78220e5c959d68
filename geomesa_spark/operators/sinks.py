"""Export sinks: GeoJSON, CSV/TSV, parquet, BIN-packed tracks, arrow.

The reference's export surface (geomesa-tools .../export/ExportFormat
.scala:64-110; GeoJSON DataFrame export geomesa-spark-sql/
GeoJSONExtensions.scala:27-45) as thin writers over DataFrames. Formats
that Spark writes natively (parquet/csv/json/orc) pass through; GeoJSON
builds the feature JSON with built-in expressions (no Python); BIN packs
the reference's 16-byte track records.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["to_geojson_df", "write_geojson", "write_csv", "write_parquet",
           "bin_records", "write_bin", "write_leaflet", "write_arrow_ipc",
           "read_arrow_ipc"]


def to_geojson_df(df: DataFrame, x: str = "lon", y: str = "lat",
                  id_col: str | None = None, props: list[str] | None = None) -> DataFrame:
    """Add a ``geojson`` string column: point Feature per row (built-ins only)."""
    props = props or []
    prop_struct = F.to_json(F.struct(*[F.col(p) for p in props])) if props else F.lit("{}")
    feature = F.concat(
        F.lit('{"type":"Feature"'),
        (F.concat(F.lit(',"id":"'), F.col(id_col).cast("string"), F.lit('"'))
         if id_col else F.lit("")),
        F.lit(',"geometry":{"type":"Point","coordinates":['),
        F.col(x).cast("string"), F.lit(","), F.col(y).cast("string"),
        F.lit(']},"properties":'), prop_struct, F.lit("}"),
    )
    return df.withColumn("geojson", feature)


def write_geojson(df: DataFrame, path: str, **kw) -> None:
    to_geojson_df(df, **kw).select("geojson").write.mode("overwrite").text(path)


def write_csv(df: DataFrame, path: str, sep: str = ",") -> None:
    df.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def _int32(v, what: str) -> int:
    """Range-checked int32 for the BIN format: the reference writes true
    int32 fields — out-of-range values (64-bit track hashes, pre-epoch or
    post-2038 timestamps) must fail loudly, never be silently bit-masked
    into a colliding/garbage value."""
    v = int(v)
    if not -2147483648 <= v <= 2147483647:
        raise ValueError(f"BIN {what} {v} does not fit int32; remap it "
                         "(e.g. pmod(xxhash64(id), 2**31)) before export")
    return v


def bin_records(df: DataFrame, track_col: str, x: str = "lon", y: str = "lat",
                ts_col: str = "dtg", label_col: str | None = None) -> DataFrame:
    """Packed record per row — the reference BIN format
    (geomesa-utils .../bin/BinaryOutputEncoder.scala:81-175):
    16 bytes (trackId:int32, lat:f32, lon:f32, dtg-seconds:int32), or
    24 bytes with the optional int64 ``label_col`` appended."""
    from pyspark.sql.types import BinaryType

    if label_col is None:
        @F.pandas_udf(BinaryType())
        def pack(track: pd.Series, lat: pd.Series, lon: pd.Series,
                 dtg: pd.Series) -> pd.Series:
            out = []
            for t, la, lo, d in zip(track, lat, lon, dtg):
                out.append(struct.pack("<iffi", _int32(t, "trackId"),
                                       float(la), float(lo),
                                       _int32(d, "dtg")))
            return pd.Series(out)

        return df.select(pack(F.col(track_col), F.col(y), F.col(x),
                              F.col(ts_col)).alias("bin"))

    @F.pandas_udf(BinaryType())
    def pack24(track: pd.Series, lat: pd.Series, lon: pd.Series,
               dtg: pd.Series, label: pd.Series) -> pd.Series:
        out = []
        for t, la, lo, d, lb in zip(track, lat, lon, dtg, label):
            out.append(struct.pack("<iffiq", _int32(t, "trackId"), float(la),
                                   float(lo), _int32(d, "dtg"), int(lb)))
        return pd.Series(out)

    return df.select(pack24(F.col(track_col), F.col(y), F.col(x),
                            F.col(ts_col), F.col(label_col)).alias("bin"))


def write_bin(df: DataFrame, path: str, **kw) -> None:
    """Write packed BIN rows as parquet (one binary column)."""
    bin_records(df, **kw).write.mode("overwrite").parquet(path)


_LEAFLET_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>geomesa_spark export</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>html,body,#map{height:100%;margin:0}</style></head>
<body><div id="map"></div><script>
var map = L.map('map');
L.tileLayer('https://{s}.tile.openstreetmap.org/{z}/{x}/{y}.png',
            {maxZoom: 18}).addTo(map);
var data = {"type":"FeatureCollection","features":[
__FEATURES__
]};
var layer = L.geoJSON(data).addTo(map);
if (data.features.length > 0) { map.fitBounds(layer.getBounds()); }
else { map.setView([0, 0], 2); }
</script></body></html>
"""


def write_leaflet(df: DataFrame, path: str, limit: int = 10_000, **kw) -> None:
    """Self-contained Leaflet HTML page with the features embedded as
    GeoJSON — the reference's `leaflet` export format
    (geomesa-tools .../export/ExportFormat.scala:64-110; its LeafletMapExporter).
    ``limit`` caps the embedded features (an HTML page is not a data
    sink); CDN-loaded leaflet assets, no local dependencies.
    """
    rows = (to_geojson_df(df, **kw).select("geojson").limit(limit).collect())
    features = ",\n".join(r["geojson"] for r in rows)
    # '</' would close the <script> block early (script injection when
    # exporting untrusted attribute data); '<\/' is identical JSON.
    features = features.replace("</", "<\\/")
    with open(path, "w") as f:
        f.write(_LEAFLET_TEMPLATE.replace("__FEATURES__", features))


def write_arrow_ipc(df: DataFrame, path: str) -> list:
    """Arrow IPC-file export — the reference's Arrow surface
    (geomesa-arrow ArrowExporter; ArrowConversionProcess returns
    arrow-encoded batches): one ``part-<partition>.arrows`` IPC file per
    partition, written EXECUTOR-SIDE (pyarrow RecordBatchFileWriter
    inside mapInPandas — the rows never funnel through the driver, so
    the sink scales with partition count like the parquet writer).
    Returns the collected per-file manifest ``[(file, rows), ...]`` —
    one row per partition, bounded.

    Arrow types follow pyarrow's pandas inference (ints/doubles/strings/
    binary round-trip exactly; see read_arrow_ipc for the inverse).
    ``path`` must be a directory visible to the executors (local dir in
    local mode; a shared filesystem on a cluster). Overwrite semantics:
    the directory is cleared first, so a re-run with fewer partitions
    can never leave stale part files behind.
    """
    import os
    import shutil

    import pyarrow as pa

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def dump(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [pa.Table.from_pandas(pdf, preserve_index=False)
                  for pdf in batches]
        if not tables:
            return
        tbl = pa.concat_tables(tables)
        fname = os.path.join(path, f"part-{pid:05d}.arrows")
        with pa.OSFile(fname, "wb") as sink:
            with pa.ipc.new_file(sink, tbl.schema) as w:
                w.write_table(tbl)
        yield pd.DataFrame({"file": [fname], "rows": [tbl.num_rows]})

    manifest = df.mapInPandas(dump, "file string, rows long").collect()
    return sorted((r.file, r.rows) for r in manifest)


def read_arrow_ipc(spark, path: str, schema: str) -> DataFrame:
    """Read a directory of Arrow IPC files back into a DataFrame (the
    inverse of write_arrow_ipc): binaryFile scan (one task per file) +
    pyarrow open_file inside mapInPandas. ``schema`` is the DDL of the
    stored columns — pinned, never inferred, so the scan stays a single
    pass."""
    import pyarrow as pa

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.arrows").load(path)
             .select("content"))

    def load(batches):
        for pdf in batches:
            for content in pdf["content"]:
                tbl = pa.ipc.open_file(pa.BufferReader(content)).read_all()
                yield tbl.to_pandas()

    return files.mapInPandas(load, schema)
