"""Config-driven converter ingest: files -> typed feature DataFrame.

The Spark-first analog of the reference's converter framework
(geomesa-convert: a config maps source fields through transform
expressions to a typed SimpleFeature, with an error mode for bad
records; ConverterSpatialRDDProvider.scala:44-134, transform DSL
geomesa-convert-common/.../transforms/). Here the format reader is
Spark's own (csv/json/parquet — the reference's per-format readers) and
the transform DSL is Spark SQL: a converter spec is just

    {"out_field": "sql expression over the source columns", ...}

with geometry constructors coming from the registered ``st_*`` surface.
Error modes (the reference's ErrorMode): 'raise' fails the job on a
null-required row, 'skip' drops such rows, 'log' keeps them with a
``__bad__`` flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["convert", "read_and_convert"]

_FORMATS = ("csv", "json", "parquet")


def convert(df: DataFrame, fields: dict[str, str],
            required: list[str] | None = None,
            error_mode: str = "raise") -> DataFrame:
    """Apply a converter spec to an already-loaded source DataFrame.

    ``fields`` maps output column -> SQL expression over source columns;
    ``required`` lists output columns that must be non-null for the row
    to be a valid feature.
    """
    if error_mode not in ("raise", "skip", "log"):
        raise ValueError(f"error_mode must be raise|skip|log, got {error_mode}")
    req = list(required or [])
    unknown = [c for c in req if c not in fields]
    if unknown:
        raise ValueError(f"converter: required column(s) {unknown} not in the "
                         f"field spec {sorted(fields)}")
    out = df.select([F.expr(expr).alias(name) for name, expr in fields.items()])
    if not req:
        return out
    bad = None
    for c in req:
        b = F.col(c).isNull()
        bad = b if bad is None else (bad | b)
    if error_mode == "skip":
        return out.filter(~bad)
    if error_mode == "log":
        return out.withColumn("__bad__", bad)
    # raise: fail fast driver-side if any bad row exists (the reference's
    # default raise-on-error converter behavior); single scan
    sample = out.filter(bad).limit(5).collect()
    if sample:
        raise ValueError(f"converter: required field null in input, e.g. {sample}")
    return out


def read_and_convert(spark, fmt: str, path: str, fields: dict[str, str],
                     required: list[str] | None = None,
                     error_mode: str = "raise",
                     reader_options: dict | None = None) -> DataFrame:
    """Read ``path`` with Spark's ``fmt`` reader and apply the spec."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {fmt}")
    reader = spark.read
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv":
        reader = reader.option("header", reader_options.get("header", True)
                               if reader_options else True)
    df = getattr(reader, fmt)(path)
    return convert(df, fields, required, error_mode)
