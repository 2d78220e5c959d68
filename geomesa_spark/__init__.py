"""geomesa_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the reference GeoMesa query semantics
(/root/reference) as idiomatic PySpark: Z2/Z3/XZ2 cell encoding in vectorized
pandas/Arrow UDFs, cell-cover prefilter + exact refine spatial joins,
grid-partitioned kNN, raster<->vector tiling, and explicit skew/checkpoint
handling — over parquet/Iceberg tables of web-scale documents.
"""

__version__ = "0.1.0"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def get_spark(app: str = "geomesa_spark", cpus: str | int = "*",
              shuffle_partitions: int = 32, extra_conf: dict | None = None):
    """Build a local SparkSession tuned for the engine.

    At cluster scale the same settings ship via spark-submit conf; AQE stays
    on so skewed cell joins re-plan at runtime.
    """
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: vectorized refine kernels group candidates by
        # polygon — 10k-row default batches leave ~50-point groups where
        # numpy per-call overhead dominates; 256k rows amortizes it
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_tables(spark, sf_dir: str, names=TABLES):
    """Register the driver testdata parquet tables as temp views."""
    import os

    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
