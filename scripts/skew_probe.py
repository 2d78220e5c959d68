"""Hot-cell skew A/B: non-broadcast (shuffle) PIP join over a corpus with
85% of points in ONE level-10 cell; salt=1 vs recommend_salt, AQE skew
backstop. Deterministic input (xxhash64 jitter)."""
import sys; sys.path.insert(0, "/root/repo")
import sys, time
import numpy as np
from pyspark.sql import functions as F
from geomesa_spark import get_spark
from geomesa_spark.operators.spatial_join import pip_join, recommend_salt
from geomesa_spark.sources.pages import generate_circle_polys
from geomesa_spark.geom.wkb import Polygon, wkb_write

spark = get_spark("skew", cpus=32, shuffle_partitions=64)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

u1 = F.xxhash64(F.col("id")) / F.lit(float(2**64)) + F.lit(0.5)
u2 = F.xxhash64(F.col("id"), F.lit(1)) / F.lit(float(2**64)) + F.lit(0.5)
hot = (F.col("id") % 100) < 85
pts = (spark.range(n)
       .withColumn("lon", F.when(hot, F.lit(-74.05) + u1 * 0.05)
                           .otherwise(u1 * 360.0 - 180.0))
       .withColumn("lat", F.when(hot, F.lit(40.70) + u2 * 0.05)
                           .otherwise(u2 * 170.0 - 85.0))
       .select("id", "lon", "lat").repartition(64).persist())
pts.count()

ang = np.linspace(0, 2*np.pi, 24, endpoint=False)
ring = np.empty((25, 2))
ring[:-1, 0] = -74.025 + np.cos(ang) * 0.2
ring[:-1, 1] = 40.725 + np.sin(ang) * 0.1
ring[-1] = ring[0]
hotpoly = spark.createDataFrame([(10_000, bytearray(wkb_write(Polygon(ring))))],
                                "poly_id long, geom binary")
polys = generate_circle_polys(spark, 200).unionByName(hotpoly).persist()
polys.count()

rec = recommend_salt(pts, "lon", "lat", level=10)
print("recommended salt:", rec, flush=True)

def run(salt, skewjoin):
    # the too-big-to-broadcast regime (a 100k-1M polygon layer): force
    # the shuffle join so the hot cell actually concentrates on one task
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skewjoin).lower())
    j = pip_join(pts, polys, "lon", "lat", "geom", predicate="st_intersects",
                 broadcast_polys=False, level=10, salt=salt)
    t0 = time.time(); m = j.count(); w = time.time() - t0
    t0 = time.time(); m = j.count(); w = min(w, time.time() - t0)
    print(f"salt={salt} aqe_skew={skewjoin} wall={w:.2f}s matches={m}", flush=True)
    return m, w

m1, w1 = run(1, False)
m2, w2 = run(rec, False)
m3, w3 = run(1, True)
# AQE's default skewedPartitionThresholdInBytes (256M) ignores a 6.8M-row
# / ~140MB hot partition; at 100 TB the same key is GBs and fires
# untuned. Tune it down to demo the backstop at this scale:
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
m4, w4 = run(1, True)
assert m1 == m2 == m3 == m4
print(f"speedup salt: {w1/w2:.2f}x, aqe default: {w1/w3:.2f}x, aqe tuned: {w1/w4:.2f}x", flush=True)
spark.stop()
