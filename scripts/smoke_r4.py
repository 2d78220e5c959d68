"""sf0.1 smoke of the round-4 session queries (BENCH.md convention:
single cold session local[16], wall includes planning; first query
carries the session warmup). Usage: python scripts/smoke_r4.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from geomesa_spark import get_spark
from geomesa_spark.functions import register_functions

KEYS = ["store_xz3", "store_plan", "store_plan_st", "store_plan_xz",
        "ingest_resume", "kn_bigram", "kn_ppl", "dwithin_rects"]

if __name__ == "__main__":
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("smoke_r4", cpus=16, shuffle_partitions=32)
    register_functions(spark)
    q = E.queries()
    for k in KEYS:
        t0 = time.time()
        n = q[k](spark, sf).count()
        print(f"{k}: {n} rows / {time.time() - t0:.1f} s", flush=True)
    spark.stop()
