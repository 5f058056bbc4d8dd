"""Quick warm-timing harness for the dedup/minhash family at sf0.1.

Usage: python tools/time_dedup.py [query ...]   (default: the three slow ones)
Prints per-pass wall times; cache cleared + session pins released between
passes so each pass pays its own persists, like bench.py does.
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

import __spark_entry__ as E
from osm_cycling_quality_index_spark.operators import dedup

SF = "/root/testdata/sf0.1"
names = sys.argv[1:] or ["minhash_lsh_pairs", "dedup_groups_text", "corpus_curate"]

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = E.queries()

for name in names:
    for p in range(3):
        spark.catalog.clearCache()
        dedup.release_session_pinned(spark)
        t0 = time.time()
        n = qs[name](spark, SF).count()
        print(f"{name} pass{p}: {time.time()-t0:6.2f}s  rows={n}", flush=True)
spark.stop()
