"""Experiment: honest per-pass geotag_join timings at one core count under
different persist/shuffle variants.  Usage: python tools/exp_nearest.py <cores>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark import StorageLevel
from pyspark.sql import functions as F


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    cores = int(sys.argv[1])
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    from bench import _prepare_scaling_input
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.session import get_spark

    ways_path, pts_path = _prepare_scaling_input(2000, n_points, "/tmp/cqi_bench_cache")
    spark = get_spark(app_name=f"exp-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    ways = spark.read.parquet(ways_path).select("id", "geometry")
    pts = spark.read.parquet(pts_path).repartition(cores * 3)

    # warm
    sample = pts.limit(200_000).cache()
    _mat(I.geotag_join(sample, ways, res=10))
    sample.unpersist()
    spark.catalog.clearCache()

    def honest(label, fn, n=3):
        times = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        print(f"[{cores}c] {label}: {times}", flush=True)

    honest("geotag_current", lambda: _mat(I.geotag_join(pts, ways, res=10)))

    # variant: no final join (nn only)
    honest("nn_only", lambda: _mat(
        I.knn_ways(pts, ways, k=1, res=10, rings=1)))

    # variant: skip persist by monkeypatching
    import osm_cycling_quality_index_spark.operators.images as im

    orig_nearest = im._nearest

    def nearest_nopersist(points, wsegs, res, rings):
        return orig_nearest(points, wsegs, res, rings)

    # persist storage-level experiment: patch DataFrame.persist used in knn k=1
    from pyspark.sql import DataFrame as DF
    orig_persist = DF.persist

    def persist_disk(self, *a, **kw):
        return orig_persist(self, StorageLevel.DISK_ONLY)

    DF.persist = persist_disk
    honest("geotag_persist_disk", lambda: _mat(I.geotag_join(pts, ways, res=10)))
    DF.persist = lambda self, *a, **kw: self  # no-op persist
    honest("geotag_no_persist", lambda: _mat(I.geotag_join(pts, ways, res=10)))
    DF.persist = orig_persist

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
