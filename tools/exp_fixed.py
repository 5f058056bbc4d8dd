"""Find the fixed per-pass cost in the geotag broadcast pass.
Usage: python tools/exp_fixed.py <cores>
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    cores = int(sys.argv[1])
    n = 8_000_000
    from bench import _prepare_scaling_input
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.session import get_spark

    ways_path, pts_path = _prepare_scaling_input(2000, n, "/tmp/cqi_bench_cache")
    spark = get_spark(app_name=f"fx-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    ways = spark.read.parquet(ways_path).select("id", "geometry")
    pts = spark.read.parquet(pts_path).repartition(cores * 3)
    idx = I.build_segment_index(ways, res=10, rings=1)

    sample = pts.limit(200_000).cache()
    _mat(I.geotag_join_broadcast(sample, ways, res=10, index=idx))
    sample.unpersist()
    spark.catalog.clearCache()

    def t(label, fn, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"[{cores}c] {label}: {best:.2f}", flush=True)

    # a) trivial job: count the repartitioned frame (scan + exchange only)
    t("scan+repart(count)", lambda: pts.count())
    # b) noop write of the repartitioned frame (adds row conversion)
    t("scan+repart(noop)", lambda: _mat(pts))
    # c) full pass
    t("geotag_full", lambda: _mat(I.geotag_join_broadcast(pts, ways, res=10, index=idx)))
    # d) empty-ish job: measures pure scheduling overhead
    t("sched", lambda: spark.range(10).count())
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
