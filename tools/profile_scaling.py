"""Profile the scaling job's sub-stages at one core count (run as a child
process per core count, like bench.py --scaling-child).

Usage: python tools/profile_scaling.py <cores> [n_points]
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
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from bench import _prepare_scaling_input
    from osm_cycling_quality_index_spark.geo.cols import hex_cell_cols
    from osm_cycling_quality_index_spark.geo.kernels import LAT0, LON0, MPD_X, MPD_Y
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.operators.images import (
        _nearest, _way_segments_cells,
    )
    from osm_cycling_quality_index_spark.session import get_spark

    ways_path, pts_path = _prepare_scaling_input(2000, n_points, "/tmp/cqi_bench_cache")
    spark = get_spark(app_name=f"prof-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    ways = spark.read.parquet(ways_path).select("id", "geometry")
    pts = spark.read.parquet(pts_path).repartition(cores * 3)

    def timed(label, fn, n=2):
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"[{cores}c] {label}: {best:.2f}s", flush=True)
        return best

    pproj = pts.select(
        "image_id",
        ((F.col("lon") - LON0) * MPD_X).alias("px"),
        ((F.col("lat") - LAT0) * MPD_Y).alias("py"),
    )

    # stage 0: scan + repartition only
    timed("scan+repart", lambda: _mat(pts))
    # stage 1: + cell assignment (column math)
    pc = pproj.withColumn("cell", hex_cell_cols(F.col("px"), F.col("py"), 10))
    timed("cells", lambda: _mat(pc))
    # stage 2: + join with ring-expanded ways segs + distance (no agg)
    wsegs = _way_segments_cells(ways, 10, 1)
    from osm_cycling_quality_index_spark.geo.udfs import point_segment_distance_cols
    cand = pc.join(wsegs, "cell", "left")
    d = point_segment_distance_cols(
        F.col("px"), F.col("py"), F.col("ax"), F.col("ay"),
        F.col("bx"), F.col("by"))
    proj = cand.select("image_id", "px", "py", "way_id", d.alias("dist"))
    timed("join+dist", lambda: _mat(proj))
    # stage 3: + groupBy min agg
    best = proj.groupBy("image_id").agg(
        F.min(F.struct(F.col("dist"), F.col("way_id"))).alias("b"),
        F.first("px").alias("px"), F.first("py").alias("py"))
    timed("agg", lambda: _mat(best))
    # stage 4: full _nearest (incl. persist)
    def full_nearest():
        b1 = _nearest(pproj, wsegs, 10, 1)
        _mat(b1)
    timed("nearest", full_nearest)
    # stage 5: full geotag_join (both rounds + final join)
    timed("geotag_join", lambda: _mat(I.geotag_join(pts, ways, res=10)))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
