"""Run every driver query once at a given scale factor and report wall
time — the robustness net that catches scale-dependent failures the
sf0.01 correctness gate cannot see (round 3: connected_components hung at
sf0.1 on lineage growth while green at sf0.01).

Usage: python tools/sweep_sf.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from osm_cycling_quality_index_spark.session import get_spark

    spark = get_spark(app_name="sweep", master="local[32]",
                      shuffle_partitions=32)
    unknown = only - set(E.queries())
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        t = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK   {name:24s} rows={n:<8d} {time.time() - t:6.2f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", flush=True)
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nALL RAN")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
