"""Audit table: per-stage row counts, latency and partition stats
(north_rule: "row-count/latency metrics emitted to an audit table").

Rows append as JSON lines locally (and the same records can be appended to
an Iceberg audit table on a cluster); ``stage_timer`` wraps a stage action
and records wall time + output rows + partition count.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame


class Audit:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, **fields) -> dict:
        rec = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), **fields}
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return rec

    def stage(self, name: str, df: DataFrame) -> dict:
        """Materialize ``df`` (count) and record stage metrics."""
        t0 = time.time()
        rows = df.count()
        wall = time.time() - t0
        parts = df.rdd.getNumPartitions()
        return self.record(
            stage=name, rows=rows, wall_sec=round(wall, 3), partitions=parts,
            rows_per_sec=round(rows / wall, 1) if wall > 0 else None,
        )
