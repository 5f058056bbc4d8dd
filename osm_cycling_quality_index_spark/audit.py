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
        """Materialize ``df`` and record stage metrics, including the
        per-partition row distribution (one pass: a partition-id groupBy
        replaces the plain count) — max/mean partition size is the skew
        signal that tells an operator to salt or re-bucket BEFORE a
        straggler kills the job at scale."""
        from pyspark.sql import functions as F

        t0 = time.time()
        per_part = df.groupBy(
            F.spark_partition_id().alias("pid")
        ).agg(F.count(F.lit(1)).alias("rows")).collect()
        wall = time.time() - t0
        rows = sum(r["rows"] for r in per_part)
        nonempty = len(per_part)
        max_rows = max((r["rows"] for r in per_part), default=0)
        total_parts = df.rdd.getNumPartitions()
        # skew denominator is rows / TOTAL partitions (empty ones
        # included): all-rows-in-one-of-200-partitions must read as skew
        # 200, not 1.0 — the empty partitions ARE the imbalance
        mean_rows = rows / total_parts if total_parts else 0
        return self.record(
            stage=name, rows=rows, wall_sec=round(wall, 3),
            partitions=total_parts,
            nonempty_partitions=nonempty,
            max_partition_rows=max_rows,
            partition_skew=round(max_rows / mean_rows, 2) if mean_rows else None,
            rows_per_sec=round(rows / wall, 1) if wall > 0 else None,
        )
