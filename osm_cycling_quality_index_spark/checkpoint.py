"""Snapshot checkpointing with per-partition lineage (north_rule: "resumable
from Iceberg snapshot checkpoints").

No Iceberg runtime ships in this container, so this implements the same
semantics on plain parquet: a table root holds numbered snapshot directories
plus a manifest; writes go to a staging directory and commit by an atomic
manifest replace, so readers only ever see complete snapshots and a killed
run resumes from the last committed one.  On a cluster with Iceberg jars the
``write`` call maps 1:1 to ``writeTo(...).createOrReplace()`` and ``latest``
to snapshot selection — the pipeline code is agnostic.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"snapshots": []}
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def latest(self) -> dict | None:
        snaps = self._read_manifest()["snapshots"]
        return snaps[-1] if snaps else None

    def write(self, df: DataFrame, stage: str) -> dict:
        """Write a new snapshot; returns its manifest entry.  The frame gets
        lineage columns (stage, snapshot id, partition id) baked in."""
        snap_id = f"{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.root, f"snap-{snap_id}")
        staged = (
            df.withColumn("_lineage_stage", F.lit(stage))
            .withColumn("_lineage_snapshot", F.lit(snap_id))
            .withColumn("_lineage_partition", F.spark_partition_id())
        )
        staged.write.mode("overwrite").parquet(path)
        rows = None  # row count comes from the audit layer to avoid a rescan
        manifest = self._read_manifest()
        entry = {
            "id": snap_id, "stage": stage, "path": path,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "rows": rows,
        }
        manifest["snapshots"].append(entry)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit
        return entry

    def read_latest(self, spark: SparkSession, stage: str | None = None) -> DataFrame | None:
        """Resume: the most recent committed snapshot (optionally of a given
        stage), lineage columns dropped."""
        for snap in reversed(self._read_manifest()["snapshots"]):
            if stage is None or snap["stage"] == stage:
                df = spark.read.parquet(snap["path"])
                return df.drop("_lineage_stage", "_lineage_snapshot", "_lineage_partition")
        return None

    def has_stage(self, stage: str) -> bool:
        return any(s["stage"] == stage for s in self._read_manifest()["snapshots"])
