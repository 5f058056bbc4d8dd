"""Regenerate the golden full-pipeline fixture after an intended semantic
change: ``python tests/regen_golden.py``."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from osm_cycling_quality_index_spark import params as P
    from osm_cycling_quality_index_spark.operators.pipeline import cqi_pipeline
    from osm_cycling_quality_index_spark.session import get_spark
    from osm_cycling_quality_index_spark.sources.synth import ways_df

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    out = cqi_pipeline(ways_df(spark, n_roads=24))
    cols = list(P.ATTRIBUTES_LIST_FINALLY_RETAINED)
    rows = [
        {c: r[c] for c in cols}
        for r in out.select(*cols).orderBy("id", "side").collect()
    ]
    path = os.path.join(os.path.dirname(__file__), "golden", "expected_scored.json")
    with open(path, "w") as fh:
        json.dump(rows, fh, indent=0, sort_keys=True, default=str)
    print(f"wrote {len(rows)} rows to {path}")


if __name__ == "__main__":
    main()
