"""Replay committed SQL stage text (plans/cqi_sql_gen.py) as one query.

The stage lists are snapshotted from the ANALYZED plans of the
Column-builder pipelines by tools/gen_cqi_sql.py; see that tool's module
doc for the mechanism and invariants.  The replay composes every stage
into a single nested query and issues ONE ``spark.sql`` call: DataFrames
analyze eagerly, so per-stage ``selectExpr`` application would re-analyze
the growing plan once per stage (quadratic), while the nested text is
parsed and analyzed once, linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def replay_stages(
    spark: SparkSession, base_sql: str,
    stages: list[tuple[str, object]],
) -> DataFrame:
    """Apply ``stages`` (("project", [select-expr, ...]) | ("filter",
    condition), in order) on top of ``base_sql`` as one nested query."""
    sql = base_sql
    for kind, payload in stages:
        if kind == "project":
            sql = "SELECT " + ", ".join(payload) + " FROM (" + sql + ")"
        else:
            sql = "SELECT * FROM (" + sql + ") WHERE " + payload
    return spark.sql(sql)


def parquet_base_sql(spark: SparkSession, path: str) -> str:
    """Scan + round-robin repartition base, inlined (path datasource +
    REPARTITION hint — same physical base as ``df.repartition(n)``) rather
    than a fixed-name temp view, which would be a shared mutable binding
    across callers."""
    n = spark.sparkContext.defaultParallelism
    return f"SELECT /*+ REPARTITION({n}) */ * FROM parquet.`{path}`"
