"""Physical-layout helpers for 100 TB table design: partition pruning and
bucketed co-located joins.

Two complementary tools the reference (single in-memory layer) never needed
but a 10^12-row deployment lives by:

* **Spatial partition pruning** — write fact tables partitioned by a coarse
  spatial key (hex cell at a low resolution), so a bbox/cell query reads
  only the matching directories.  The scan's ``PartitionFilters`` prove the
  pruning in ``explain``.
* **Bucketed co-located joins** — persist both sides of a recurring
  equi-join bucketed (and sorted) by the join key; Spark then sort-merge
  joins bucket-to-bucket with ZERO exchanges.  For the cell-keyed spatial
  joins this turns every subsequent join into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..geo.cols import hex_cell_cols
from ..geo.kernels import LAT0, LON0, MPD_X, MPD_Y


def with_partition_cell(df: DataFrame, res: int = 5,
                        lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Add the coarse spatial partition key ``pcell`` (hex cell at ``res``;
    res 5 ≈ 10 km cells — coarse enough for directory counts, fine enough
    to prune a city query to a handful of partitions)."""
    px = (F.col(lon) - F.lit(LON0)) * F.lit(MPD_X)
    py = (F.col(lat) - F.lit(LAT0)) * F.lit(MPD_Y)
    return df.withColumn("pcell", hex_cell_cols(px, py, res))


def write_spatially_partitioned(df: DataFrame, path: str, res: int = 5) -> None:
    """Parquet layout partitioned by the coarse cell: one directory per
    ``pcell``.  Readers filtering on ``pcell`` scan only matching
    directories (partition pruning — verify via ``PartitionFilters`` in
    explain)."""
    with_partition_cell(df, res).write.mode("overwrite").partitionBy(
        "pcell"
    ).parquet(path)


def save_bucketed(df: DataFrame, table: str, key: str = "cell",
                  n_buckets: int = 16) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` as a managed table.  Two
    tables bucketed the same way sort-merge join on ``key`` with no
    exchange on either side."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str = "cell") -> DataFrame:
    """Join two co-bucketed tables on their bucket key — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), key)
