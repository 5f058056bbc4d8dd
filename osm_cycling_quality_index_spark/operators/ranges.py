"""Range join — the second classic operator Spark's built-ins lack.

``range_join(points, intervals)`` pairs each point value with every
interval containing it (half-open ``lo <= v < hi``).  The naive form is a
theta-join (every point against every interval); here the interval side
explodes to the fixed-size bins it covers and the point side computes its
single bin — an equi-join on the bin, exactly the hexcell pattern the
spatial joins use.  A pair cannot duplicate: a point has one bin and an
interval covers each bin at most once.

``bin_size`` should be on the order of the typical interval span: larger
bins mean fewer interval replicas but more false candidates for the
refine; either way the join stays an equi-join and the refine is a
codegen comparison, never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    v: str = "v",
    lo: str = "lo",
    hi: str = "hi",
    bin_size: float = 100.0,
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= v < hi``.

    Output: every column of both frames (names must not collide apart from
    the join machinery's ``_bin``).
    """
    b = F.lit(float(bin_size))
    pts = points.withColumn("_bin", F.floor(F.col(v) / b))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(lo) / b), F.floor(F.col(hi) / b))),
    )
    return (
        pts.join(iv, "_bin")
        .where((F.col(v) >= F.col(lo)) & (F.col(v) < F.col(hi)))
        .drop("_bin")
    )
