"""As-of join — the canonical operator Spark's built-ins lack.

``asof_join(left, right)`` matches every left row to the latest right row
with ``right.ts <= left.ts`` within the same key — the time-series join
(trades→quotes, events→state) that a naive implementation writes as a
range theta-join (quadratic).  Here it is the standard union–sort–carry
composition, which is a SINGLE shuffle by key:

1. tag both sides and union them (right rows carry their payload as one
   struct, left rows carry NULL);
2. one window per key ordered by (ts, side) — right sorts before left at
   equal timestamps, so ``ts <= ts`` matches;
3. ``last(payload_struct, ignoreNulls)`` over unbounded-preceding carries
   the most recent right row's payload atomically onto every left row.

Cost: one exchange on the key + a per-partition sort — the same shape as
any keyed window, scaling like groupBy.  DuckDB has the operator natively
(ASOF JOIN), which the correctness gate uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    payload: tuple = ("event_id",),
) -> DataFrame:
    """Left rows + the latest right row at-or-before their timestamp.

    ``right`` must be unique per (by, ts) — pre-aggregate if not (ties at
    identical timestamps are otherwise ambiguous in any engine).  Output:
    all left columns + ``r_<payload>`` columns (NULL when no right row
    precedes).  The payload rides as one struct so all its fields come
    from the SAME right row even when some are NULL.
    """
    lcols = left.columns
    pay = F.struct(*[F.col(c).alias(c) for c in payload])
    l = left.select(
        *lcols, F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload
            ) + ">"
        ).alias("_p"),
    )
    r = right.select(
        by, ts, F.lit(0).alias("_side"), pay.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (by, ts)],
    ).select(*lcols, "_side", "_p")
    u = l.unionByName(r)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_pc", F.last("_p", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).select(
        *lcols, *[F.col("_pc")[c].alias(f"r_{c}") for c in payload]
    )
