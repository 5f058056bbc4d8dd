"""Deterministic sampling / data-mixing operators for training pipelines:
per-source stratified sampling (the data-mixing knob that turns source
weights into keep rates) and hash-based train/val/test splitting.

Both are MAP-ONLY column filters with no RNG state: the keep/assign
decision is a pure affine-hash function of the row id, so results are
reproducible across engines, partition layouts, retries and incremental
re-runs — the property that matters when a 100 TB corpus is sampled or
split in pieces (``df.sample``/``sampleBy`` are seed+partition-layout
dependent and cannot be mirrored by an external oracle).  No shuffle
anywhere; the rate table inlines as a literal CASE (sources are
dimension-sized).  Exact DuckDB mirrors in plans/oracles.py.

The affine hash reuses the Knuth multiplicative constant of
operators/dedup.simhash; bucket = (id * K) mod 2^31 is uniform enough for
rate control and trivially portable (BIGINT arithmetic in any engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_K = 2654435761
_M = 1 << 31


def hash_bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, 2^31) from a BIGINT id.

    The id is reduced mod 2^31 BEFORE the multiply: (2^31-1) * K stays
    under 2^63, so the product never overflows int64 (Spark 4's ANSI mode
    and DuckDB both throw on overflow — without the pre-reduce, ids >=
    ~3.47e9 would abort the job).  For ids < 2^31 the pre-reduce is the
    identity, so buckets are unchanged.  The oracle mirrors the same
    two-step form."""
    return F.pmod(F.pmod(id_col, F.lit(_M)) * F.lit(_K), F.lit(_M))


def stratified_sample(
    df: DataFrame, rates: dict[str, float], default_rate: float = 0.0,
    id_col: str = "doc_id", strata_col: str = "source",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    row kept iff ``hash_bucket(id) < floor(rate * 2^31)``.

    ``rates`` maps stratum values to keep rates in [0, 1]; unlisted strata
    (and NULL) use ``default_rate``.  Thresholds are pre-floored to exact
    integer literals so both engines compare BIGINT against BIGINT."""
    rate = None
    for k, v in rates.items():
        thr = F.lit(int(v * _M))
        cond = F.col(strata_col) == k
        rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
    thr_col = (rate.otherwise(F.lit(int(default_rate * _M)))
               if rate is not None else F.lit(int(default_rate * _M)))
    return df.where(hash_bucket(F.col(id_col)) < thr_col)


def hash_split(
    id_col: Column, train: float = 0.98, val: float = 0.01,
) -> Column:
    """'train' / 'val' / 'test' assignment from the id hash — disjoint,
    exhaustive, and stable under any re-partitioning or re-run."""
    b = hash_bucket(id_col)
    t1 = int(train * _M)
    t2 = int((train + val) * _M)
    return (
        F.when(b < F.lit(t1), F.lit("train"))
        .when(b < F.lit(t2), F.lit("val"))
        .otherwise(F.lit("test"))
    )
