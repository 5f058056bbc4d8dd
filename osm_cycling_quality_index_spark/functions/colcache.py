"""Cached Column leaves.

In Spark classic mode every ``F.col``/``F.lit`` is a py4j round-trip
(~0.65 ms on this box); the scalar pipeline builds ~10^3 of them, half
duplicates.  Column objects are immutable, so the same leaf can be reused
freely — these helpers memoize them per (name)/(type, value).  Only
hashable literal values are cached; anything else falls through to
``F.lit`` uncached.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=4096)
def ccol(name: str) -> Column:
    return F.col(name)


@lru_cache(maxsize=8192)
def _clit_cached(type_name: str, value) -> Column:
    return F.lit(value)


def clit(value) -> Column:
    try:
        return _clit_cached(type(value).__name__, value)
    except TypeError:  # unhashable — build uncached
        return F.lit(value)
