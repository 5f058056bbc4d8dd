"""Cached Column leaves.

In Spark classic mode every ``F.col``/``F.lit`` is a py4j round-trip
(~0.65 ms on this box); the scalar pipeline builds ~10^3 of them, half
duplicates.  Column objects are immutable, so the same leaf can be reused
freely — these helpers memoize them per (name)/(type, value).  Only
hashable literal values are cached; anything else falls through to
``F.lit`` uncached.
"""

from __future__ import annotations

import struct
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F


@lru_cache(maxsize=4096)
def ccol(name: str) -> Column:
    return F.col(name)


@lru_cache(maxsize=8192)
def _clit_cached(key, value) -> Column:
    return F.lit(value)


def clit(value) -> Column:
    # Only scalar leaves are cached.  The cache key must distinguish every
    # value Spark would render differently: 0.0 vs -0.0 are == and hash the
    # same but differ by an IEEE sign bit, so floats key on their raw bit
    # pattern; containers like (1,) vs (True,) collide under == the same
    # way, so they (and any other type) fall through uncached.
    t = type(value)
    if t is float:
        return _clit_cached(("f", struct.pack(">d", value)), value)
    if t in (str, int, bool) or value is None:
        return _clit_cached((t.__name__, value), value)
    return F.lit(value)
