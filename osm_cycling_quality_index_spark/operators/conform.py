"""Schema conformance + projection operators (SURVEY.md §2.2 P1/P2).

The reference projects the input to a fixed attribute allow-list
(native:retainfields, reference/cycling_quality_index.py:74 with the list at
reference/parameter.py:267-461) and then adds every missing attribute as a
typed NULL column so later code can read tags unconditionally
(reference/cycling_quality_index.py:136-149).  Here that dynamic-schema dance
becomes one deterministic ``select`` — Catalyst prunes the NULL literals for
free and the parquet scan only reads columns that exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import params as P

#: non-tag columns the pipeline threads through conformance
PASSTHROUGH_COLS = ["geometry", "way_id"]


def conform_ways(df: DataFrame, keep_geometry: bool = True) -> DataFrame:
    """Project to the attribute allow-list, adding missing tags as NULL
    strings and missing pipeline columns as typed NULLs."""
    existing = set(df.columns)
    cols = []
    if keep_geometry and "geometry" in existing:
        cols.append(F.col("geometry"))
    for name in P.ATTRIBUTES_LIST:
        if name in existing:
            cols.append(F.col(f"`{name}`").cast("string").alias(name))
        else:
            cols.append(F.lit(None).cast("string").alias(name))
    for name, typ in P.NEW_ATTRIBUTES_TYPES.items():
        if name in existing:
            cols.append(F.col(f"`{name}`").cast(typ).alias(name))
        else:
            cols.append(F.lit(None).cast(typ).alias(name))
    return df.select(*cols)


def retain_final(df: DataFrame) -> DataFrame:
    """Final projection to the retained output columns
    (reference/cycling_quality_index.py:1644), keeping geometry when present."""
    cols = [c for c in (["geometry"] if "geometry" in df.columns else [])]
    cols += [c for c in P.ATTRIBUTES_LIST_FINALLY_RETAINED if c in df.columns]
    return df.select(*cols)
