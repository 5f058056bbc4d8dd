"""Shared synth helpers for the plan modules: the key->tag-value picker and
its exact SQL mirror.  One definition, so the Spark synthesis and every
DuckDB oracle stay in lockstep — a modulo or NULL-arm tweak applied to only
one copy would silently break the gate's premise that both engines see the
same input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pick(key: Column, values) -> Column:
    """Deterministic tag value from an integer key: values[key % len]
    (None entries yield NULL)."""
    expr = F.lit(None).cast("string")
    for i, v in enumerate(values):
        if v is not None:
            expr = F.when(key % len(values) == i, F.lit(v)).otherwise(expr)
    return expr


def sql_pick(key: str, values, n: int | None = None) -> str:
    """The exact DuckDB mirror of :func:`pick`."""
    n = n or len(values)
    arms = " ".join(
        f"WHEN {key} % {n} = {i} THEN '{v}'"
        for i, v in enumerate(values) if v is not None
    )
    return f"CASE {arms} END"
