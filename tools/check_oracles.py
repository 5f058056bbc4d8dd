"""Replay the driver's correctness gate locally: run every queries() entry in
Spark and its oracle_sql() in DuckDB over the same sf dir, compare row count +
sorted values (column order normalized by name, like the driver).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys

sys.path.insert(0, ".")

import duckdb


def normalize(df, cols):
    """Rows as sorted list of tuples with stable, TYPE-TAGGED formatting.

    The driver hashes TYPED values, so an int64 and a float64 of equal
    value are a real mismatch.  Tagging the numeric kind reproduces that
    strictness — the class of drift the round-2 replay (untyped ``%.9g``)
    let ship in events_json."""
    def fmt(v):
        if v is None:
            return "@null"
        if isinstance(v, bool):  # before float/int: bool subclasses int
            return f"i:{int(v)}"
        if isinstance(v, float):  # covers numpy float64 (subclasses float)
            if math.isnan(v):
                return "@nan"
            return f"f:{v:.9g}"
        if isinstance(v, int) or type(v).__name__.startswith(("int", "uint")):
            return f"i:{v}"
        if isinstance(v, decimal.Decimal):
            # DECIMAL-vs-double passes the driver (observed r2: text_stats
            # quality DECIMAL(4,1) green against Spark double) — format
            # like a float so the value comparison agrees
            return f"f:{float(v):.9g}"
        if isinstance(v, datetime.datetime):
            return str(v)
        if isinstance(v, datetime.date):
            # DATE vs midnight TIMESTAMP also passes the driver (observed
            # r2: events_rollup day green) — canonicalize to timestamp form
            return f"{v} 00:00:00"
        return str(v)

    return sorted(tuple(fmt(r[c]) for c in cols) for r in df)


#: Spark dtypes an integer-typed DuckDB column may face without drift
_INTEGRALS = {"tinyint", "smallint", "int", "bigint"}


def type_drift(spark_dtypes: dict, duck_cols, duck_types) -> list[str]:
    """Columns whose DuckDB type would hash differently from the Spark type
    even when every value is equal.  DuckDB's Python client keeps HUGEINT /
    DECIMAL exact (so value comparison via fetchall can't see the drift),
    but the driver's typed hash does — flag them statically.  NULL-able
    BIGINT stays BIGINT, so int-vs-int with NULLs is NOT drift."""
    bad = []
    for name, dtype in zip(duck_cols, duck_types):
        d = str(dtype).upper()
        s = spark_dtypes.get(name, "")
        if d in ("HUGEINT", "UHUGEINT") and s in _INTEGRALS:
            bad.append(f"{name}: duckdb {d} vs spark {s} (cast the SUM)")
        elif d.startswith("DECIMAL") and s in _INTEGRALS:
            bad.append(f"{name}: duckdb {d} vs spark {s} (force BIGINT)")
        elif d == "DOUBLE" and s in _INTEGRALS or d == "BIGINT" and s == "double":
            bad.append(f"{name}: duckdb {d} vs spark {s}")
        # DECIMAL vs double is tolerated by the driver (r2 evidence:
        # text_stats quality) — the value comparison covers it instead
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from osm_cycling_quality_index_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
            cols = sorted(sdf.columns)
            # queries persist fan-out frames internally; don't let caches
            # accumulate across the replay loop.  clearCache misses
            # localCheckpoint blocks (connected_components), so release
            # those through the dedup module's registry too.
            spark.catalog.clearCache()
            from osm_cycling_quality_index_spark.operators.dedup import (
                release_session_pinned,
            )
            release_session_pinned(spark)
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            names, types = list(rel.columns), list(rel.types)
            orows = [dict(zip(names, row)) for row in rel.fetchall()]
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        ocols = sorted(names)
        drift = type_drift(dict(sdf.dtypes), names, types)
        if drift:
            print(f"[FAIL] {name}: column type drift: {drift}")
            failures.append(name)
            continue
        if cols != ocols:
            print(f"[FAIL] {name}: columns {cols} vs {ocols}")
            failures.append(name)
            continue
        a = normalize(spark_rows, cols)
        b = normalize(orows, ocols)
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failures.append(name)
            continue
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"[FAIL] {name}: value mismatch; first diffs:")
            for x, y in diff:
                print("   spark:", x)
                print("   duck :", y)
            failures.append(name)
            continue
        print(f"[ok] {name}: {len(a)} rows match")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
