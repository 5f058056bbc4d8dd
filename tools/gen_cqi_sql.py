"""Generate plans/cqi_sql_gen.py — the committed SQL stage text for the
cqi_score_ways fast path.

The CQI scalar pipeline (conform -> classify -> derive -> score) is built
from ~10^4 Column-API calls; at ~0.65 ms py4j round-trip each, plan
CONSTRUCTION costs several seconds per invocation on this box — a pure
driver-side floor independent of data volume.  The Column builders in
operators/ stay the cited source of truth; this tool builds the query once
through them, walks the ANALYZED logical plan (one Project per
withColumns/select stage, Filters in between — analysis preserves the
staging, only the optimizer collapses projects), and snapshots every
stage's resolved expression text via Catalyst ``Expression.sql()`` (the
same mechanism SQL views persist through).  Runtime then replays the
committed text with ONE ``selectExpr``/``where`` per stage.

Two invariants make the snapshot safe:

* resolved ``Expression.sql()`` round-trips through the SQL parser for
  every construct the pipeline uses — lambdas do NOT round-trip
  (``lambdafunction(...)``/``namedlambdavariable()`` is not parseable), so
  the pipeline is lambda-free by construction (weakest_surface_value and
  the traffic-sign fold were unrolled statically; this tool hard-fails if
  a lambda ever reappears);
* tests/test_round4.py regenerates the text in-session and asserts it
  equals the committed module, and asserts the fast path's rows are
  bit-identical to the builder path's.

Usage: python tools/gen_cqi_sql.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

OUT = "osm_cycling_quality_index_spark/plans/cqi_sql_gen.py"
#: node classes at which the walk stops: everything below is the scan +
#: round-robin repartition that the runtime fast path rebuilds directly
_BASE_NODES = ("Repartition", "LogicalRelation", "LogicalRDD")


def extract_stages(df) -> list[tuple[str, object]]:
    """Bottom-up (apply-order) list of ("project", [sql, ...]) /
    ("filter", sql) ops above the scan+repartition base."""
    node = df._jdf.queryExecution().analyzed()
    ops: list[tuple[str, object]] = []
    while True:
        cls = node.getClass().getSimpleName()
        if cls in _BASE_NODES:
            break
        if cls == "Project":
            pl = node.projectList()
            sqls = [pl.apply(i).sql() for i in range(pl.size())]
            ops.append(("project", sqls))
        elif cls == "Filter":
            ops.append(("filter", node.condition().sql()))
        else:
            raise SystemExit(f"unexpected plan node in CQI pipeline: {cls}")
        node = node.child()
    ops.reverse()
    for kind, payload in ops:
        texts = payload if kind == "project" else [payload]
        for t in texts:
            if "lambdafunction(" in t:
                raise SystemExit(
                    "lambda in pipeline expression — not SQL-parseable; "
                    f"unroll it first: {t[:160]}")
    return ops


# ---------------------------------------------------------------------------
# constant-literal inlining (cross-stage constant folding)
# ---------------------------------------------------------------------------
#
# The conform stage materializes the full OSM allow-list schema, so the
# synthesized bench ways carry ~205 constant-NULL tag columns that every
# later stage passes through and the derive/score CASE trees reference.
# Catalyst cannot fold them: constant propagation only happens when
# CollapseProject merges adjacent Projects, and the expensive multi-reference
# stages here are deliberately NOT collapsible.  The per-stage rows were 230+
# columns wide as a result — wide enough that whole-stage codegen could not
# split the fused Project chain into per-operator methods, the generated
# method overflowed the JVM 64 KB limit, and the whole scalar pipeline ran in
# the per-operator fallback copying 230-field UnsafeRows per stage.
#
# This pass inlines every constant-literal column definition into its
# downstream references and drops the definition — exact by construction (a
# reference to a literal alias IS the literal; NULLs keep their CAST type).
# After parsing, Catalyst's NullPropagation/SimplifyConditionals then erase
# the dead CASE arms those NULLs feed.  Measured at sf0.1: stage rows shrink
# from 230-248 to 25-81 columns and the replay drops ~6.8 s -> ~5.2 s quiet
# (more under memory-bandwidth contention); rows bit-identical (pinned by
# tests/test_round4.py::test_cqi_fast_path_bit_equal).

_LIT = re.compile(
    r"^(?:CAST\(NULL AS [A-Za-z0-9_() ,]+\)|NULL|'(?:[^']|'')*'"
    r"|-?\d+(?:\.\d+)?(?:E-?\d+)?D?|true|false)$", re.I)
_ALIAS = re.compile(r"^(.*)\s+AS\s+(`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)$", re.S)
_PLAIN = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _segments(sql: str) -> list[tuple[str, str]]:
    """Split SQL text into ('code'|'str'|'bt', text) segments so that
    identifier substitution never touches string literals or the inside of
    an unrelated backtick-quoted name."""
    i, n, out, buf = 0, len(sql), [], []
    while i < n:
        c = sql[i]
        if c == "'":
            if buf:
                out.append(("code", "".join(buf)))
                buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(("str", sql[i:j + 1]))
            i = j + 1
        elif c == "`":
            if buf:
                out.append(("code", "".join(buf)))
                buf = []
            j = sql.index("`", i + 1)
            out.append(("bt", sql[i:j + 1]))
            i = j + 1
        else:
            buf.append(c)
            i += 1
    if buf:
        out.append(("code", "".join(buf)))
    return out


def _substitute(sql: str, consts: dict[str, str]) -> str:
    if not consts:
        return sql
    plain = {k: v for k, v in consts.items() if _PLAIN.fullmatch(k)}
    pat = None
    if plain:
        names = sorted(plain, key=len, reverse=True)
        pat = re.compile(r"\b(" + "|".join(re.escape(x) for x in names) + r")\b")
    out = []
    for kind, text in _segments(sql):
        if kind == "code" and pat is not None:
            text = pat.sub(lambda m: plain[m.group(1)], text)
        elif kind == "bt" and text[1:-1] in consts:
            text = consts[text[1:-1]]
        out.append(text)
    return "".join(out)


def fold_stages(stages: list[tuple[str, object]]) -> list[tuple[str, object]]:
    """Inline constant-literal column definitions through the stage list and
    drop them from the intermediate projections (the final stage keeps its
    full output list, with literals inlined in place)."""
    consts: dict[str, str] = {}
    out: list[tuple[str, object]] = []
    last_project = max(i for i, (k, _) in enumerate(stages) if k == "project")
    for idx, (kind, payload) in enumerate(stages):
        if kind == "filter":
            out.append(("filter", _substitute(payload, consts)))
            continue
        new_items, new_consts = [], {}
        for item in payload:
            m = _ALIAS.match(item)
            if m:
                expr, alias = m.group(1), m.group(2)
            else:
                expr, alias = item, item.strip()
            alias = alias[1:-1] if alias.startswith("`") else alias
            expr2 = _substitute(expr, consts).strip()
            if _LIT.fullmatch(expr2) and idx != last_project:
                # parenthesize bare numeric/bool literals so the inlined
                # text stays atomic wherever an identifier was valid
                new_consts[alias] = (
                    expr2 if expr2.startswith(("CAST", "'", "NULL", "null"))
                    else "(" + expr2 + ")")
                continue
            quoted = alias if _PLAIN.fullmatch(alias) else f"`{alias}`"
            new_items.append(f"{expr2} AS {quoted}")
        # each project defines the complete next scope: only constants it
        # (re-)defines survive; everything else is a real column again
        consts = new_consts
        out.append(("project", new_items))
    return out


def generate(spark=None) -> dict[str, list[tuple[str, object]]]:
    from osm_cycling_quality_index_spark.plans.cqi_query import (
        q_cqi_score_ways_built,
    )
    from osm_cycling_quality_index_spark.plans.cqi_roads_query import (
        q_cqi_score_roads_full_built,
    )
    from osm_cycling_quality_index_spark.session import get_spark

    if spark is None:
        spark = get_spark(app_name="gen-cqi-sql", master="local[4]")
    sf = "/root/testdata/sf0.001"
    return {
        "CQI_STAGES": fold_stages(
            extract_stages(q_cqi_score_ways_built(spark, sf))
        ),
        "CQI_ROADS_STAGES": fold_stages(
            extract_stages(q_cqi_score_roads_full_built(spark, sf))
        ),
    }


def render(stage_lists: dict[str, list[tuple[str, object]]]) -> str:
    lines = [
        '"""GENERATED by tools/gen_cqi_sql.py — DO NOT EDIT BY HAND.',
        "",
        "SQL stage text for the cqi_score_ways / cqi_score_roads_full fast",
        "paths, snapshotted from the analyzed plans of the Column-builder",
        "pipelines (the cited source of truth in operators/).  Regenerate",
        "after ANY change to conform / classify / derive / score;",
        "tests/test_round4.py pins both the text and bit-identical",
        'results."""',
        "",
        "#: (op, payload) in apply order above scan+repartition:",
        '#: ("project", [select-expr, ...]) | ("filter", condition)',
    ]
    for name, stages in stage_lists.items():
        lines.append(f"{name} = [")
        for kind, payload in stages:
            if kind == "filter":
                lines.append(f"    ({kind!r}, {payload!r}),")
            else:
                lines.append(f"    ({kind!r}, [")
                for s in payload:
                    lines.append(f"        {s!r},")
                lines.append("    ]),")
        lines.append("]")
        lines.append("")
    return "\n".join(lines)


def main() -> int:
    stage_lists = generate()
    text = render(stage_lists)
    with open(OUT, "w") as fh:
        fh.write(text)
    for name, stages in stage_lists.items():
        n_proj = sum(1 for k, _ in stages if k == "project")
        print(f"{name}: {n_proj} projects, {len(stages) - n_proj} filters")
    print(f"wrote {OUT}: {len(text)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
