"""Brute-force pure-Python oracle for the sidepath vote (SURVEY.md §5:
'pure-numpy re-implementations' as pytest oracles).

Independent of the Spark code path: O(points x roads) distance scan +
dict-based vote replicating reference/cycling_quality_index.py:230-366
semantics.  Used by tests/test_sidepath.py to validate the cell-bucketed
join + groupBy votes.
"""

from __future__ import annotations

import numpy as np

from osm_cycling_quality_index_spark import params as P
from osm_cycling_quality_index_spark.geo import kernels as K


def _truthy(v) -> bool:
    return v is not None and v != ""


def brute_force_votes(ways: list[dict]) -> dict[str, dict]:
    """ways: dicts with id, geometry [{'x','y'}], highway, name, layer,
    maxspeed, is_sidepath, is_sidepath:of, footway tags.

    Returns {path_id: {proc_sidepath, proc_highway, proc_maxspeed, name}}.
    """
    paths = [w for w in ways if w.get("highway") in P.PATH_HIGHWAY_LIST]
    roads = [
        w for w in ways
        if w.get("highway") is None
        or w.get("highway") not in P.PATH_HIGHWAY_LIST + ["track"]
    ]

    road_segs = []
    for r in roads:
        g = r.get("geometry") or []
        lons = np.array([p["x"] for p in g])
        lats = np.array([p["y"] for p in g])
        x, y = K.project(lons, lats)
        ms = r.get("maxspeed")
        try:
            ms = float(ms) if _truthy(ms) else None
        except (TypeError, ValueError):
            ms = None
        for i in range(len(x) - 1):
            road_segs.append((r, x[i], y[i], x[i + 1], y[i + 1], ms))

    out = {}
    for p in paths:
        g = p.get("geometry") or []
        lons = np.array([pt["x"] for pt in g])
        lats = np.array([pt["y"] for pt in g])
        px, py = K.points_along_line(lons, lats, P.SIDEPATH_BUFFER_DISTANCE)
        checks = len(px)
        id_counts: dict = {}
        hw_counts: dict = {}
        nm_counts: dict = {}
        ms_max: dict = {}
        for k in range(checks):
            ids, hws, nms = set(), set(), set()
            ms_local: dict = {}
            for r, ax, ay, bx, by, ms in road_segs:
                if p.get("layer") != r.get("layer"):
                    continue
                d = K.point_segment_distance(
                    np.array([px[k]]), np.array([py[k]]),
                    np.array([ax]), np.array([ay]), np.array([bx]), np.array([by]),
                )[0]
                if d <= P.SIDEPATH_BUFFER_SIZE:
                    ids.add(r["id"])
                    hws.add(r.get("highway"))
                    nms.add(r.get("name"))
                    prev = ms_local.get(r.get("highway"))
                    if ms is not None and (prev is None or prev < ms):
                        ms_local[r.get("highway")] = ms
            for v in ids:
                id_counts[v] = id_counts.get(v, 0) + 1
            for v in hws:
                hw_counts[v] = hw_counts.get(v, 0) + 1
            for v in nms:
                nm_counts[v] = nm_counts.get(v, 0) + 1
            for hw, m in ms_local.items():
                prev = ms_max.get(hw)
                if prev is None or prev < m:
                    ms_max[hw] = m

        is_sidepath = p.get("is_sidepath")
        if p.get("footway") == "sidewalk":
            is_sidepath = "yes"
        if not _truthy(is_sidepath):
            is_sidepath = "no"
            for counts in (id_counts, hw_counts, nm_counts):
                if is_sidepath == "yes":
                    break
                for cnt in counts.values():
                    if (checks <= 2 and cnt == checks) or (
                        checks > 2 and cnt >= checks * 0.66
                    ):
                        is_sidepath = "yes"
                        break

        is_sidepath_of = p.get("is_sidepath:of")
        if not _truthy(is_sidepath_of) and is_sidepath == "yes" and hw_counts:
            max_cnt = max(hw_counts.values())
            ranked = [
                (P.HIGHWAY_CLASS_LIST.index(hw) if hw in P.HIGHWAY_CLASS_LIST
                 else len(P.HIGHWAY_CLASS_LIST) - 1, hw)
                for hw, cnt in hw_counts.items() if cnt == max_cnt
            ]
            is_sidepath_of = min(ranked)[1]

        proc_maxspeed = None
        if is_sidepath == "yes" and _truthy(is_sidepath_of) and is_sidepath_of in ms_max:
            ms = ms_max[is_sidepath_of]
            if ms:
                proc_maxspeed = int(ms)

        name = p.get("name")
        if is_sidepath == "yes" and nm_counts:
            best = max(nm_counts.values())
            cands = sorted(
                (nm for nm, c in nm_counts.items() if c == best),
                key=lambda v: (v is not None, v),
            )
            if cands and _truthy(cands[0]):
                name = cands[0]

        out[p["id"]] = {
            "checks": checks,
            "proc_sidepath": is_sidepath,
            "proc_highway": is_sidepath_of,
            "proc_maxspeed": proc_maxspeed,
            "name": name,
        }
    return out
