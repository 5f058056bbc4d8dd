"""Round-7 (optimization round) regression tests: the size-adaptive
connected-components local path must be bit-identical to the distributed
label-propagation loop, on long and string node ids."""

from __future__ import annotations

import pytest


def _cc(spark, edges_df, monkeypatch, local: bool):
    from osm_cycling_quality_index_spark.operators import dedup

    # CC_LOCAL_EDGES=0 forces the distributed loop; a huge bound forces the
    # local union-find (the default takes it for these tiny graphs anyway)
    monkeypatch.setenv("CC_LOCAL_EDGES", "1000000" if local else "0")
    got = {r["node"]: r["component"]
           for r in dedup.connected_components(edges_df, max_iter=64).collect()}
    dedup.release_session_pinned(spark)
    return got


def test_cc_local_matches_distributed_long_ids(spark, monkeypatch):
    edges = []
    # long path (diameter 40), two cliques, isolated pairs, dup/reversed edges
    edges += [(i, i + 1) for i in range(40)]
    for base in (100, 200):
        edges += [(base + i, base + j)
                  for i in range(5) for j in range(i + 1, 5)]
    edges += [(301, 300), (300, 301), (400, 401)]
    df = spark.createDataFrame(edges, "src long, dst long")
    local = _cc(spark, df, monkeypatch, local=True)
    dist = _cc(spark, df, monkeypatch, local=False)
    assert local == dist
    assert local[40] == 0 and local[301] == 300  # non-vacuous


def test_cc_local_matches_distributed_string_ids(spark, monkeypatch):
    # string ids: the local path must order like Spark (binary/UTF-8),
    # including length-prefix cases ('w2' vs 'w10')
    edges = [("w2", "w10"), ("w10", "w3"), ("a", "B"), ("B", "z"),
             ("p1", "p2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    local = _cc(spark, df, monkeypatch, local=True)
    dist = _cc(spark, df, monkeypatch, local=False)
    assert local == dist
    assert local["w2"] == "w10"  # 'w10' < 'w2' byte-wise


def test_sidepath_vote_null_names_match_oracle(spark):
    """The consolidated single-pass vote aggregate (round 7) must keep the
    NULLS-FIRST name tie-break and NULL-class handling of the old per-vote
    window branches: roads with no name / unlisted highway exercise the
    struct-ordering min/max paths."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).parent))
    from oracle_sidepath import brute_force_votes
    from test_sidepath import _compare, _line

    ways = []
    for i in range(12):
        lat = 52.40 + i * 0.003
        lon = 13.10
        ways.append({
            "id": f"r{i}", "geometry": _line(lon, lat, 900.0),
            # half the roads have no name; two per path so name counts tie
            "highway": ["residential", "bridleway"][i % 2],
            "name": None if i % 2 else f"N{i % 3}",
            "maxspeed": "30",
        })
        ways.append({
            "id": f"r{i}b", "geometry": _line(lon, lat, 900.0, 6.0),
            "highway": "residential", "name": None, "maxspeed": "50",
        })
        ways.append({
            "id": f"p{i}", "geometry": _line(lon, lat, 800.0, 12.0),
            "highway": ["cycleway", "footway", "path"][i % 3],
            "bicycle": "yes",
        })
    _compare(spark, ways)
    assert brute_force_votes(ways)  # non-vacuous


def test_replay_session_inherits_confs(spark):
    """The codegen-off child session used by the committed-SQL replay
    queries must inherit every builder conf (only wholeStage flips) and
    be cached per parent session."""
    from osm_cycling_quality_index_spark.plans.sqlgen import replay_session

    s2 = replay_session(spark)
    assert s2 is replay_session(spark)  # cached
    assert s2 is not spark
    assert s2.conf.get("spark.sql.codegen.wholeStage") == "false"
    for key in ("spark.sql.shuffle.partitions",
                "spark.sql.adaptive.enabled",
                "spark.sql.codegen.fallback",
                "spark.sql.autoBroadcastJoinThreshold"):
        assert s2.conf.get(key) == spark.conf.get(key), key
    # same context: RDD-level state (checkpoints, broadcasts) is shared
    assert s2.sparkContext is spark.sparkContext


def test_cc_max_iter_guard(spark):
    from osm_cycling_quality_index_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        connected_components(df, max_iter=0)
