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


def test_cc_max_iter_guard(spark):
    from osm_cycling_quality_index_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        connected_components(df, max_iter=0)
