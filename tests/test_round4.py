"""Round-4 hardening tests: dedup storage release, foreign pair endpoints,
BPE learner validation gate, xxhash word-id mode parity."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
REPO = pathlib.Path(__file__).resolve().parents[1]


def _registry_size(spark) -> int:
    return len(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )


# ---------------------------------------------------------------------------
# connected-components / dedup_groups storage release
# ---------------------------------------------------------------------------

def test_dedup_groups_releases_storage(spark):
    """After a dedup_groups run's output is collected and its cleanup
    callable invoked, the JVM persistent-RDD registry is back to its
    pre-call size (localCheckpoint blocks freed, labelled persist gone)."""
    from osm_cycling_quality_index_spark.operators.dedup import dedup_groups

    corpus = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long")
    before = _registry_size(spark)
    release: list = []
    out = dedup_groups(corpus, pairs, release=release)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 8 and rows[2]["group_id"] == 0
    assert _registry_size(spark) > before  # run really pinned storage
    for fn in release:
        fn()
    assert _registry_size(spark) == before


def test_release_session_pinned(spark):
    """Calls without an explicit release list register with the module-level
    registry; release_session_pinned(spark) frees everything."""
    from osm_cycling_quality_index_spark.operators.dedup import (
        connected_components, dedup_groups, release_session_pinned,
    )

    release_session_pinned(spark)  # drain pins left by earlier tests
    before = _registry_size(spark)
    corpus = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (3, 4)], "doc_a long, doc_b long")
    dedup_groups(corpus, pairs).collect()
    connected_components(pairs, "doc_a", "doc_b").collect()
    assert _registry_size(spark) > before
    release_session_pinned(spark)
    assert _registry_size(spark) == before


def test_dedup_groups_foreign_pair_endpoints(spark):
    """Non-corpus pair endpoints neither produce keeper-less groups
    (ADVICE r3: a foreign component minimum must not become a group_id)
    NOR sever transitivity: corpus rows bridged only through a foreign id
    still collapse into one group, remapped to the minimum CORPUS member."""
    from osm_cycling_quality_index_spark.operators.dedup import dedup_groups

    corpus = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5)], "doc_id long")
    # 0 is NOT in the corpus, is the minimum of its component, AND bridges
    # corpus rows 2 and 4 that were never compared directly
    pairs = spark.createDataFrame(
        [(0, 2), (0, 4), (3, 4)], "doc_a long, doc_b long")
    release: list = []
    rows = {r["doc_id"]: r for r in
            dedup_groups(corpus, pairs, release=release).collect()}
    for fn in release:
        fn()
    assert {d: r["group_id"] for d, r in rows.items()} == {
        1: 1, 2: 2, 3: 2, 4: 2, 5: 5}
    # every group has exactly one keeper, and it is a corpus row
    keepers = [d for d, r in rows.items() if r["is_keeper"]]
    assert sorted(keepers) == [1, 2, 5]
    assert rows[3]["n_members"] == 3


def test_weakest_surface_duplicate_order_entry(spark):
    """SURFACE_VALUE_ORDER lists paving_stones twice (reference
    parameter.py duplicate, kept verbatim); .index()/array_position
    resolve to the FIRST occurrence, so values between the two
    occurrences must outrank it (r4 self-review finding)."""
    from pyspark.sql import functions as F

    from osm_cycling_quality_index_spark import params as P
    from osm_cycling_quality_index_spark.functions.tags import (
        weakest_surface_value,
    )

    order = P.SURFACE_VALUE_ORDER
    assert order.count("paving_stones") == 2  # the reference's duplicate
    first = order.index("paving_stones")
    between = [v for v in order[first + 1:] if v != "paving_stones"
               and order.index(v) < len(order) - 1 - order[::-1].index("paving_stones")]
    assert between, "values exist between the duplicate occurrences"
    df = spark.createDataFrame(
        [(i, ["paving_stones", v]) for i, v in enumerate(between)],
        "i long, arr array<string>")
    got = {r["i"]: r["w"] for r in
           df.select("i", weakest_surface_value(F.col("arr")).alias("w")).collect()}
    assert got == dict(enumerate(between))


# ---------------------------------------------------------------------------
# BPE learner validation gate (_REPEAT under-merge bound)
# ---------------------------------------------------------------------------

def _learn_bpe_module():
    spec = importlib.util.spec_from_file_location(
        "learn_bpe", REPO / "tools" / "learn_bpe.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_learn_bpe_validates_committed_table():
    """The committed merges table passes the learner-time under-merge gate
    on its own training corpus (replace-chain == greedy for every word)."""
    import duckdb

    from osm_cycling_quality_index_spark.functions.bpe_merges import MERGES

    mod = _learn_bpe_module()
    rows = duckdb.connect().execute(
        f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    words = {w for (t,) in rows for w in t.lower().split()}
    mod.validate_merges(MERGES, words)  # must not raise


def test_learn_bpe_rejects_undermerge():
    """Same-symbol rules trip the learner gate (they strand symbols under
    non-overlapping replace on runs >= 4 at any repeat count); distinct-
    symbol rules are exhaustive for runs of any length."""
    mod = _learn_bpe_module()
    # structural rejection of (x, x)
    with pytest.raises(ValueError, match="same-symbol"):
        mod.validate_merges([("a", "a")], ["aaaaaa"])
    # the empirical under-merge it guards against is real: chain 4 != greedy 3
    assert mod.simulate_column_count("aaaaaa", [("a", "a")], 3) == 4
    assert mod.greedy_count("aaaaaa", [("a", "a")]) == 3
    # distinct-symbol rule: exhaustive even on a 128-symbol run
    mod.validate_merges([("e", "r")], ["er" * 64, "erer", "banana"])


# ---------------------------------------------------------------------------
# xxhash word-id mode parity (the declared 100-TB production path)
# ---------------------------------------------------------------------------

def test_xxhash_mode_minhash_parity(spark):
    """minhash_lsh_pairs produces the SAME near-dup pair set under
    mode='xxhash' (the declared 100-TB production path) and
    mode='dictionary' (the oracle path) on the sf0.01 corpus: the
    exact-Jaccard verify is mode-independent, so any divergence would mean
    the banding misses a true pair under one hash family."""
    from osm_cycling_quality_index_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    d = spark.read.parquet(f"{SF01}/documents.parquet")
    by_mode = {}
    for mode in ("dictionary", "xxhash"):
        by_mode[mode] = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_lsh_pairs(d, mode=mode, verify="exact").collect()
        }
        spark.catalog.clearCache()
    assert by_mode["dictionary"] == by_mode["xxhash"]
    assert by_mode["dictionary"]  # non-vacuous: corpus has near-dups


def test_xxhash_mode_simhash_exhaustive(spark):
    """SimHash pair SETS are intrinsically hash-family-dependent (the
    word->bit map IS the random-projection family), so cross-mode equality
    is the wrong invariant — measured on sf0.01: 3,126 pairs (dictionary)
    vs 16,880 (xxhash) at hamming<=3/32, both mid-distribution on this
    template-generated, tiny-vocabulary corpus; recall of shingle-Jaccard
    >=0.5 truth pairs is 8/25 vs 17/25.  The mode-independent property
    worth pinning is EXHAUSTIVENESS: for each mode, the block-pigeonhole
    candidate generation loses nothing — the operator's output equals the
    brute-force all-pairs hamming filter over that mode's own signatures.
    This is the first coverage of the production xxhash path end-to-end."""
    from osm_cycling_quality_index_spark.operators.dedup import (
        simhash, simhash_near_pairs,
    )

    d = spark.read.parquet(f"{SF01}/documents.parquet")
    for mode in ("dictionary", "xxhash"):
        sigs = {r["doc_id"]: r["simhash"]
                for r in simhash(d, mode=mode).collect()}
        spark.catalog.clearCache()
        ids = sorted(sigs)
        brute = {
            (a, b)
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3
        }
        got = {(r["doc_a"], r["doc_b"])
               for r in simhash_near_pairs(d, mode=mode).collect()}
        spark.catalog.clearCache()
        assert got == brute, (mode, len(got), len(brute))
        assert brute  # non-vacuous


# ---------------------------------------------------------------------------
# cqi_score_ways generated-SQL fast path
# ---------------------------------------------------------------------------

def test_cqi_sql_gen_text_current():
    """The committed SQL stage text (plans/cqi_sql_gen.py) regenerates
    bit-identically from the Column-builder pipeline — i.e. nobody changed
    conform/classify/derive/score without re-running tools/gen_cqi_sql.py."""
    spec = importlib.util.spec_from_file_location(
        "gen_cqi_sql", REPO / "tools" / "gen_cqi_sql.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    regenerated = mod.render(mod.generate())
    committed = (REPO / "osm_cycling_quality_index_spark" / "plans"
                 / "cqi_sql_gen.py").read_text()
    assert regenerated == committed, (
        "plans/cqi_sql_gen.py is stale — run python tools/gen_cqi_sql.py")


def test_cqi_fast_path_bit_equal(spark):
    """Fast paths (single nested spark.sql over the committed stage text)
    return exactly the builder paths' rows and columns."""
    from osm_cycling_quality_index_spark.plans.cqi_query import (
        q_cqi_score_ways, q_cqi_score_ways_built,
    )
    from osm_cycling_quality_index_spark.plans.cqi_roads_query import (
        q_cqi_score_roads_full, q_cqi_score_roads_full_built,
    )

    def key(r):
        return tuple((v is None, type(v).__name__, repr(v)) for v in r)

    for fast, built in [
        (q_cqi_score_ways, q_cqi_score_ways_built),
        (q_cqi_score_roads_full, q_cqi_score_roads_full_built),
    ]:
        a = fast(spark, SF)
        b = built(spark, SF)
        assert a.columns == b.columns, fast.__module__
        ra = sorted(map(tuple, a.collect()), key=key)
        rb = sorted(map(tuple, b.collect()), key=key)
        assert ra == rb and len(ra) > 100, fast.__module__


# ---------------------------------------------------------------------------
# PII scrubbing + deterministic sampling (round-4 additions)
# ---------------------------------------------------------------------------

def test_pii_scrub_hand_cases(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from osm_cycling_quality_index_spark.operators.quality import pii_scrub

    df = spark.createDataFrame([
        (0, "mail a@b.co and c.d+x@e-f.org end"),
        (1, "ip 10.0.0.1 then 192.168.255.3"),
        (2, "call +4915112345678 now"),
        (3, "clean text with no pii at all"),
        (4, "a@b.co 10.0.0.1 +12345678 all three"),
        (5, None),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ips"], rows[0]["n_phones"]) == (2, 0, 0)
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (0, 2, 0)
    assert (rows[2]["n_emails"], rows[2]["n_ips"], rows[2]["n_phones"]) == (0, 0, 1)
    assert (rows[3]["n_emails"], rows[3]["n_ips"], rows[3]["n_phones"]) == (0, 0, 0)
    assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (1, 1, 1)
    assert rows[5]["scrub_md5"] is None
    # the scrub really removed the PII: same md5 as the hand-redacted text
    import hashlib
    want = hashlib.md5(b"<EMAIL> <IP> <PHONE> all three").hexdigest()
    assert rows[4]["scrub_md5"] == want


def test_sampling_deterministic_and_exhaustive(spark):
    from pyspark.sql import functions as F

    from osm_cycling_quality_index_spark.operators.sampling import (
        hash_split, stratified_sample,
    )

    d = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    rates = {"s0": 1.0, "s1": 0.5, "s2": 0.0}
    a = {r["doc_id"] for r in stratified_sample(d, rates).collect()}
    # identical under a different physical layout (no RNG, no layout term)
    b = {r["doc_id"] for r in
         stratified_sample(d.repartition(7), rates).collect()}
    assert a == b
    per = {s: sum(1 for i in a if i % 3 == int(s[1])) for s in rates}
    assert per["s0"] == 667 and per["s2"] == 0   # rate 1.0 keeps all, 0.0 none
    assert 233 <= per["s1"] <= 433               # ~0.5 of 666
    # split: exhaustive, disjoint, stable, roughly proportioned
    sp = d.select("doc_id", hash_split(F.col("doc_id")).alias("split"))
    counts = {r["split"]: r["n"] for r in
              sp.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1900 and set(counts) <= {"train", "val", "test"}
