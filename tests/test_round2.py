"""Round-2 additions: EPSG:25833 parity, production fingerprint, streaming
tumbling windows, broadcast geotag parity, ANN recall floor, GeoJSON
round-trip, scalable dictionary word ids."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# EPSG:25833 transverse Mercator (S4/S5 exact forms)
# ---------------------------------------------------------------------------

def test_tm_roundtrip():
    from osm_cycling_quality_index_spark.geo.kernels import project_tm, unproject_tm

    rng = np.random.default_rng(1)
    lon = 13.0 + rng.uniform(0, 0.8, 500)
    lat = 52.3 + rng.uniform(0, 0.4, 500)
    e, n = project_tm(lon, lat)
    lo, la = unproject_tm(e, n)
    assert np.max(np.abs(lo - lon)) < 1e-8
    assert np.max(np.abs(la - lat)) < 1e-6
    # zone-33 central meridian maps to the 500 km false easting
    e0, _ = project_tm(np.array([15.0]), np.array([52.5]))
    assert abs(e0[0] - 500000.0) < 1e-6


def test_tm_vs_equirect_distance_bound():
    """Inside the Berlin bbox the local tangent frame agrees with the true
    EPSG:25833 metric on inter-point distances to <=0.8% relative — the
    documented bound for the 22 m vote threshold."""
    from osm_cycling_quality_index_spark.geo.kernels import project, project_tm

    rng = np.random.default_rng(2)
    lon = 13.0 + rng.uniform(0, 0.8, 2000)
    lat = 52.3 + rng.uniform(0, 0.4, 2000)
    x, y = project(lon, lat)
    e, n = project_tm(lon, lat)
    d_eq = np.hypot(np.diff(x), np.diff(y))
    d_tm = np.hypot(np.diff(e), np.diff(n))
    rel = np.abs(d_eq - d_tm) / d_tm
    assert rel.max() < 0.008


# ---------------------------------------------------------------------------
# production fingerprint == oracle fingerprint
# ---------------------------------------------------------------------------

def test_fingerprint_fast_matches(spark):
    from osm_cycling_quality_index_spark.functions.text import (
        fingerprint, fingerprint_fast,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = fingerprint(docs)
    b = fingerprint_fast(docs)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# streaming tumbling == batch tumbling
# ---------------------------------------------------------------------------

def test_streaming_tumbling(spark, tmp_path):
    from osm_cycling_quality_index_spark.streaming.sessions import (
        streaming_tumbling, tumbling_counts,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "events_in")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_tumbling(stream)
    q = (
        out.writeStream.format("memory").queryName("tumbling_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, event_type, n, ROUND(avg_value, 6) AS avg_value "
        "FROM tumbling_test"
    )
    want = tumbling_counts(events).withColumn(
        "window_start", F.col("window_start").cast("timestamp")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# broadcast geotag == shuffle geotag (J3 strategies)
# ---------------------------------------------------------------------------

def test_geotag_broadcast_parity(spark):
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.sources import synth

    wpdf = synth.ways_pdf(n_roads=40)
    ways = synth.ways_df(spark, n_roads=40).select("id", "geometry")
    imgs = synth.images_df(spark, wpdf, n_images=400).select("image_id", "lon", "lat")
    a = I.geotag_join(imgs, ways, res=9).select(
        "image_id", "way_id", F.round("dist_m", 6).alias("d"))
    b = I.geotag_join_broadcast(imgs, ways, res=9).select(
        "image_id", "way_id", F.round("dist_m", 6).alias("d"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_resize_and_image_embeddings(spark):
    """Multimodal operators: thumbnails decode to the requested shape, and
    duplicate payloads produce identical embeddings that the embedding
    near-dup operator then finds — the end-to-end image near-dup path."""
    from osm_cycling_quality_index_spark.imaging import codec
    from osm_cycling_quality_index_spark.operators.dedup import embedding_near_dups
    from osm_cycling_quality_index_spark.operators.images import (
        image_embeddings, resize_images,
    )
    from osm_cycling_quality_index_spark.sources import synth

    wpdf = synth.ways_pdf(n_roads=10)
    imgs = synth.images_df(spark, wpdf, n_images=60)
    # plant an exact duplicate payload under a new id
    dup = imgs.where(F.col("image_id") == "img0").withColumn(
        "image_id", F.lit("img0_copy"))
    imgs = imgs.unionByName(dup)

    thumbs = resize_images(imgs, size=8).collect()
    assert len(thumbs) == 61
    for r in thumbs[:5]:
        px = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert px.shape == (8, 8, 3) and r["w"] == 8 and r["h"] == 8

    emb = image_embeddings(imgs, size=8).withColumnRenamed("image_id", "vec_id")
    row = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(row["img0"]) == 64
    assert row["img0"] == row["img0_copy"]
    pairs = {(r["vec_a"], r["vec_b"])
             for r in embedding_near_dups(emb, threshold=0.999).collect()}
    assert ("img0", "img0_copy") in pairs or ("img0_copy", "img0") in pairs


def test_salted_cell_join_parity(spark):
    """salt_cells + explode_salts must leave cell-join results unchanged —
    a point's salted cell always lands on exactly one of the dimension
    side's exploded salt replicas (same cell, matching salt)."""
    import numpy as np

    from osm_cycling_quality_index_spark.operators.images import (
        explode_salts, salt_cells,
    )

    rng = np.random.default_rng(9)
    # one hot cell (80% of points) + a long tail — the skew shape salting
    # exists for
    cells = np.where(rng.uniform(size=2000) < 0.8, 7,
                     rng.integers(0, 50, 2000))
    pts = spark.createDataFrame(
        [(str(i), int(c)) for i, c in enumerate(cells)], "pid string, cell long")
    dim = spark.createDataFrame(
        [(f"w{c}", int(c)) for c in range(50)], "way string, cell long")
    plain = pts.join(dim, "cell").select("pid", "way")
    salted = (
        salt_cells(pts, "cell", "pid", 8)
        .join(explode_salts(dim, "cell", 8), "cell")
        .select("pid", "way")
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_sample_frames(spark):
    """Frame sampling keeps every k-th frame, and sampled payloads decode
    back to the exact source pixels (real container round-trip)."""
    import numpy as np

    from osm_cycling_quality_index_spark.imaging import codec
    from osm_cycling_quality_index_spark.operators.images import sample_frames

    rng = np.random.default_rng(11)
    videos, source = [], {}
    for v in range(3):
        frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                  for _ in range(7 + v)]
        source[f"v{v}"] = frames
        videos.append((f"v{v}", codec.video_encode(frames, "png"), "png"))
    df = spark.createDataFrame(videos, "video_id string, bytes binary, fmt string")
    rows = sample_frames(df, every_k=3).collect()
    got = {(r["video_id"], r["frame_idx"]) for r in rows}
    want = {(f"v{v}", i) for v in range(3) for i in range(0, 7 + v, 3)}
    assert got == want
    for r in rows:
        px = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert (px == source[r["video_id"]][r["frame_idx"]]).all()


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState session counting across two micro-batches must
    equal the batch window form on the full event set."""
    import os
    import time as _time

    from osm_cycling_quality_index_spark.streaming.sessions import (
        sessionize, streaming_sessionize,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).select("event_id", "ts", "user_id")
    cut = events.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    src = str(tmp_path / "events_in")
    os.makedirs(src)
    # batch 1 = earlier half, batch 2 = later half; the file source orders
    # batches by modification time, so stamp them explicitly
    events.where(F.col("ts") <= cut).coalesce(1).write.parquet(f"{src}/b1")
    events.where(F.col("ts") > cut).coalesce(1).write.parquet(f"{src}/b2")
    now = _time.time()
    for sub, mt in (("b1", now - 100), ("b2", now)):
        for f in os.listdir(f"{src}/{sub}"):
            os.utime(f"{src}/{sub}/{f}", (mt, mt))
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")
    out = streaming_sessionize(stream)
    q = (
        out.writeStream.format("memory").queryName("sessionize_test")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # n_events is monotone per user: the final answer is the max-n_events row
    got = spark.sql(
        "SELECT user_id, max_by(n_sessions, n_events) AS n_sessions, "
        "MAX(n_events) AS n_events FROM sessionize_test GROUP BY user_id"
    )
    want = sessionize(events)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_pip_join_brute_force(spark):
    """pip_join (cell-bucketed candidates + column-math ray cast) must equal
    the numpy ray_cast_pip kernel applied all-pairs."""
    import numpy as np

    from osm_cycling_quality_index_spark.geo.kernels import (
        LAT0, LON0, MPD_X, MPD_Y, project, ray_cast_pip,
    )
    from osm_cycling_quality_index_spark.operators.images import pip_join

    rng = np.random.default_rng(3)
    polys = []
    for i in range(15):
        x0, y0 = rng.uniform(0, 6000, 2)
        w, h = rng.uniform(300, 2500, 2)
        ring = [(x0, y0), (x0 + w, y0 + rng.uniform(-200, 200)),
                (x0 + rng.uniform(-200, 200), y0 + h)]
        polys.append((f"g{i}", [
            {"x": float(LON0 + x / MPD_X), "y": float(LAT0 + y / MPD_Y)}
            for x, y in ring
        ]))
    pts = [(str(j), float(LON0 + x / MPD_X), float(LAT0 + y / MPD_Y),
            float(x), float(y))
           for j, (x, y) in enumerate(rng.uniform(0, 6500, (1500, 2)))]
    pdf = spark.createDataFrame(
        polys, "poly_id string, geometry array<struct<x double, y double>>")
    tdf = spark.createDataFrame(
        [(p[0], p[1], p[2]) for p in pts], "image_id string, lon double, lat double")
    got = {(r["image_id"], r["poly_id"])
           for r in pip_join(tdf, pdf, res=7).collect()}
    qx = np.array([p[3] for p in pts])
    qy = np.array([p[4] for p in pts])
    want = set()
    for pid, ring in polys:
        rx, ry = project(np.array([v["x"] for v in ring]),
                         np.array([v["y"] for v in ring]))
        for j in np.flatnonzero(ray_cast_pip(qx, qy, rx, ry)):
            want.add((pts[j][0], pid))
    assert got == want and len(want) > 0


def test_knn_broadcast_parity(spark):
    """knn_ways_broadcast (zero-shuffle CSR-index form) must reproduce the
    shuffle path bit-for-bit: same two-round guarantee semantics, same
    (dist, way_id) tie-break, same drop of candidate-less points."""
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.sources import synth

    wpdf = synth.ways_pdf(n_roads=40)
    ways = synth.ways_df(spark, n_roads=40).select("id", "geometry")
    imgs = synth.images_df(spark, wpdf, n_images=400).select("image_id", "lon", "lat")
    a = I.knn_ways(imgs, ways, k=3, res=8, rings=2).select(
        "image_id", "way_id", "rank", F.round("dist_m", 9).alias("d"))
    b = I.knn_ways_broadcast(imgs, ways, k=3, res=8, rings=2).select(
        "image_id", "way_id", "rank", F.round("dist_m", 9).alias("d"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# ANN: LSH top-k recall floor vs brute force
# ---------------------------------------------------------------------------

def test_ann_lsh_recall(spark):
    from osm_cycling_quality_index_spark.operators import ann

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_emb")
    )
    exact = ann.brute_force_topk(emb, queries, k=5)
    approx = ann.lsh_topk(emb, queries, k=5)
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    total = exact.count()
    recall = hits / total
    # 8 hyperplanes over 500 synthetic vectors: measured recall ~0.5+;
    # the floor asserts the bucketing isn't degenerate, and documents the
    # approximation quality the scale path trades for zero cross-bucket work
    assert recall >= 0.3, f"recall@5 = {recall:.2f}"


# ---------------------------------------------------------------------------
# GeoJSON source/sink round-trip (S1/S2/S3/S6)
# ---------------------------------------------------------------------------

def test_ivf_recall(spark):
    """IVF-flat recall floor vs brute force (16 seed centroids, probe 4):
    asserts the inverted lists aren't degenerate and documents the quality
    of the deterministic-seed quantizer."""
    from osm_cycling_quality_index_spark.operators import ann

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_emb")
    )
    exact = ann.brute_force_topk(emb, queries, k=5)
    approx = ann.ivf_topk(emb, queries, k=5)
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"recall@5 = {recall:.2f}"


def test_geojson_roundtrip(spark, tmp_path):
    from osm_cycling_quality_index_spark.sources import geojson, synth

    ways = synth.ways_df(spark, n_roads=25)
    out = str(tmp_path / "ways_out")
    geojson.write_geojson_features(ways.select("id", "geometry", "highway"), out)
    back = geojson.read_geojson(spark, out)
    assert back.count() == ways.count()
    # multi-file merge + duplicate-geometry drop (S2+S3): reading the same
    # path twice doubles rows, dedup restores the original count
    doubled = geojson.read_geojson(spark, out, out)
    assert doubled.count() == 2 * ways.count()
    assert geojson.drop_duplicate_geometries(doubled).count() == ways.count()
    # geometry survives the round-trip
    a = ways.select("id", F.to_json(F.struct("geometry")).alias("g"))
    b = back.select("id", F.to_json(F.struct("geometry")).alias("g"))
    assert a.exceptAll(b).count() == 0


# ---------------------------------------------------------------------------
# word ids: range-partitioned rank == global dense_rank
# ---------------------------------------------------------------------------

def test_word_ids_rank(spark):
    from osm_cycling_quality_index_spark.operators.dedup import tokenize, word_ids

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize(docs, "text", "word")
    got = word_ids(toks, mode="dictionary")
    vocab = sorted(r["word"] for r in toks.select("word").distinct().collect())
    want = {w: i + 1 for i, w in enumerate(vocab)}
    for r in got.select("word", "word_id").distinct().collect():
        assert r["word_id"] == want[r["word"]], r


def test_checkpoint_snapshot_resume(spark, tmp_path):
    """Snapshot commit is atomic (manifest replace) and resume returns the
    last committed stage with lineage columns stripped."""
    from osm_cycling_quality_index_spark.checkpoint import SnapshotTable

    t = SnapshotTable(str(tmp_path / "ckpt"))
    assert t.latest() is None and t.read_latest(spark) is None
    df1 = spark.range(10).withColumnRenamed("id", "k")
    e1 = t.write(df1, "stage_a")
    df2 = spark.range(5).withColumnRenamed("id", "k")
    e2 = t.write(df2, "stage_b")
    assert t.latest()["id"] == e2["id"]
    assert t.has_stage("stage_a") and not t.has_stage("stage_c")
    back_b = t.read_latest(spark)
    assert back_b.columns == ["k"] and back_b.count() == 5
    back_a = t.read_latest(spark, "stage_a")
    assert back_a.count() == 10
    # lineage columns are present in the stored snapshot itself
    raw = spark.read.parquet(e1["path"])
    assert {"_lineage_stage", "_lineage_snapshot", "_lineage_partition"} <= set(raw.columns)


def test_streaming_geotag_broadcast(spark, tmp_path):
    """The broadcast CSR geotag join is a stateless map, so it runs
    unchanged under Structured Streaming; streamed output must equal the
    batch join on the same points."""
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.sources import synth

    wpdf = synth.ways_pdf(n_roads=20)
    ways = synth.ways_df(spark, n_roads=20).select("id", "geometry")
    imgs = synth.images_df(spark, wpdf, n_images=300).select("image_id", "lon", "lat")
    src = str(tmp_path / "imgs_in")
    imgs.write.parquet(src)
    idx = I.build_segment_index(ways, res=9, rings=1)
    stream = spark.readStream.schema(imgs.schema).parquet(src)
    out = I.geotag_join_broadcast(stream, ways, res=9, index=idx)
    q = (
        out.writeStream.format("memory").queryName("geotag_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT image_id, way_id, ROUND(dist_m, 6) AS d FROM geotag_stream")
    want = I.geotag_join_broadcast(imgs, ways, res=9, index=idx).select(
        "image_id", "way_id", F.round("dist_m", 6).alias("d"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_dedup(spark, tmp_path):
    """First arrival of each document content passes, duplicates drop."""
    from osm_cycling_quality_index_spark.streaming.sessions import streaming_dedup

    rows = [
        (1, "2024-01-01 10:00:00", "alpha beta"),
        (2, "2024-01-01 10:01:00", "gamma"),
        (3, "2024-01-01 10:02:00", "alpha beta"),   # dup of 1
        (4, "2024-01-01 10:03:00", "delta"),
        (5, "2024-01-01 10:04:00", "gamma"),        # dup of 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, ts string, text string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        streaming_dedup(stream).writeStream.format("memory")
        .queryName("dedup_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    kept = {r["text"] for r in spark.sql("SELECT text FROM dedup_stream").collect()}
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_stream").collect()[0]["n"]
    assert kept == {"alpha beta", "gamma", "delta"} and n == 3


def test_qml_style_sink(tmp_path):
    """S7: the generated QML is well-formed XML with the reference's 11
    graduated classes over `index` (bounds, labels, colors)."""
    import xml.etree.ElementTree as ET

    from osm_cycling_quality_index_spark.sources.style import (
        INDEX_CLASSES, write_qml_style,
    )

    p = write_qml_style(str(tmp_path / "scored.qml"))
    root = ET.parse(p).getroot()
    rend = root.find("renderer-v2")
    assert rend.get("attr") == "index" and rend.get("type") == "graduatedSymbol"
    ranges = rend.find("ranges").findall("range")
    assert len(ranges) == 11
    assert [r.get("label") for r in ranges] == [c[2] for c in INDEX_CLASSES]
    assert float(ranges[0].get("lower")) == 0.0
    assert float(ranges[-1].get("upper")) == 100.0
    symbols = rend.find("symbols").findall("symbol")
    colors = []
    for s in symbols:
        for opt in s.iter("Option"):
            if opt.get("name") == "line_color":
                colors.append(opt.get("value"))
    assert colors == [c[3] for c in INDEX_CLASSES]


def test_spatial_partition_pruning(spark, tmp_path):
    """A pcell-partitioned layout prunes at the scan: the filtered read
    plans PartitionFilters and returns exactly the partition's rows."""
    from osm_cycling_quality_index_spark.sources.layout import (
        with_partition_cell, write_spatially_partitioned,
    )
    from osm_cycling_quality_index_spark.plans.geo_queries import _points_df

    pts = _points_df(spark, SF)
    path = str(tmp_path / "pts_by_cell")
    write_spatially_partitioned(pts, path, res=5)
    want = with_partition_cell(pts, 5).groupBy("pcell").count().orderBy(
        F.desc("count")).first()
    got = spark.read.parquet(path).where(F.col("pcell") == want["pcell"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pcell" in plan.split("PartitionFilters")[1][:120]
    assert got.count() == want["count"]


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the cell key sort-merge join with zero
    exchanges — the persistent co-location strategy for recurring spatial
    joins."""
    from osm_cycling_quality_index_spark.sources.layout import (
        bucketed_join, save_bucketed,
    )

    a = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("cell"), F.col("id").alias("pid"))
    b = spark.range(0, 300).select(
        (F.col("id") % 97).alias("cell"), F.col("id").alias("wid"))
    save_bucketed(a, "pts_bkt", "cell", 8)
    save_bucketed(b, "ways_bkt", "cell", 8)
    try:
        # disable broadcast so the join strategy under test is sort-merge
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "pts_bkt", "ways_bkt", "cell")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        want = a.join(b, "cell").count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS pts_bkt")
        spark.sql("DROP TABLE IF EXISTS ways_bkt")


def test_word_ids_layout_invariance(spark):
    """Regression for the round-2 nondeterminism bug: dictionary word ids
    must be identical whatever the physical partitioning of the token frame
    (the old spark_partition_id()-based rank broke under AQE re-layout)."""
    from osm_cycling_quality_index_spark.operators.dedup import tokenize, word_ids

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = tokenize(docs, "text", "shingle")
    layouts = [
        toks,
        toks.repartition(3),
        toks.repartition(17, "doc_id"),
        toks.coalesce(1),
    ]
    results = [
        {(r["word"], r["word_id"])
         for r in word_ids(t).select("word", "word_id").distinct().collect()}
        for t in layouts
    ]
    assert all(r == results[0] for r in results[1:])
    assert len(results[0]) > 100


def test_ivf_lloyd_recall(spark):
    """The Lloyd-refined IVF quantizer (production knob) meets the same
    recall floor as the seed quantizer and stays deterministic."""
    from osm_cycling_quality_index_spark.operators import ann

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_emb")
    )
    exact = ann.brute_force_topk(emb, queries, k=5)
    a1 = ann.ivf_topk(emb, queries, k=5, lloyd_iters=2)
    a2 = ann.ivf_topk(emb, queries, k=5, lloyd_iters=2)
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
    hits = exact.join(a1, ["query_id", "vec_id"], "left_semi").count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"lloyd recall@5 = {recall:.2f}"


def test_knn_auto_strategy(spark):
    """The auto wrapper picks broadcast for a small dimension and shuffle
    past the threshold; both deliver identical rows."""
    from osm_cycling_quality_index_spark.operators import images as I
    from osm_cycling_quality_index_spark.sources import synth

    wpdf = synth.ways_pdf(n_roads=30)
    ways = synth.ways_df(spark, n_roads=30).select("id", "geometry")
    imgs = synth.images_df(spark, wpdf, n_images=200).select("image_id", "lon", "lat")
    cols = ["image_id", "way_id", "rank"]
    bc = I.knn_ways_auto(imgs, ways, k=2).select(cols)
    sh = I.knn_ways_auto(imgs, ways, k=2, max_broadcast_ways=1).select(cols)
    assert bc.exceptAll(sh).count() == 0 and sh.exceptAll(bc).count() == 0


def test_main_resume_from_checkpoint(tmp_path):
    """main.py re-run with the same --checkpoint must resume from the
    committed snapshot (same scored output, snapshot count unchanged for
    the scored stage)."""
    import json
    import subprocess
    import sys

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    ckpt = str(tmp_path / "ckpt")
    cmd = [sys.executable, "main.py", "--synth-roads", "25",
           "--output", None, "--checkpoint", ckpt, "--master", "local[4]"]
    for out in (out1, out2):
        cmd[5] = out
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
    with open(f"{ckpt}/_manifest.json") as fh:
        snaps = [s["stage"] for s in json.load(fh)["snapshots"]]
    assert snaps.count("scored") == 1  # second run resumed, didn't rewrite
    from osm_cycling_quality_index_spark.session import get_spark
    spark = get_spark(master="local[4]")
    a = spark.read.parquet(f"{out1}/scored")
    b = spark.read.parquet(f"{out2}/scored")
    key = [c for c in a.columns if not c.startswith("_lineage")]
    assert a.select(key).exceptAll(b.select(key)).count() == 0
    assert a.count() == b.count() > 0


def test_asof_join_semantics(spark):
    """Edge semantics: no-preceding-right -> NULL, equal timestamps match
    (right sorts first), carry resets per key, payload fields stay atomic."""
    from osm_cycling_quality_index_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, "u1", 10), (2, "u1", 20), (3, "u1", 5), (4, "u2", 7)],
        "event_id long, user_id string, ts long")
    R = spark.createDataFrame(
        [("u1", 10, 100, "a"), ("u1", 15, 101, None), ("u2", 99, 102, "c")],
        "user_id string, ts long, event_id long, tag string")
    out = {r["event_id"]: (r["r_event_id"], r["r_tag"])
           for r in asof_join(L, R, payload=("event_id", "tag")).collect()}
    assert out[1] == (100, "a")        # equal ts matches
    assert out[2] == (101, None)       # later right wins; NULL field stays atomic
    assert out[3] == (None, None)      # nothing precedes ts=5
    assert out[4] == (None, None)      # other key's rows don't leak


def test_range_join_brute_force(spark):
    """Binned range join equals the brute-force theta-join for arbitrary
    spans (including spans much larger than the bin)."""
    import numpy as np

    from osm_cycling_quality_index_spark.operators.ranges import range_join

    rng = np.random.default_rng(13)
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rng.uniform(0, 1000, 800))],
        "point_id long, v double")
    ivs = []
    for i in range(60):
        lo = float(rng.uniform(0, 950))
        ivs.append((i, lo, lo + float(rng.uniform(1, 400))))
    iv = spark.createDataFrame(ivs, "interval_id long, lo double, hi double")
    got = {(r["point_id"], r["interval_id"])
           for r in range_join(pts, iv, bin_size=50.0).collect()}
    want = {(r["point_id"], r["interval_id"])
            for r in pts.crossJoin(iv).where(
                (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))).collect()}
    assert got == want and len(want) > 1000


def test_rollup_composition(spark):
    """Hypertable property: the daily rollup composed from hourly partials
    equals aggregating the raw events directly (fixed-point partials make
    the sums exact in any order)."""
    from osm_cycling_quality_index_spark.functions.rounding import pyround
    from osm_cycling_quality_index_spark.streaming.sessions import (
        hourly_partials, rollup_daily,
    )

    e = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "value_cents", F.round(F.col("value") * 100, 0).cast("long"))
    composed = rollup_daily(hourly_partials(e, "value_cents"), scale=100.0)
    direct = e.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        pyround(F.sum("value_cents") / (F.count(F.lit(1)) * 100.0), 4)
        .alias("avg_value"),
    )
    assert composed.exceptAll(direct).count() == 0
    assert direct.exceptAll(composed).count() == 0


def test_kmv_merge_property(spark):
    """Exact mergeability: per-day partial sketches composed with kmv_merge
    equal sketching the whole table directly, and the estimator lands
    within the expected ~1/sqrt(k) band of truth at k=32."""
    from osm_cycling_quality_index_spark.operators.sketch import (
        kmv_estimate, kmv_merge, kmv_sketch,
    )

    e = spark.read.parquet(f"{SF}/events.parquet")
    direct = kmv_sketch(e, "user_id", "event_type", k=32)
    parts = [
        kmv_sketch(e.where(F.dayofmonth("ts") % 3 == i), "user_id",
                   "event_type", k=32)
        for i in range(3)
    ]
    merged = kmv_merge(*parts, k=32)
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    est = {r["event_type"]: r["est_distinct"]
           for r in kmv_estimate(direct, k=32).collect()}
    exact = {r["event_type"]: r["n"]
             for r in e.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.35, (t, est[t], n)


def test_ann_degenerate_embeddings(spark):
    """Empty or NULL embeddings are dropped by the bucketing (the old
    explode form's behavior), never crash the job or pollute bucket 0."""
    from osm_cycling_quality_index_spark.operators.ann import (
        hyperplane_buckets, lsh_topk,
    )

    emb = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, -0.1]), (2, []), (3, None)],
        "vec_id long, embedding array<float>")
    b = hyperplane_buckets(emb)
    assert {r["vec_id"] for r in b.collect()} == {0, 1}
    q = spark.createDataFrame(
        [(0, [0.1, 0.2])], "query_id long, query_emb array<float>")
    rows = lsh_topk(emb, q, k=5).collect()
    assert all(r["cos_sim"] is not None for r in rows) and len(rows) >= 1


# ---------------------------------------------------------------------------
# dedup groups: pairs -> connected components -> one keeper per cluster
# ---------------------------------------------------------------------------

def test_connected_components_transitive_chain(spark):
    """A~B, B~C (A,C never compared) must land in ONE component; a 6-node
    path forces the hash-min label to propagate over multiple rounds."""
    from osm_cycling_quality_index_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        # component 1: path 10-11-12-13-14-15 (diameter 5 -> >1 round)
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
         # component 2: triangle with a duplicate + reversed edge
         (20, 21), (21, 22), (22, 20), (21, 20)],
        "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
                   20: 20, 21: 20, 22: 20}


def test_dedup_groups_keeper_and_singletons(spark):
    from osm_cycling_quality_index_spark.operators.dedup import dedup_groups

    corpus = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 6), (2, 3)], "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in dedup_groups(corpus, pairs).collect()}
    assert {d: r["group_id"] for d, r in rows.items()} == {
        1: 1, 4: 1, 6: 1, 2: 2, 3: 2, 5: 5, 7: 7}
    assert {d: r["n_members"] for d, r in rows.items()} == {
        1: 3, 4: 3, 6: 3, 2: 2, 3: 2, 5: 1, 7: 1}
    assert [d for d, r in sorted(rows.items()) if r["is_keeper"]] == [1, 2, 5, 7]


# ---------------------------------------------------------------------------
# real BPE subword counts (committed merges table)
# ---------------------------------------------------------------------------

def test_bpe_three_way_equality(spark):
    """Column replace-chain == Arrow-batched twin == classic greedy encoder
    on the corpus, plus a pathological same-pair run (two replace passes
    are exhaustive for the distinct-symbol rules the import guard
    enforces; see functions/bpe.py module doc)."""
    from pyspark.sql import functions as F

    from osm_cycling_quality_index_spark.functions.bpe import (
        _count_doc, bpe_encode_word, bpe_token_count, bpe_token_count_fast,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    col = {r["doc_id"]: r["n"] for r in
           d.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    fast = {r["doc_id"]: r["n"] for r in
            d.select("doc_id", bpe_token_count_fast(F.col("text")).alias("n")).collect()}
    ref = {r["doc_id"]: _count_doc(r["text"], {})
           for r in d.select("doc_id", "text").collect()}
    assert col == fast == ref and len(col) == d.count()
    # merged pieces exist (i.e. this is not a char counter)
    assert bpe_encode_word("lower") == ["low", "er"]
    # run of 8 'e r' pairs + empty text edge
    edge = spark.createDataFrame(
        [(0, "erererererererer"), (1, ""), (2, "er")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in
           edge.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    want = {r["doc_id"]: _count_doc(r["text"], {})
            for r in edge.select("doc_id", "text").collect()}
    assert got == want and got[1] == 0
    # boundary-semantics edges: tab is an ordinary symbol, a literal '|'
    # behaves like a space, NULL stays NULL — column path, fast twin and
    # reference counter must agree on all three
    hard = spark.createDataFrame(
        [(0, "a\tb"), (1, "a|b er"), (2, None), (3, "  er  "),
         (4, "er\ner"), (5, "a\nb c"), (6, "\n\n"), (7, "low\r\ner")],
        "doc_id long, text string")
    col2 = {r["doc_id"]: r["n"] for r in
            hard.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    fast2 = {r["doc_id"]: r["n"] for r in
             hard.select("doc_id", bpe_token_count_fast(F.col("text")).alias("n")).collect()}
    ref2 = {r["doc_id"]: _count_doc(r["text"], {})
            for r in hard.select("doc_id", "text").collect()}
    assert col2 == fast2 == ref2, (col2, fast2, ref2)
    assert col2[2] is None


def test_connected_components_random_graph(spark):
    """Property: Spark hash-min label propagation == reference union-find
    on a deterministic pseudo-random graph (~300 nodes, long paths mixed
    with cliques, several isolated pairs) that needs multiple rounds."""
    from osm_cycling_quality_index_spark.operators.dedup import (
        connected_components,
    )

    edges = []
    # long path 0..59 (diameter 59 stresses round count via doubling)
    edges += [(i, i + 1) for i in range(59)]
    # cliques of 6 at 100.., 200..
    for base in (100, 200):
        edges += [(base + i, base + j) for i in range(6) for j in range(i + 1, 6)]
    # pseudo-random sparse edges over 300..399 (deterministic LCG)
    x = 7
    for _ in range(60):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = 300 + (x % 100)
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = 300 + (x % 100)
        if a != b:
            edges.append((a, b))

    parent = {}
    def find(v):
        while parent.setdefault(v, v) != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v
    for a, b in edges:
        parent[find(a)] = find(b)
    # reference label: min node id per component
    comp_min = {}
    for v in list(parent):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(df, max_iter=64).collect()}
    assert got == want


def test_dedup_groups_no_pairs(spark):
    """Empty near-dup pair list: every corpus row is its own keeper."""
    from osm_cycling_quality_index_spark.operators.dedup import dedup_groups

    corpus = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    rows = dedup_groups(corpus, pairs).collect()
    assert len(rows) == 5
    assert all(r["group_id"] == r["doc_id"] and r["n_members"] == 1
               and r["is_keeper"] == 1 for r in rows)


def test_no_cartesian_in_any_driver_query(spark):
    """Plan-shape regression guard: no driver query may compile to a
    CartesianProduct or BroadcastNestedLoopJoin — every candidate join in
    the engine is an equi-join by design (cell buckets, LSH bands, bins).
    Allowed exceptions are the queries whose crossJoin is explicit and
    broadcast-bounded by design: semi_anti_counts (1x1 cross of two
    single-row aggregates), embedding_topk (the brute-force exact
    baseline IS all-pairs — corpus x broadcast query frame), and
    ivf_topk (corpus x broadcast KB-sized centroid table for inverted
    list assignment)."""
    import __spark_entry__ as E

    allowed = {"semi_anti_counts", "embedding_topk", "ivf_topk"}
    sf = SF
    bad = {}
    for name, fn in E.queries().items():
        if name in allowed:
            continue
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        hits = [op for op in ("CartesianProduct", "BroadcastNestedLoopJoin")
                if op in plan]
        if hits:
            bad[name] = hits
        spark.catalog.clearCache()
    assert not bad, bad


# ---------------------------------------------------------------------------
# corpus quality: repetition stats + benchmark decontamination
# ---------------------------------------------------------------------------

def test_repetition_stats_hand_cases(spark):
    from osm_cycling_quality_index_spark.operators.quality import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b a b"),      # dup 2/3 of words repeat; top bigram 'a b' 3/5
         (1, "x y z"),            # all distinct; each bigram once -> 1/2
         (2, "w"),                # one word: no bigrams
         (3, "")],                # empty
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_words"] == 6
    assert abs(got[0]["dup_word_frac"] - round(1 - 2 / 6, 6)) < 1e-9
    assert abs(got[0]["top_bigram_frac"] - 0.6) < 1e-9  # 'a b' 3 of 5
    assert got[1]["top_bigram_frac"] == 0.5
    assert got[2]["n_words"] == 1 and got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_words"] == 0 and got[3]["dup_word_frac"] == 0.0


def test_decontaminate_flags_only_real_overlap(spark):
    from osm_cycling_quality_index_spark.operators.quality import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "prefix the quick brown fox jumps over suffix"),  # 5-gram hit
         (1, "the quick brown fox sleeps all day long"),       # only 4-gram
         (2, "completely unrelated words here today friend")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(corpus, bench, n=5).collect()}
    assert got[0][1] == 1 and got[0][0] >= 1
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
