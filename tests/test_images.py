"""Image geotag join, kNN, tile assignment and payload invariants vs
brute-force oracles (SURVEY.md §5, FIXTURES.md §3b-3d)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_cycling_quality_index_spark.geo import kernels as K
from osm_cycling_quality_index_spark.operators import images as I
from osm_cycling_quality_index_spark.sources import synth


@pytest.fixture(scope="module")
def data(spark):
    ways_pdf = synth.ways_pdf(n_roads=24)
    ways = synth.ways_df(spark, n_roads=24)
    imgs_pdf = synth.images_pdf(ways_pdf, n_images=120)
    imgs = synth.images_df(spark, ways_pdf, n_images=120)
    return ways_pdf, ways, imgs_pdf, imgs


def _brute_knn(ways_pdf, imgs_pdf, k):
    """O(images x segments) exact kNN oracle."""
    segs = []
    for _, w in ways_pdf.iterrows():
        g = w["geometry"]
        lons = np.array([p["x"] for p in g])
        lats = np.array([p["y"] for p in g])
        x, y = K.project(lons, lats)
        for i in range(len(x) - 1):
            segs.append((w["id"], x[i], y[i], x[i + 1], y[i + 1]))
    out = {}
    px, py = K.project(imgs_pdf["lon"].to_numpy(), imgs_pdf["lat"].to_numpy())
    for j, img_id in enumerate(imgs_pdf["image_id"]):
        best: dict[str, float] = {}
        for wid, ax, ay, bx, by in segs:
            d = float(K.point_segment_distance(
                np.array([px[j]]), np.array([py[j]]),
                np.array([ax]), np.array([ay]), np.array([bx]), np.array([by]),
            )[0])
            if wid not in best or d < best[wid]:
                best[wid] = d
        ranked = sorted(best.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        out[img_id] = ranked
    return out


def test_knn_matches_bruteforce(spark, data):
    ways_pdf, ways, imgs_pdf, imgs = data
    k = 3
    got = {
        r["image_id"]: (r["rank"], r["way_id"], r["dist_m"])
        for r in I.knn_ways(imgs, ways, k=k).collect()
    }
    rows = I.knn_ways(imgs, ways, k=k).collect()
    by_img: dict[str, list] = {}
    for r in rows:
        by_img.setdefault(r["image_id"], []).append((r["rank"], r["way_id"], r["dist_m"]))
    oracle = _brute_knn(ways_pdf, imgs_pdf, k)
    assert set(by_img) == set(oracle)
    for img_id, expected in oracle.items():
        mine = sorted(by_img[img_id])
        assert len(mine) == len(expected), img_id
        for (rk, wid, d), (ewid, ed) in zip(mine, expected):
            assert wid == ewid, (img_id, mine, expected)
            assert d == pytest.approx(ed, abs=1e-9)


def test_geotag_join_nearest(spark, data):
    ways_pdf, ways, imgs_pdf, imgs = data
    got = {r["image_id"]: r["way_id"] for r in I.geotag_join(imgs, ways).collect()}
    oracle = _brute_knn(ways_pdf, imgs_pdf, 1)
    for img_id, expected in oracle.items():
        assert got[img_id] == expected[0][0], img_id


def test_tile_assignment_matches_bruteforce(spark, data):
    ways_pdf, ways, _, imgs = data
    size = 500.0
    got = {(r["tile_id"], r["way_id"]) for r in I.way_tile_assignment(ways, size).collect()}
    expected = set()
    for _, w in ways_pdf.iterrows():
        g = w["geometry"]
        lons = np.array([p["x"] for p in g])
        lats = np.array([p["y"] for p in g])
        x, y = K.project(lons, lats)
        for i in range(len(x) - 1):
            for tx, ty in K.rasterize_segment_tiles(x[i], y[i], x[i + 1], y[i + 1], size):
                expected.add((I.pack_tile(tx, ty), w["id"]))
    assert got == expected
    # image-tile membership is consistent with ray-cast PIP on the tile square
    img_tiles = {r["image_id"]: r["tile_id"] for r in I.image_tile_assignment(imgs, size).collect()}
    ipdf = synth.images_pdf(ways_pdf, n_images=120)
    px, py = K.project(ipdf["lon"].to_numpy(), ipdf["lat"].to_numpy())
    for j, img_id in enumerate(ipdf["image_id"]):
        tid = img_tiles[img_id]
        ty = (tid & ((1 << 31) - 1)) - (1 << 30)
        tx = (tid >> 31) - (1 << 30)
        poly_x = np.array([tx, tx + 1, tx + 1, tx], dtype=np.float64) * size
        poly_y = np.array([ty, ty, ty + 1, ty + 1], dtype=np.float64) * size
        assert K.ray_cast_pip(
            np.array([px[j] + 1e-9]), np.array([py[j] + 1e-9]), poly_x, poly_y
        )[0], img_id


def test_payload_invariants(spark, data):
    """Per-row invariants after the Spark round trip: decode ok, caption
    equality, phash stability, PSNR >= 40 dB vs the true source pixels
    (BASELINE.json input_hint)."""
    ways_pdf, _, imgs_pdf, imgs = data
    stats = {r["image_id"]: r.asDict() for r in I.verify_payloads(imgs).collect()}
    assert all(s["ok"] for s in stats.values())
    assert all(s["caption_ok"] for s in stats.values())
    for s in stats.values():
        assert s["phash_dist"] <= 16, s  # lossless: 0; lossy: small drift
        if int(s["image_id"][3:]) % 2 == 0:  # png rows
            assert s["phash_dist"] == 0, s

    from osm_cycling_quality_index_spark.imaging import codec

    src_pdf, stack = synth.images_pdf(ways_pdf, n_images=120, return_pixels=True)
    blobs = {r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["caption"]) for r in imgs.collect()}
    for j, img_id in enumerate(src_pdf["image_id"]):
        data_, fmt, caption = blobs[img_id]
        assert caption == src_pdf["caption"][j]  # caption equality
        dec = codec.decode(data_, fmt)
        p = codec.psnr(stack[j], dec)
        if fmt == "png":
            assert p == float("inf")
        else:
            assert p >= 40.0, (img_id, p)


def test_payload_psnr_via_synth_source(spark):
    """PSNR >= 40 dB (lossy) / exact (png) against the true source pixels."""
    import pandas as pd
    from osm_cycling_quality_index_spark.imaging import codec
    from osm_cycling_quality_index_spark.imaging.phash import phash64_batch32

    rng = np.random.default_rng(7)
    stack = rng.integers(0, 256, (40, 32, 32, 3), dtype=np.uint8)
    for j in range(40):
        fmt = "png" if j % 2 == 0 else "jpeg"
        blob = codec.encode(stack[j], fmt)
        dec = codec.decode(blob, fmt)
        if fmt == "png":
            assert (dec == stack[j]).all()
        else:
            assert codec.psnr(stack[j], dec) >= 40.0
