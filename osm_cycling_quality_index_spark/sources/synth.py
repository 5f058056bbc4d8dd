"""Deterministic synthetic fixtures: Berlin-like ways + geotagged images
(FIXTURES.md §1-2; BASELINE.json input_hint; no external data).

Everything derives from a seed + row index via modular arithmetic so the same
tables can be regenerated bit-identically anywhere (tests, bench, oracle SQL).
Layout: east-west "roads" on a lat grid with parallel paths at controlled
offsets (inside/outside the 22 m sidepath buffer), tag coverage per
FIXTURES.md generator requirements (all 16 way types, checks<=2 and >2 votes,
';' surfaces, pipe lanes, parking/buffer dooring cases, junk numerics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from ..geo.kernels import MPD_X, MPD_Y
from ..imaging import codec
from ..imaging.phash import phash64_batch32

LON_W, LON_E = 13.05, 13.75
LAT_S, LAT_N = 52.35, 52.65

_HIGHWAYS = [
    "residential", "primary", "secondary", "tertiary", "unclassified",
    "living_street", "service", "track", "pedestrian", "trunk",
]
_SURFACES = [
    None, "asphalt", "paving_stones", "sett", "compacted", "asphalt;sett",
    "gravel", "cobblestone", "unknown_surface", "concrete",
]
_SMOOTHNESS = [None, "excellent", "good", "intermediate", "bad", None, None, "very_bad"]
_MAXSPEEDS = [None, "30", "50", "30", "walk", "none", "50", "70", "100", "10", "junk"]
_WIDTHS = [None, "5.5", "7", "11", "4.2", "ca. 5m", "6.5", None, "9", "3.1"]
_LIT = [None, "yes", "no", "yes"]


def ways_pdf(n_roads: int = 60, seed: int = 42) -> pd.DataFrame:
    """Roads + paths as a pandas frame with ``geometry`` =
    list[{'x': lon, 'y': lat}].  ~3.3 rows per road."""
    rows: list[dict] = []
    lat_step = 0.004  # ~445 m between road rows
    m2lon = 1.0 / MPD_X  # metres -> degrees lon
    m2lat = 1.0 / MPD_Y

    for i in range(n_roads):
        lat = LAT_S + (i % 64) * lat_step + (i // 64) * 0.0003
        lon0 = LON_W + (i % 7) * 0.08
        length_m = 400 + (i % 5) * 300  # 400..1600 m
        lon1 = lon0 + length_m * m2lon
        hw = _HIGHWAYS[i % len(_HIGHWAYS)]
        road = {
            "id": f"r{i}",
            "geometry": [{"x": lon0, "y": lat}, {"x": lon1, "y": lat}],
            "highway": hw,
            "name": f"Strasse {i % 17}",
            "maxspeed": _MAXSPEEDS[i % len(_MAXSPEEDS)],
            "width": _WIDTHS[i % len(_WIDTHS)],
            "surface": _SURFACES[i % len(_SURFACES)],
            "smoothness": _SMOOTHNESS[i % len(_SMOOTHNESS)],
            "lit": _LIT[i % len(_LIT)],
        }
        if i % 4 == 1:
            road["cycleway:right"] = ["lane", "track", "share_busway"][i % 3]
            road["oneway"] = ["yes", "no", None][i % 3]
        if i % 4 == 2:
            road["cycleway:both"] = "lane"
            road["cycleway:both:width"] = ["1.5", "2", None][i % 3]
            road["cycleway:right:buffer"] = [None, "0.5", "no"][i % 3]
            road["parking:right"] = [None, "lane", "half_on_kerb"][i % 3]
            road["parking:right:orientation"] = [None, "diagonal", None][i % 3]
        if i % 7 == 3:
            road["sidewalk:right:bicycle"] = "yes"
        if i % 5 == 4:
            road["lane_markings"] = "yes"
            road["lanes"] = str(2 + i % 3)
        if i % 6 == 5:
            road["width:lanes"] = "2|2.5|3.5" if i % 2 else "2|"
        if i % 11 == 7:
            road["bicycle_road"] = "yes"
        if i % 13 == 9:
            road["motor_vehicle"] = ["no", "destination", "agricultural"][i % 3]
        if i % 9 == 6:
            road["oneway"] = "-1" if i % 2 else "yes"
            road["oneway:bicycle"] = "no"
        rows.append(road)

        # parallel path: offset 10 m (sidepath) or 60 m (not a sidepath)
        if i % 2 == 0:
            off_m = 10.0 if i % 4 == 0 else 60.0
            plat = lat + off_m * m2lat
            path_hw = ["cycleway", "footway", "path"][i % 3]
            path = {
                "id": f"p{i}",
                "geometry": [{"x": lon0, "y": plat}, {"x": lon1, "y": plat}],
                "highway": path_hw,
                "surface": _SURFACES[(i + 3) % len(_SURFACES)],
                "smoothness": _SMOOTHNESS[(i + 2) % len(_SMOOTHNESS)],
                "width": [None, "2", "2.5", "3.5"][i % 4],
                "lit": _LIT[(i + 1) % len(_LIT)],
            }
            if path_hw == "footway":
                path["bicycle"] = ["yes", "designated", None][i % 3]
                if i % 8 == 4:
                    path["footway"] = "sidewalk"
            if path_hw == "path":
                path["foot"] = ["designated", None][i % 2]
                path["segregated"] = ["yes", "no", None][i % 3]
                path["bicycle"] = ["designated", "yes", None][i % 3]
            if path_hw == "cycleway":
                path["foot"] = [None, "yes", None, None][i % 4]
                path["oneway"] = [None, "yes", "no"][i % 3]
                if i % 10 == 0:
                    path["is_sidepath"] = "yes"
                if i % 12 == 6:
                    path["traffic_sign"] = ["DE:237", "DE:240,1022-10", "DE:none"][i % 3]
                if i % 14 == 8:
                    path["separation:left"] = ["kerb", "greenery", "no"][i % 3]
                    path["buffer:left"] = ["0.5", "1.5", None][i % 3]
                    path["traffic_mode:left"] = [None, "parking", "motor_vehicle"][i % 3]
            rows.append(path)

        # short isolated path every 8th road (checks <= 2 vote case)
        if i % 8 == 3:
            slat = lat + 0.0015
            slon = lon0 + 0.02
            rows.append({
                "id": f"s{i}",
                "geometry": [
                    {"x": slon, "y": slat},
                    {"x": slon + 80.0 * m2lon, "y": slat},
                ],
                "highway": "cycleway",
                "width": "1.8",
            })

    pdf = pd.DataFrame(rows)
    return pdf.astype({c: object for c in pdf.columns if c != "geometry"}).where(
        pd.notna(pdf), None
    )


def ways_df(spark: SparkSession, n_roads: int = 60, seed: int = 42) -> DataFrame:
    pdf = ways_pdf(n_roads, seed)
    geom_t = ArrayType(StructType([StructField("x", DoubleType()), StructField("y", DoubleType())]))
    fields = [
        StructField(c, geom_t if c == "geometry" else StringType())
        for c in pdf.columns
    ]
    return spark.createDataFrame(pdf, StructType(fields))


IMAGE_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("bytes", BinaryType()),
    StructField("w", IntegerType()),
    StructField("h", IntegerType()),
    StructField("fmt", StringType()),
    StructField("caption", StringType()),
    StructField("phash", LongType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
])


def images_pdf(
    ways: pd.DataFrame, n_images: int = 500, seed: int = 42, return_pixels: bool = False
):
    """Geotagged image+caption rows placed at controlled distances from the
    ways (input_hint schema + lon/lat)."""
    rng = np.random.default_rng(seed)
    geoms = list(ways["geometry"])
    ids = list(ways["id"])
    n_ways = len(geoms)
    way_idx = rng.integers(0, n_ways, n_images)
    t = rng.uniform(0, 1, n_images)
    lateral_m = rng.uniform(-30, 30, n_images)

    lons = np.empty(n_images)
    lats = np.empty(n_images)
    for k in range(n_images):
        g = geoms[way_idx[k]]
        x0, y0, x1, y1 = g[0]["x"], g[0]["y"], g[-1]["x"], g[-1]["y"]
        lons[k] = x0 + t[k] * (x1 - x0)
        lats[k] = y0 + t[k] * (y1 - y0) + lateral_m[k] / MPD_Y

    # deterministic 32x32 RGB gradients + seeded noise
    base = rng.integers(0, 200, (n_images, 1, 1, 3))
    gx = np.linspace(0, 55, 32).reshape(1, 1, 32, 1)
    gy = np.linspace(0, 40, 32).reshape(1, 32, 1, 1)
    noise = rng.integers(0, 16, (n_images, 32, 32, 3))
    stack = np.clip(base + gx + gy + noise, 0, 255).astype(np.uint8)
    hashes = phash64_batch32(stack)
    fmts = np.where(np.arange(n_images) % 2 == 0, "png", "jpeg")
    blobs = [codec.encode(stack[k], fmts[k]) for k in range(n_images)]
    pdf = pd.DataFrame({
        "image_id": [f"img{k}" for k in range(n_images)],
        "bytes": blobs,
        "w": np.full(n_images, 32, dtype=np.int32),
        "h": np.full(n_images, 32, dtype=np.int32),
        "fmt": fmts,
        "caption": [
            f"view of {ids[way_idx[k]]} at km {t[k]:.3f}" for k in range(n_images)
        ],
        "phash": hashes,
        "lon": lons,
        "lat": lats,
    })
    return (pdf, stack) if return_pixels else pdf


def images_df(
    spark: SparkSession, ways: pd.DataFrame, n_images: int = 500, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(images_pdf(ways, n_images, seed), IMAGE_SCHEMA)
