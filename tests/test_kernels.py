"""Geometry kernel unit tests (G1-G5)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_cycling_quality_index_spark.geo import kernels as K


def test_project_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(13.0, 13.8, 1000)
    lat = rng.uniform(52.3, 52.7, 1000)
    x, y = K.project(lon, lat)
    lon2, lat2 = K.unproject(x, y)
    np.testing.assert_allclose(lon, lon2, rtol=0, atol=1e-12)
    np.testing.assert_allclose(lat, lat2, rtol=0, atol=1e-12)


def test_points_along_line_spacing():
    # ~203 m east-west line -> points at 0, 100, 200 + endpoint
    lons = np.array([13.4, 13.4 + 203.0 / K.MPD_X])
    lats = np.array([52.5, 52.5])
    px, py = K.points_along_line(lons, lats, 100.0)
    assert len(px) == 4
    d = np.hypot(np.diff(px), np.diff(py))
    np.testing.assert_allclose(d[:2], 100.0, atol=1e-6)
    np.testing.assert_allclose(d[2], 3.0, atol=1e-6)


def test_points_along_short_line():
    # shorter than spacing -> first vertex + endpoint (checks == 2,
    # reference/parameter.py:19 "or on the first and last node")
    lons = np.array([13.4, 13.4 + 40.0 / K.MPD_X])
    lats = np.array([52.5, 52.5])
    px, _ = K.points_along_line(lons, lats, 100.0)
    assert len(px) == 2


def test_point_segment_distance():
    d = K.point_segment_distance(
        np.array([0.0, 10.0, -10.0]), np.array([5.0, 0.0, 0.0]),
        np.zeros(3), np.zeros(3), np.array([10.0] * 3), np.zeros(3),
    )
    np.testing.assert_allclose(d, [5.0, 0.0, 10.0])


def test_offset_polyline_distance():
    lons = np.array([13.4, 13.41, 13.42])
    lats = np.array([52.5, 52.5, 52.5])
    olon, olat = K.offset_polyline(lons, lats, 5.0)
    x0, y0 = K.project(lons, lats)
    x1, y1 = K.project(olon, olat)
    np.testing.assert_allclose(y1 - y0, 5.0, atol=1e-6)  # left of eastward = north
    olon2, olat2 = K.offset_polyline(lons, lats, -5.0)
    _, y2 = K.project(olon2, olat2)
    np.testing.assert_allclose(y2 - y0, -5.0, atol=1e-6)


def test_ray_cast_pip_square_and_concave():
    sq_x, sq_y = np.array([0, 1, 1, 0.0]), np.array([0, 0, 1, 1.0])
    inside = K.ray_cast_pip(
        np.array([0.5, 1.5, -0.1, 0.01]), np.array([0.5, 0.5, 0.5, 0.99]), sq_x, sq_y
    )
    assert inside.tolist() == [True, False, False, True]
    # concave "L" polygon
    lx = np.array([0, 2, 2, 1, 1, 0.0])
    ly = np.array([0, 0, 1, 1, 2, 2.0])
    inside = K.ray_cast_pip(
        np.array([1.5, 1.5, 0.5]), np.array([0.5, 1.5, 1.5]), lx, ly
    )
    assert inside.tolist() == [True, False, True]


def test_rasterize_segment_tiles():
    tiles = K.rasterize_segment_tiles(5.0, 5.0, 25.0, 15.0, 10.0)
    assert (0, 0) in tiles and (2, 1) in tiles
    assert all(0 <= tx <= 2 and 0 <= ty <= 1 for tx, ty in tiles)
