"""Projection + tile-math tests.

The UTM oracle values below are standard published test points for the
WGS84 UTM grid (computable with any geodesy library); the tile-math
cases mirror web_mercator.rs semantics.
"""

import numpy as np

from rasters_rs_spark.functions import mercator as M


def test_tm_roundtrip():
    lat = np.array([0.5, 18.6, 45.0, 70.0, -33.9])
    lon = np.array([74.0, 73.7, 76.5, 72.1, 75.0])
    e, n = M.tm_forward(lat, lon, lon0_deg=75.0)
    lat2, lon2 = M.tm_inverse(e, n, lon0_deg=75.0)
    assert np.allclose(lat, lat2, atol=1e-10)
    assert np.allclose(lon, lon2, atol=1e-10)


def test_utm_known_point():
    # Classic check: the UTM zone 31N point for (lat 0, lon 3deg = central
    # meridian) must be exactly (500000, 0).
    e, n = M.tm_forward(0.0, 3.0, lon0_deg=3.0)
    assert abs(float(e) - 500000.0) < 1e-6
    assert abs(float(n)) < 1e-6
    # On the central meridian, northing must equal k0 * meridian arc length.
    # Anchors computed by direct numerical integration of the meridian
    # integral (independent of the Krueger series; agreement < 1e-7 m).
    anchors = {10.0: 1105412.4913010788, 45.0: 4982950.4002265725,
               70.0: 7765873.135479117}
    for lat, n_ref in anchors.items():
        e, n = M.tm_forward(lat, 75.0, lon0_deg=75.0)
        assert abs(float(e) - 500000.0) < 1e-6
        assert abs(float(n) - n_ref) < 1e-4


def test_spherical_mercator():
    x, y = M.lonlat_to_wm(0.0, 0.0)
    assert float(x) == 0.0 and abs(float(y)) < 1e-9
    x, y = M.lonlat_to_wm(180.0, 0.0)
    assert abs(float(x) - 20037508.342789244) < 1e-6
    lon, lat = M.wm_to_lonlat(*M.lonlat_to_wm(73.7, 18.6))
    assert abs(float(lon) - 73.7) < 1e-12
    assert abs(float(lat) - 18.6) < 1e-12


def test_tile_math_reference_semantics():
    # tile_size uses the truncated constant 20037508 (web_mercator.rs:43)
    assert M.tile_size(0) == 2 * 20037508.0
    assert M.tile_size(3) == 2 * 20037508.0 / 8
    tx, ty = M.tile_index(1, -1.0, 1.0)
    assert (int(tx), int(ty)) == (0, 1)
    tx, ty = M.tile_index(1, 1.0, -1.0)
    assert (int(tx), int(ty)) == (1, 0)
    # zoom_for_resolution: at zoom z, pixel width of a 256-tile is ts/256
    z = M.zoom_for_resolution(M.tile_size(5) / 256.0, 256)
    assert abs(z - 5.0) < 1e-12


def test_largest_zoom_containing():
    # a tiny box straddling the origin can never fit in one tile
    assert M.largest_zoom_containing((-1.0, -1.0, 1.0, 1.0)) == 0
    # a box inside one z5-quadrant
    ts5 = M.tile_size(5)
    b = (-20037508.0 + 0.1 * ts5, -20037508.0 + 0.1 * ts5,
         -20037508.0 + 0.4 * ts5, -20037508.0 + 0.4 * ts5)
    assert M.largest_zoom_containing(b) >= 5


def test_utm43n_fixture_neighborhood():
    """The tile golden fixture's geo-transform origin (UTM 43N) should map
    into the z21 tile x=1477958 column (fixture tile-test-fab1-index.json)."""
    fn = M.world_to_wm_fn("EPSG:32643")
    x, y = fn(np.array([363737.54688808107]), np.array([2059515.3774022115]))
    tx, ty = M.tile_index(21, x, y)
    assert int(tx[0]) == 1477958
    assert int(ty[0]) in (1159019, 1159020)
