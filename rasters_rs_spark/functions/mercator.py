"""Web-mercator tile math + hand-rolled CRS projections (pure numpy).

The reference delegates CRS conversion to PROJ (raster-tile/tiling/
web_mercator.rs:15-41); this environment has no pyproj, so we implement:

- spherical ("popular visualisation") mercator forward, EPSG:3857
- transverse-mercator forward/inverse (Krueger series, 4th order in n)
  which covers the UTM CRSs used by the reference's golden fixture
  (EPSG:32643 = WGS84 / UTM zone 43N)

Tile math mirrors raster-tile/tiling/web_mercator.rs:43-102 exactly,
including the truncated MAX_COORD constant (20037508, not ...508.34).
The (z, x, y) quadkey produced here is this engine's hierarchical cell
index (the H3/S2 analogue): k-ring neighborhoods are (x +/- k, y +/- k)
windows at fixed z.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
MAX_COORD = 20037508.0  # reference web_mercator.rs:43

# -- Krueger series coefficients (order n^4) --------------------------------

_N = WGS84_F / (2.0 - WGS84_F)
_N2, _N3, _N4 = _N * _N, _N**3, _N**4
# rectifying radius
_A_CAP = WGS84_A / (1.0 + _N) * (1.0 + _N2 / 4.0 + _N4 / 64.0)
# forward series (geodetic -> TM)
_ALPHA = (
    _N / 2.0 - 2.0 * _N2 / 3.0 + 5.0 * _N3 / 16.0 + 41.0 * _N4 / 180.0,
    13.0 * _N2 / 48.0 - 3.0 * _N3 / 5.0 + 557.0 * _N4 / 1440.0,
    61.0 * _N3 / 240.0 - 103.0 * _N4 / 140.0,
    49561.0 * _N4 / 161280.0,
)
# inverse series (TM -> conformal)
_BETA = (
    _N / 2.0 - 2.0 * _N2 / 3.0 + 37.0 * _N3 / 96.0 - _N4 / 360.0,
    _N2 / 48.0 + _N3 / 15.0 - 437.0 * _N4 / 1440.0,
    17.0 * _N3 / 480.0 - 37.0 * _N4 / 840.0,
    4397.0 * _N4 / 161280.0,
)
# conformal -> geodetic latitude series
_DELTA = (
    2.0 * _N - 2.0 * _N2 / 3.0 - 2.0 * _N3 + 116.0 * _N4 / 45.0,
    7.0 * _N2 / 3.0 - 8.0 * _N3 / 5.0 - 227.0 * _N4 / 45.0,
    56.0 * _N3 / 15.0 - 136.0 * _N4 / 35.0,
    4279.0 * _N4 / 630.0,
)
_E = math.sqrt(WGS84_F * (2.0 - WGS84_F))  # first eccentricity


def tm_forward(lat_deg, lon_deg, lon0_deg: float, k0: float = 0.9996,
               false_e: float = 500000.0, false_n: float = 0.0):
    """Geodetic (deg) -> transverse-mercator easting/northing. Vectorized."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64)) - math.radians(lon0_deg)

    t = np.sinh(np.arctanh(np.sin(phi)) - _E * np.arctanh(_E * np.sin(phi)))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2.0 * j * xi_p) * np.cosh(2.0 * j * eta_p)
        eta += a * np.cos(2.0 * j * xi_p) * np.sinh(2.0 * j * eta_p)

    easting = false_e + k0 * _A_CAP * eta
    northing = false_n + k0 * _A_CAP * xi
    return easting, northing


def tm_inverse(easting, northing, lon0_deg: float, k0: float = 0.9996,
               false_e: float = 500000.0, false_n: float = 0.0):
    """Transverse-mercator easting/northing -> geodetic (deg). Vectorized."""
    xi = (np.asarray(northing, dtype=np.float64) - false_n) / (k0 * _A_CAP)
    eta = (np.asarray(easting, dtype=np.float64) - false_e) / (k0 * _A_CAP)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2.0 * j * chi)

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.rad2deg(phi), np.rad2deg(lam) + lon0_deg


def lonlat_to_wm(lon_deg, lat_deg):
    """EPSG:4326 -> EPSG:3857 (spherical formulas on geodetic lat)."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = WGS84_A * np.deg2rad(lon)
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def wm_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / WGS84_A)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lon, lat


# -- minimal CRS registry ----------------------------------------------------


def _parse_epsg(crs: str):
    if crs.upper().startswith("EPSG:"):
        return int(crs.split(":")[1])
    return None


def world_to_wm_fn(crs: str):
    """Return a vectorized (x, y) -> (wm_x, wm_y) function for a CRS string.

    Supported: ``EPSG:3857`` / ``IDENTITY`` (passthrough), ``EPSG:4326``
    (lon/lat), and UTM north zones ``EPSG:326xx`` via the Krueger series.
    """
    if crs is None or crs.upper() in ("IDENTITY", "EPSG:3857", ""):
        return lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    code = _parse_epsg(crs)
    if code == 4326:
        return lambda x, y: lonlat_to_wm(x, y)
    if code is not None and 32601 <= code <= 32660:
        lon0 = (code - 32600) * 6.0 - 183.0
        def fn(x, y, lon0=lon0):
            lat, lon = tm_inverse(x, y, lon0)
            return lonlat_to_wm(lon, lat)
        return fn
    if code is not None and 32701 <= code <= 32760:
        lon0 = (code - 32700) * 6.0 - 183.0
        def fn(x, y, lon0=lon0):
            lat, lon = tm_inverse(x, y, lon0, false_n=10000000.0)
            return lonlat_to_wm(lon, lat)
        return fn
    raise ValueError(f"unsupported CRS: {crs}")


# -- web-mercator tile math (reference web_mercator.rs:43-102) ---------------


def tile_size(zoom: int) -> float:
    return 2.0 * MAX_COORD / float(1 << zoom)


def tile_index_transform(zoom: int) -> np.ndarray:
    ts = tile_size(zoom)
    return np.array(
        [[1.0 / ts, 0.0, MAX_COORD / ts], [0.0, 1.0 / ts, MAX_COORD / ts], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )


def tile_index(zoom: int, x, y):
    """WM coords -> integer tile index (vectorized)."""
    ts = tile_size(zoom)
    tx = np.floor((np.asarray(x, dtype=np.float64) + MAX_COORD) / ts).astype(np.int64)
    ty = np.floor((np.asarray(y, dtype=np.float64) + MAX_COORD) / ts).astype(np.int64)
    return tx, ty


def zoom_for_resolution(pixel_dist: float, tile_res: int) -> float:
    base_pixel_size = tile_size(0) / float(tile_res)
    return math.log2(base_pixel_size / pixel_dist)


def largest_zoom_containing(bounds) -> int:
    """Largest zoom with the whole bounds inside one tile.

    ``bounds`` is (minx, miny, maxx, maxy) in WM coords.
    Reference web_mercator.rs:84-93 (starts probing at zoom 1).
    """
    zoom = 1
    while zoom <= 31:  # beyond z31 tile indexes exceed practical range;
        # degenerate (point) bounds would otherwise loop forever
        lx, ty = tile_index(zoom, bounds[0], bounds[1])
        rx, by = tile_index(zoom, bounds[2], bounds[3])
        if int(lx) != int(rx) or int(ty) != int(by):
            return zoom - 1
        zoom += 1
    return 31
