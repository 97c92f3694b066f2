"""Web-mercator tiling plan (driver-side, pure numpy).

Mirrors the plan-time configuration of the reference's raster-tile
(tiling/mod.rs:13-105): WM bounds from the 4 raster corners with a
north-alignment consistency gate, the wm->pixel matrix, square-pixel
check, zoom range defaults, and per-zoom tile index bounds. Emits the
tile-row work list that the Spark pipeline partitions on.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions import geom, mercator


class TilePlanError(ValueError):
    pass


@dataclass
class TileConfig:
    tile_size: int
    wm_bounds: tuple  # (minx, miny, maxx, maxy)
    wm_to_pix: np.ndarray  # 3x3

    @classmethod
    def for_raster(cls, w: int, h: int, gt, crs: str, tile_size: int = 256) -> "TileConfig":
        if tile_size % 2 != 0:
            raise TilePlanError("tile size must be even")
        pix_t = geom.transform_from_gdal(gt)
        # plan-time validation gates (web_mercator.rs:26-31)
        if abs(pix_t[0, 1]) > 1e-5 or abs(pix_t[1, 0]) > 1e-5:
            raise TilePlanError("transform is not north aligned")
        if abs(abs(pix_t[1, 1]) - abs(pix_t[0, 0])) > 1e-2:
            raise TilePlanError("pixels are not square")

        to_wm = mercator.world_to_wm_fn(crs)

        def pix_to_wm(px, py):
            wx, wy = geom.transform_points(pix_t, px, py)
            return to_wm(wx, wy)

        (left,), (top,) = pix_to_wm([0.0], [0.0])
        (right,), (bot,) = pix_to_wm([float(w)], [float(h)])
        (rt_x,), (rt_y,) = pix_to_wm([float(w)], [0.0])
        (lb_x,), (lb_y,) = pix_to_wm([0.0], [float(h)])

        # corner-consistency gate (tiling/mod.rs:30-35); NaN from a 0/0
        # compares false, matching Rust float semantics
        with np.errstate(invalid="ignore", divide="ignore"):
            if (
                abs(rt_x - right) / right > 1e-5
                or abs(rt_y - top) / top > 1e-5
                or abs(lb_x - left) / left > 1e-5
                or abs(lb_y - bot) / bot > 1e-5
            ):
                raise TilePlanError("transform is not north aligned")

        x_res = (right - left) / float(w)
        y_res = (bot - top) / float(h)
        if abs(abs(x_res) - abs(y_res)) / min(abs(x_res), abs(y_res)) > 0.25:
            raise TilePlanError("pixels are not square in web mercator coords")

        wm_to_pix = np.array(
            [
                [1.0 / x_res, 0.0, -left / x_res],
                [0.0, 1.0 / y_res, -top / y_res],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )
        return cls(
            tile_size=tile_size,
            wm_bounds=geom.bounds_new(left, top, right, bot),
            wm_to_pix=wm_to_pix,
        )

    # -- zoom range (tiling/mod.rs:84-91) ------------------------------------

    def max_zoom(self) -> int:
        pixel_dist = 1.0 / abs(self.wm_to_pix[0, 0])
        return int(np.ceil(mercator.zoom_for_resolution(pixel_dist, self.tile_size)))

    def min_zoom(self) -> int:
        return mercator.largest_zoom_containing(self.wm_bounds)

    def tile_index_bounds(self, zoom: int):
        """[left, top, right+1, bot+1] tile-index bounds (mod.rs:93-99).
        Note 'top' here is the *smaller* tile-y (the naming follows the
        reference; tile y grows with WM y, i.e. northward)."""
        b = self.wm_bounds
        lx, ty = mercator.tile_index(zoom, b[0], b[1])
        rx, by = mercator.tile_index(zoom, b[2], b[3])
        return [int(lx), int(ty), int(rx) + 1, int(by) + 1]

    # -- per-tile-row pixel window (base.rs:19-36) ---------------------------

    def row_pix_bounds(self, zoom: int, tile_y: int):
        """Pixel-coord bounds of one full tile row at ``zoom``."""
        left, _, right, _ = self.tile_index_bounds(zoom)
        ts = mercator.tile_size(zoom)
        # inverse of tile_index_transform: wm = idx * ts - MAX_COORD
        wm_x0 = left * ts - mercator.MAX_COORD
        wm_y0 = tile_y * ts - mercator.MAX_COORD
        wm_x1 = right * ts - mercator.MAX_COORD
        wm_y1 = (tile_y + 1) * ts - mercator.MAX_COORD
        wm_b = geom.bounds_new(wm_x0, wm_y0, wm_x1, wm_y1)
        x0, y0 = geom.transform_points(self.wm_to_pix, [wm_b[0]], [wm_b[1]])
        x1, y1 = geom.transform_points(self.wm_to_pix, [wm_b[2]], [wm_b[3]])
        return geom.bounds_new(x0[0], y0[0], x1[0], y1[0])
