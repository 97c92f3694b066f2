"""Raster resampling onto a target grid (nearest / bilinear / cubic).

The reference's only resampling is the nearest-neighbor index transform
inside the diff join (src/align.rs:122-144); the north-star adds the
bilinear kernel and the Catmull-Rom bicubic (a = -0.5 — GDAL's
`cubic`) extends the same separable-tap family. All are vectorized
pandas-UDF kernels over decoded blocks: for every target pixel, map
its center through the affine source<-target transform and gather
(nearest) or blend (bilinear 2x2 / cubic 4x4 taps, NaN-aware with
weight renormalization) source pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import codecs, geom


def resample_block(block: np.ndarray, src_gt, dst_gt, dst_w: int, dst_h: int,
                   method: str = "nearest", no_val: float = float("nan")) -> np.ndarray:
    """Resample one block onto the target grid. Unmapped pixels are NaN."""
    t = geom.transform_between(dst_gt, src_gt)  # dst pixel -> src pixel
    h, w = block.shape
    out = np.full((dst_h, dst_w), np.nan)
    valid_in = ~np.isnan(block)
    if not np.isnan(no_val):
        valid_in &= block != no_val

    if method == "nearest":
        # map target pixel centers: the +0.5 shift folded into the
        # chunk transform, exactly like diff.rs:72-74
        ct = geom.chunk_transform(t, (0.5, 0.5), (0.0, 0.0))
        valid, i2, j2 = geom.index_transform_grid(ct, dst_h, dst_w, (w, h))
        ii, jj = np.nonzero(valid)
        src = block[i2[ii, jj], j2[ii, jj]]
        ok = valid_in[i2[ii, jj], j2[ii, jj]]
        out[ii[ok], jj[ok]] = src[ok]
        return out

    if method == "bilinear":
        ct = geom.chunk_transform(t, (0.5, 0.5), (0.0, 0.0))
        valid, i0, j0, wx, wy = geom.bilinear_weights_grid(ct, dst_h, dst_w, (w, h))
        ii, jj = np.nonzero(valid)
        i0v, j0v = i0[ii, jj], j0[ii, jj]
        wxv, wyv = wx[ii, jj], wy[ii, jj]
        vals = np.zeros(len(ii))
        wsum = np.zeros(len(ii))
        for (di, dj, wgt) in (
            (0, 0, (1 - wyv) * (1 - wxv)),
            (0, 1, (1 - wyv) * wxv),
            (1, 0, wyv * (1 - wxv)),
            (1, 1, wyv * wxv),
        ):
            # out-of-bounds neighbors are masked like no-data ones and
            # the weights renormalize below — discarding the pixel
            # entirely would NaN the source's last row/column even on
            # an identity resample
            ni = i0v + di
            nj = j0v + dj
            inb = (ni >= 0) & (ni < h) & (nj >= 0) & (nj < w)
            nic = np.clip(ni, 0, h - 1)
            njc = np.clip(nj, 0, w - 1)
            v = block[nic, njc]
            m = inb & valid_in[nic, njc]
            vals += np.where(m, v * wgt, 0.0)
            wsum += np.where(m, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = np.where(wsum > 0, vals / wsum, np.nan)
        out[ii, jj] = res
        return out

    if method == "cubic":
        # Catmull-Rom bicubic (a = -0.5, the GDAL `cubic` kernel):
        # separable 4x4 tap window around the bilinear base cell.
        # Per-tap branch is FIXED by the tap offset (taps -1/2 always
        # fall in the far |t| in [1,2) piece, taps 0/1 in the near
        # piece), so each weight is one closed-form polynomial of the
        # fractional offset — the property that lets the DuckDB oracle
        # mirror the arithmetic verbatim. Missing / out-of-bounds taps
        # renormalize like bilinear; cubic weights can be negative, so
        # a near-zero weight sum (degenerate support) yields NaN
        # rather than an explosion.
        A = -0.5

        def wcub(f, d):
            if d == -1:
                t = 1.0 + f
                return A * t * t * t - 5.0 * A * t * t + 8.0 * A * t \
                    - 4.0 * A
            if d == 0:
                return (A + 2.0) * f * f * f - (A + 3.0) * f * f + 1.0
            if d == 1:
                t = 1.0 - f
                return (A + 2.0) * t * t * t - (A + 3.0) * t * t + 1.0
            t = 2.0 - f
            return A * t * t * t - 5.0 * A * t * t + 8.0 * A * t \
                - 4.0 * A

        ct = geom.chunk_transform(t, (0.5, 0.5), (0.0, 0.0))
        valid, i0, j0, wx, wy = geom.bilinear_weights_grid(
            ct, dst_h, dst_w, (w, h))
        ii, jj = np.nonzero(valid)
        i0v, j0v = i0[ii, jj], j0[ii, jj]
        fxv, fyv = wx[ii, jj], wy[ii, jj]
        vals = np.zeros(len(ii))
        wsum = np.zeros(len(ii))
        for di in (-1, 0, 1, 2):
            wyv = wcub(fyv, di)
            for dj in (-1, 0, 1, 2):
                wgt = wyv * wcub(fxv, dj)
                ni = i0v + di
                nj = j0v + dj
                inb = (ni >= 0) & (ni < h) & (nj >= 0) & (nj < w)
                nic = np.clip(ni, 0, h - 1)
                njc = np.clip(nj, 0, w - 1)
                vsrc = block[nic, njc]
                m = inb & valid_in[nic, njc]
                vals += np.where(m, vsrc * wgt, 0.0)
                wsum += np.where(m, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = np.where(np.abs(wsum) > 1e-9, vals / wsum, np.nan)
        out[ii, jj] = res
        return out

    raise ValueError(f"unknown resampling method: {method}")


def resample(images: DataFrame, dst_gt, dst_w: int, dst_h: int,
             method: str = "nearest") -> DataFrame:
    """Resample every image onto a common target grid (e.g. before a
    pixel-aligned mosaic or stacking join)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_block(row.bytes, row.h, row.w, row.fmt)
                res = resample_block(block, row.gt, list(dst_gt), dst_w, dst_h,
                                     method, row.no_val)
                out.append((row.image_id, codecs.encode_raw(res),
                            dst_w, dst_h, "raw", [float(v) for v in dst_gt],
                            row.crs, float("nan")))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h",
                                             "fmt", "gt", "crs", "no_val"])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double")
    return images.mapInPandas(gen, schema=schema)


def _shift_gt(gt, px: int, py: int):
    """Geo-transform of the same grid with its origin moved to pixel
    (px, py) — general affine (rotation terms included)."""
    return [gt[0] + px * gt[1] + py * gt[2], gt[1], gt[2],
            gt[3] + px * gt[4] + py * gt[5], gt[4], gt[5]]


MOSAIC_TILE_SCHEMA = ("sy long, sx long, y0 long, y1 long, x0 long, "
                      "x1 long, bytes binary")


def mosaic_tiles(images: DataFrame, dst_gt, dst_w: int, dst_h: int,
                 method: str = "nearest", strip_height: int = 256,
                 tile_width: int = 1024) -> DataFrame:
    """Composite many images onto one target grid, returning the merged
    mosaic as (sy, sx)-keyed TILES — the scale representation.

    Scale shape: each image resamples ONLY the target window its extent
    covers (plan-time G6 window transform, not the full plane) and
    emits (sum, count) partials keyed by (row strip, column tile), so
    the merge parallelizes across BOTH axes and per-merge-task memory
    is bounded by strip_height x tile_width regardless of the target
    raster's width — the round-2 plan kept full-dst_w strips, which a
    planet-scale mosaic would turn into multi-GB tasks. The merge
    fan-in per tile is just the images overlapping that tile."""
    dst_gt = [float(v) for v in dst_gt]
    strip_height = max(1, min(strip_height, dst_h))
    tile_width = max(1, min(tile_width, dst_w))

    def to_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_block(row.bytes, row.h, row.w, row.fmt)
                t = geom.transform_between(row.gt, dst_gt)  # src px -> dst px
                (x0, y0), (ww, wh) = geom.transform_window(
                    ((0, 0), (row.w, row.h)), t, (dst_w, dst_h))
                if ww <= 0 or wh <= 0:
                    continue
                sub = resample_block(block, row.gt, _shift_gt(dst_gt, x0, y0),
                                     ww, wh, method, row.no_val)
                m = ~np.isnan(sub)
                for sy in range(y0 // strip_height,
                                (y0 + wh - 1) // strip_height + 1):
                    r0 = max(y0, sy * strip_height)
                    r1 = min(y0 + wh, (sy + 1) * strip_height)
                    for sx in range(x0 // tile_width,
                                    (x0 + ww - 1) // tile_width + 1):
                        c0 = max(x0, sx * tile_width)
                        c1 = min(x0 + ww, (sx + 1) * tile_width)
                        sm = m[r0 - y0:r1 - y0, c0 - x0:c1 - x0]
                        if not sm.any():
                            continue
                        sv = sub[r0 - y0:r1 - y0, c0 - x0:c1 - x0]
                        out.append((sy, sx, r0, r1, c0, c1,
                                    codecs.encode_raw(np.where(sm, sv, 0.0)),
                                    sm.astype("<f8").tobytes()))
            yield pd.DataFrame(out, columns=["sy", "sx", "r0", "r1",
                                             "c0", "c1", "vsum", "wsum"])

    partials = images.mapInPandas(
        to_partials,
        schema=("sy long, sx long, r0 long, r1 long, c0 long, c1 long, "
                "vsum binary, wsum binary"))

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sy = int(pdf["sy"].iloc[0])
        sx = int(pdf["sx"].iloc[0])
        s0, t0 = sy * strip_height, sx * tile_width
        s1 = min(s0 + strip_height, dst_h)
        t1 = min(t0 + tile_width, dst_w)
        vs = np.zeros((s1 - s0, t1 - t0))
        ws = np.zeros((s1 - s0, t1 - t0))
        for row in pdf.itertuples(index=False):
            h = int(row.r1 - row.r0)
            pv = np.frombuffer(row.vsum, dtype="<f8").reshape(h, -1)
            pw = np.frombuffer(row.wsum, dtype="<f8").reshape(h, -1)
            rr = slice(int(row.r0) - s0, int(row.r1) - s0)
            cc = slice(int(row.c0) - t0, int(row.c1) - t0)
            vs[rr, cc] += pv
            ws[rr, cc] += pw
        with np.errstate(invalid="ignore"):
            tile = np.where(ws > 0, vs / np.maximum(ws, 1.0), np.nan)
        return pd.DataFrame([{
            "sy": sy, "sx": sx, "y0": s0, "y1": s1, "x0": t0, "x1": t1,
            "bytes": codecs.encode_raw(tile)}])

    return partials.groupBy("sy", "sx").applyInPandas(
        lambda key, pdf: merge(pdf), schema=MOSAIC_TILE_SCHEMA)


#: Largest raster mosaic(assemble=True) will stitch into one task
#: (dst_h x dst_w float64).
MAX_ASSEMBLE_BYTES = 1 << 30


def mosaic(images: DataFrame, dst_gt, dst_w: int, dst_h: int,
           method: str = "nearest", strip_height: int = 256,
           tile_width: int = 1024, assemble: bool = True,
           max_assemble_bytes: int = MAX_ASSEMBLE_BYTES) -> DataFrame:
    """Composite many images onto one target grid: windowed resample,
    NaN-aware per-pixel mean across overlaps, (sy, sx)-tiled merge
    (see mosaic_tiles — that is the scale surface). With
    ``assemble=False`` the merged tiles are returned as-is; otherwise
    they are stitched into ONE full image row — a driver-sized
    convenience that REFUSES targets over ``max_assemble_bytes``
    (the ngram_jaccard_pairs pattern: the single-task surface must not
    silently absorb a planet-scale grid — use assemble=False /
    mosaic_tiles and keep the (sy, sx) tiles distributed)."""
    dst_gt = [float(v) for v in dst_gt]
    if assemble and dst_w * dst_h * 8 > max_assemble_bytes:
        raise ValueError(
            f"mosaic(assemble=True) stitches the whole {dst_w}x{dst_h} "
            f"target ({dst_w * dst_h * 8 >> 20} MiB) inside ONE task; "
            f"that exceeds max_assemble_bytes={max_assemble_bytes}. Use "
            f"assemble=False (or mosaic_tiles) to keep the merged "
            f"(sy, sx) tiles distributed, or raise max_assemble_bytes "
            f"explicitly.")
    tiles = mosaic_tiles(images, dst_gt, dst_w, dst_h, method,
                         strip_height, tile_width)
    if not assemble:
        return tiles

    def stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        block = np.full((dst_h, dst_w), np.nan)
        for row in pdf.itertuples(index=False):
            th, tw = int(row.y1 - row.y0), int(row.x1 - row.x0)
            block[row.y0:row.y1, row.x0:row.x1] = \
                np.frombuffer(row.bytes, dtype="<f8").reshape(th, tw)
        return pd.DataFrame([{
            "image_id": "mosaic", "bytes": codecs.encode_raw(block),
            "w": dst_w, "h": dst_h, "fmt": "raw", "gt": list(dst_gt),
            "crs": "EPSG:3857", "no_val": float("nan")}])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double")
    return tiles.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
        lambda key, pdf: stitch(pdf), schema=schema)
