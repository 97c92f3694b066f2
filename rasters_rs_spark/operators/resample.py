"""Raster resampling onto a target grid (nearest / bilinear).

The reference's only resampling is the nearest-neighbor index transform
inside the diff join (src/align.rs:122-144); the north-star adds a
bilinear kernel. Both are vectorized pandas-UDF kernels over decoded
blocks: for every target pixel, map its center through the affine
source<-target transform and gather (nearest) or blend (bilinear,
4-neighbor weights, NaN-aware) source pixels.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

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
            v = block[i0v + di, j0v + dj]
            m = valid_in[i0v + di, j0v + dj]
            vals += np.where(m, v * wgt, 0.0)
            wsum += np.where(m, wgt, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            res = np.where(wsum > 0, vals / wsum, np.nan)
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


def mosaic(images: DataFrame, dst_gt, dst_w: int, dst_h: int,
           method: str = "nearest", strip_height: int = 256,
           assemble: bool = True) -> DataFrame:
    """Composite many images onto one target grid: windowed resample of
    each image, then a NaN-aware per-pixel mean across overlaps.

    Scale shape: each image resamples ONLY the target window its extent
    covers (plan-time G6 window transform, not the full plane) and emits
    (sum, count) partials keyed by target ROW STRIP, so the merge
    parallelizes across strips and no task ever holds more than one
    strip — at 100x image counts the merge fan-in per strip is just the
    images overlapping that strip. With ``assemble=False`` the result
    stays in the chunked-strip representation (chunked.CHUNK_SCHEMA);
    otherwise strips are stitched into one image row (driver-sized
    outputs only)."""
    dst_gt = [float(v) for v in dst_gt]
    strip_height = max(1, min(strip_height, dst_h))

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
                    sm = m[r0 - y0:r1 - y0]
                    if not sm.any():
                        continue
                    sv = sub[r0 - y0:r1 - y0]
                    out.append((sy, x0, r0, r1,
                                codecs.encode_raw(np.where(sm, sv, 0.0)),
                                sm.astype("<f8").tobytes()))
            yield pd.DataFrame(out, columns=["sy", "x0", "r0", "r1",
                                             "vsum", "wsum"])

    partials = images.mapInPandas(
        to_partials,
        schema="sy long, x0 long, r0 long, r1 long, vsum binary, wsum binary")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sy = int(pdf["sy"].iloc[0])
        s0 = sy * strip_height
        s1 = min(s0 + strip_height, dst_h)
        vs = np.zeros((s1 - s0, dst_w))
        ws = np.zeros((s1 - s0, dst_w))
        for row in pdf.itertuples(index=False):
            h = int(row.r1 - row.r0)
            pv = np.frombuffer(row.vsum, dtype="<f8").reshape(h, -1)
            pw = np.frombuffer(row.wsum, dtype="<f8").reshape(h, -1)
            rr = slice(int(row.r0) - s0, int(row.r1) - s0)
            cc = slice(int(row.x0), int(row.x0) + pv.shape[1])
            vs[rr, cc] += pv
            ws[rr, cc] += pw
        with np.errstate(invalid="ignore"):
            strip = np.where(ws > 0, vs / np.maximum(ws, 1.0), np.nan)
        return pd.DataFrame([{
            "image_id": "mosaic", "chunk_idx": sy,
            "data_start": s0, "data_end": s1,
            "load_start": s0, "load_end": s1,
            "bytes": codecs.encode_raw(strip),
            "w": dst_w, "h": dst_h, "fmt": "raw",
            "gt": list(dst_gt), "crs": "EPSG:3857", "no_val": float("nan")}])

    from .chunked import CHUNK_SCHEMA, assemble_images
    strips = partials.groupBy("sy").applyInPandas(
        lambda key, pdf: merge(pdf), schema=CHUNK_SCHEMA)
    return assemble_images(strips) if assemble else strips
