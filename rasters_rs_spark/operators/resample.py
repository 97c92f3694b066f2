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


def mosaic(images: DataFrame, dst_gt, dst_w: int, dst_h: int,
           method: str = "nearest") -> DataFrame:
    """Composite many images onto one target grid: resample each, then a
    NaN-aware per-pixel mean across overlapping images.

    Shape: one narrow resample stage emitting per-image partial
    (sum, count) planes, then a single groupBy merge — overlap blending
    is associative, so partial aggregation applies and no image pair
    ever meets in one task."""
    res = resample(images, dst_gt, dst_w, dst_h, method)

    def to_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_raw(row.bytes, dst_h, dst_w)
                m = ~np.isnan(block)
                out.append((0, codecs.encode_raw(np.where(m, block, 0.0)),
                            m.astype("<f8").tobytes()))
            yield pd.DataFrame(out, columns=["mkey", "vsum", "wsum"])

    partials = res.mapInPandas(
        to_partials, schema="mkey int, vsum binary, wsum binary")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        vs = np.zeros((dst_h, dst_w))
        ws = np.zeros((dst_h, dst_w))
        for row in pdf.itertuples(index=False):
            vs += codecs.decode_raw(row.vsum, dst_h, dst_w)
            ws += codecs.decode_raw(row.wsum, dst_h, dst_w)
        with np.errstate(invalid="ignore"):
            out = np.where(ws > 0, vs / np.maximum(ws, 1.0), np.nan)
        return pd.DataFrame([{
            "image_id": "mosaic", "bytes": codecs.encode_raw(out),
            "w": dst_w, "h": dst_h, "fmt": "raw",
            "gt": [float(v) for v in dst_gt], "crs": "EPSG:3857",
            "no_val": float("nan")}])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double")
    return partials.groupBy("mkey").applyInPandas(
        lambda key, pdf: merge(pdf), schema=schema)
