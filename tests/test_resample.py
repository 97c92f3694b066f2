"""Resampling kernels: nearest matches the diff oracle's repeat() logic;
bilinear matches a hand-rolled interpolation oracle."""

import numpy as np
import pandas as pd

from rasters_rs_spark.functions import codecs
from rasters_rs_spark.operators.resample import resample, resample_block


def test_nearest_matches_repeat_oracle():
    # source: 8x16 at 4m pixels; target: 32x64 at 1m covering same extent
    rng = np.random.default_rng(1)
    src = rng.normal(size=(8, 16))
    src_gt = [0.0, 4.0, 0.0, 32.0, 0.0, -4.0]
    dst_gt = [0.0, 1.0, 0.0, 32.0, 0.0, -1.0]
    out = resample_block(src, src_gt, dst_gt, 64, 32, "nearest")
    expect = src.repeat(4, axis=0).repeat(4, axis=1)
    assert np.array_equal(out, expect)


def test_nearest_out_of_bounds_is_nan():
    src = np.ones((4, 4))
    src_gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    dst_gt = [-2.0, 1.0, 0.0, 6.0, 0.0, -1.0]  # shifted window
    out = resample_block(src, src_gt, dst_gt, 8, 8, "nearest")
    assert np.isnan(out[:2, :]).all() and np.isnan(out[:, :2]).all()
    assert (out[2:6, 2:6] == 1.0).all()
    assert np.isnan(out[6:, :]).all()


def test_bilinear_identity_grid_is_exact():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(8, 8))
    gt = [0.0, 1.0, 0.0, 8.0, 0.0, -1.0]
    out = resample_block(src, gt, gt, 8, 8, "bilinear")
    inner = out[1:-1, 1:-1]  # borders lack 4 neighbors -> NaN
    assert np.allclose(inner, src[1:-1, 1:-1])


def test_bilinear_linear_field_reproduced():
    # a linear ramp is reproduced exactly by bilinear interpolation
    yy, xx = np.mgrid[0:16, 0:16]
    src = 2.0 * xx + 3.0 * yy
    src_gt = [0.0, 2.0, 0.0, 32.0, 0.0, -2.0]
    dst_gt = [4.0, 1.0, 0.0, 28.0, 0.0, -1.0]  # interior window, finer
    out = resample_block(src, src_gt, dst_gt, 16, 16, "bilinear")
    # expected: value at world coords of each target center
    jj, ii = np.meshgrid(np.arange(16), np.arange(16))
    wx = 4.0 + (jj + 0.5) * 1.0
    wy = 28.0 - (ii + 0.5) * 1.0
    # src pixel (continuous): px = wx/2, py = (32-wy)/2; value = 2*(px-0.5)+3*(py-0.5)
    expect = 2.0 * (wx / 2.0 - 0.5) + 3.0 * ((32.0 - wy) / 2.0 - 0.5)
    assert np.allclose(out, expect)


def test_bilinear_nan_aware_renormalizes():
    src = np.ones((4, 4))
    src[1, 1] = np.nan
    gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    dst_gt = [0.0, 0.8, 0.0, 4.0, 0.0, -0.8]
    out = resample_block(src, gt, dst_gt, 5, 5, "bilinear")
    valid = ~np.isnan(out)
    assert np.allclose(out[valid], 1.0)  # constant field survives the hole


def test_mosaic_overlap_mean(spark):
    from rasters_rs_spark.operators.resample import mosaic
    # two 4x4 rasters at 1m; second shifted 2m right; overlap averages
    a = np.full((4, 4), 2.0)
    b = np.full((4, 4), 6.0)
    rows = [
        {"image_id": "a", "bytes": codecs.encode_raw(a), "w": 4, "h": 4,
         "fmt": "raw", "gt": [0.0, 1.0, 0.0, 4.0, 0.0, -1.0],
         "crs": "IDENTITY", "no_val": float("nan")},
        {"image_id": "b", "bytes": codecs.encode_raw(b), "w": 4, "h": 4,
         "fmt": "raw", "gt": [2.0, 1.0, 0.0, 4.0, 0.0, -1.0],
         "crs": "IDENTITY", "no_val": float("nan")},
    ]
    dst_gt = [0.0, 1.0, 0.0, 4.0, 0.0, -1.0]
    out = mosaic(spark.createDataFrame(pd.DataFrame(rows)), dst_gt, 6, 4).collect()[0]
    got = codecs.decode_raw(out["bytes"], 4, 6)
    assert np.allclose(got[:, :2], 2.0)        # a only
    assert np.allclose(got[:, 2:4], 4.0)       # overlap mean
    assert np.allclose(got[:, 4:6], 6.0)       # b only


def test_mosaic_tile_partitioned_merge(spark):
    """The merge is keyed by (row strip, column tile): a tall+wide
    mosaic with small strip_height AND tile_width produces >1 merge
    group in BOTH dimensions — per-task memory is bounded by
    strip_height x tile_width regardless of dst_w — and the assembled
    result still equals the per-pixel NaN-aware mean."""
    from rasters_rs_spark.operators.resample import mosaic
    rng = np.random.default_rng(9)
    rows = []
    blocks = []
    for i in range(6):
        blk = rng.normal(size=(8, 8))
        blocks.append(blk)
        rows.append({
            "image_id": f"m{i}", "bytes": codecs.encode_raw(blk),
            # staircase: down 4 rows AND right 4 cols per image, so
            # neighbors overlap in both axes
            "gt": [i * 4.0, 1.0, 0.0, 32.0 - i * 4.0, 0.0, -1.0],
            "w": 8, "h": 8, "fmt": "raw",
            "crs": "IDENTITY", "no_val": float("nan")})
    dst_gt = [0.0, 1.0, 0.0, 32.0, 0.0, -1.0]
    dst_w, dst_h = 28, 32
    df = spark.createDataFrame(pd.DataFrame(rows))

    tiles = mosaic(df, dst_gt, dst_w, dst_h, strip_height=8, tile_width=8,
                   assemble=False).collect()
    assert len({r["sy"] for r in tiles}) > 1   # >1 merge group in y
    assert len({r["sx"] for r in tiles}) > 1   # >1 merge group in x
    for r in tiles:  # every tile bounded by strip_height x tile_width
        assert (r["y1"] - r["y0"]) <= 8 and (r["x1"] - r["x0"]) <= 8

    out = mosaic(df, dst_gt, dst_w, dst_h, strip_height=8,
                 tile_width=8).collect()[0]
    got = codecs.decode_raw(out["bytes"], dst_h, dst_w)
    # numpy oracle: sum/count over the staircase placement
    vs = np.zeros((dst_h, dst_w))
    ws = np.zeros((dst_h, dst_w))
    for i, blk in enumerate(blocks):
        vs[i * 4:i * 4 + 8, i * 4:i * 4 + 8] += blk
        ws[i * 4:i * 4 + 8, i * 4:i * 4 + 8] += 1.0
    expect = np.where(ws > 0, vs / np.maximum(ws, 1.0), np.nan)
    assert np.allclose(got, expect, equal_nan=True)


def test_resample_dataframe(spark):
    rng = np.random.default_rng(3)
    src = rng.normal(size=(8, 16))
    pdf = pd.DataFrame([{
        "image_id": "r0", "bytes": codecs.encode_raw(src),
        "w": 16, "h": 8, "fmt": "raw",
        "gt": [0.0, 4.0, 0.0, 32.0, 0.0, -4.0],
        "crs": "IDENTITY", "no_val": float("nan")}])
    dst_gt = [0.0, 1.0, 0.0, 32.0, 0.0, -1.0]
    out = resample(spark.createDataFrame(pdf), dst_gt, 64, 32, "nearest").collect()[0]
    got = codecs.decode_raw(out["bytes"], 32, 64)
    assert np.array_equal(got, src.repeat(4, axis=0).repeat(4, axis=1))
