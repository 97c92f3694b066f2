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


def test_bilinear_identity_keeps_border(spark):
    """Regression: identity bilinear resampling used to NaN the whole
    last row/column (any OOB neighbor discarded the pixel). Zero-weight
    OOB neighbors now renormalize away — identity resample is exact
    everywhere."""
    rng = np.random.default_rng(44)
    src = rng.normal(size=(6, 7))
    gt = [0.0, 1.0, 0.0, 6.0, 0.0, -1.0]
    from rasters_rs_spark.operators.resample import resample_block
    out = resample_block(src, gt, gt, 7, 6, "bilinear")
    assert np.allclose(out, src)          # no NaN border


def test_mosaic_covers_rotated_image(spark):
    """Regression: transform_window mapped only 2 corners, so a
    rotated image's mosaic window under-covered its footprint and most
    pixels were silently dropped — mosaic must now place at least as
    many pixels as the full-plane resample of the same image."""
    from rasters_rs_spark.operators.resample import mosaic, resample
    blk = np.full((4, 4), 5.0)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    rows = [{"image_id": "rot", "bytes": codecs.encode_raw(blk),
             "w": 4, "h": 4, "fmt": "raw",
             # 45-degree rotation; origin off .5 alignments so no
             # target center lands exactly on the half-open source edge
             "gt": [8.3, c, s, 8.3, s, -c],
             "crs": "IDENTITY", "no_val": float("nan")}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    dst_gt = [0.0, 1.0, 0.0, 16.0, 0.0, -1.0]
    full = resample(df, dst_gt, 16, 16).collect()[0]
    n_full = np.count_nonzero(
        ~np.isnan(codecs.decode_raw(bytes(full["bytes"]), 16, 16)))
    mos = mosaic(df, dst_gt, 16, 16).collect()[0]
    got = codecs.decode_raw(bytes(mos["bytes"]), 16, 16)
    n_mos = np.count_nonzero(~np.isnan(got))
    # folding the window offset into the affine shifts boundary pixels
    # by 1 ulp for irrational (rotated) transforms, so allow a couple
    # of half-open edge pixels to differ — the old 2-corner bug lost
    # ~70-85% of the footprint, not <=2 pixels
    assert n_full >= 16 and n_mos >= n_full - 2
    assert np.allclose(got[~np.isnan(got)], 5.0)


def test_bilinear_no_extrapolation_beyond_extent():
    """Border convention: a sample point more than half a pixel past
    the border pixel centers (outside the source's geographic extent)
    is NaN — renormalizing its partial neighborhood would EXTRAPOLATE
    edge values outside the image. Points exactly ON the extent edge
    (xc == cols - 0.5) remain valid and renormalize."""
    from rasters_rs_spark.operators.resample import resample_block
    rng = np.random.default_rng(45)
    src = rng.normal(size=(8, 8))
    gt = [0.0, 1.0, 0.0, 8.0, 0.0, -1.0]
    # +0.75-pixel x shift: last column samples at xc = 7.75 > 7.5
    dst_gt = [0.75, 1.0, 0.0, 8.0, 0.0, -1.0]
    out = resample_block(src, gt, dst_gt, 8, 8, "bilinear")
    assert np.isnan(out[:, 7]).all()
    assert not np.isnan(out[:, :7]).any()
    # exactly on the edge (half-pixel shift): still valid, renormalized
    dst_gt = [0.5, 1.0, 0.0, 8.0, 0.0, -1.0]
    out = resample_block(src, gt, dst_gt, 8, 8, "bilinear")
    assert not np.isnan(out).any()
    # last column: the two right neighbors are OOB and wy = 0 on this
    # fixture, so renormalization passes the border column through
    assert np.allclose(out[:, 7], src[:, 7])


def test_mosaic_assemble_refuses_huge_target(spark):
    """The single-task stitch must refuse a planet-scale target and
    name the distributed alternative (assemble=False / mosaic_tiles)."""
    import pytest
    from rasters_rs_spark.operators.resample import mosaic
    from rasters_rs_spark.sources import synth
    images = spark.createDataFrame(synth.lcg_image_table(1, 8, 8, 2.0))
    with pytest.raises(ValueError, match="assemble=False"):
        mosaic(images, [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], 2 ** 20, 2 ** 20)


def test_cubic_identity_linear_and_constant():
    """Catmull-Rom properties: identity grid passes values through
    exactly; linear fields reproduce EXACTLY on full-support pixels
    (third-order kernel has linear precision); constant fields stay
    constant everywhere including renormalized borders."""
    import numpy as np

    from rasters_rs_spark.operators.resample import resample_block

    rng = np.random.default_rng(3)
    b = rng.random((16, 16))
    gt = [0.0, 1.0, 0.0, 16.0, 0.0, -1.0]
    out = resample_block(b, gt, gt, 16, 16, method="cubic")
    assert np.isfinite(out).all() and np.array_equal(out, b)

    ii, jj = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    lin = 2.0 * jj + 3.0 * ii + 1.0
    dst_gt = [0.5, 1.0, 0.0, 15.5, 0.0, -1.0]
    o2 = resample_block(lin, gt, dst_gt, 16, 16, method="cubic")
    exp = 2.0 * (jj + 0.5) + 3.0 * (ii + 0.5) + 1.0
    interior = np.zeros((16, 16), bool)
    interior[1:14, 1:14] = True
    assert np.abs(o2 - exp)[interior].max() == 0.0

    o3 = resample_block(np.ones((16, 16)), gt, dst_gt, 16, 16,
                        method="cubic")
    assert np.nanmax(np.abs(o3 - 1.0)) == 0.0


def test_cubic_half_shift_weights_and_nodata():
    """At f = 0.5 the tap weights are (-1/16, 9/16, 9/16, -1/16);
    a planted no-data tap drops out and the rest renormalize."""
    import numpy as np

    from rasters_rs_spark.operators.resample import resample_block

    b = np.zeros((8, 8))
    b[3, 3] = 1.0
    gt = [0.0, 1.0, 0.0, 8.0, 0.0, -1.0]
    dst_gt = [0.5, 1.0, 0.0, 7.5, 0.0, -1.0]
    out = resample_block(b, gt, dst_gt, 8, 8, method="cubic")
    # dst pixel (3,3) blends taps rows/cols 2..5: weight of src (3,3)
    # = (9/16)^2
    assert abs(out[3, 3] - (9.0 / 16.0) ** 2) < 1e-15
    # dst (1,1) has src (3,3) at tap offset (+2,+2): (-1/16)^2
    assert abs(out[1, 1] - (1.0 / 256.0)) < 1e-15

    b2 = b.copy()
    b2[2, 2] = -999.0
    out2 = resample_block(b2, gt, dst_gt, 8, 8, method="cubic",
                          no_val=-999.0)
    # dst (2,2): taps 1..4 in each axis; dropping the (2,2) tap
    # removes weight (9/16)^2, the rest renormalize
    w_lost = (9.0 / 16.0) ** 2
    want = ((9.0 / 16.0) * (9.0 / 16.0) * 0.0 * 0  # clarity: others 0
            + (9.0 / 16.0) ** 2 * b[3, 3]) / (1.0 - w_lost)
    assert abs(out2[2, 2] - want) < 1e-12
