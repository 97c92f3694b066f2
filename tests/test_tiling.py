"""Tiling pipeline tests, including the reference golden fixture
(tests/test_tile.py:33-53, seed 0xfab1, UTM 43N -> web mercator)."""

import json
from math import isclose
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from rasters_rs_spark.functions import codecs
from rasters_rs_spark.operators import tiling as T
from rasters_rs_spark.plans.tileplan import TileConfig

FIXTURE = Path("/root/reference/raster-tools/tests/fixtures/tile-test-fab1-index.json")

FAB1_GT = (363737.54688808107, 0.08917409880025007, 0.0,
           2059515.3774022115, 0.0, -0.08917409880023142)


def _fab1_block():
    np.random.seed(0xFAB1)  # legacy RandomState, as the reference test uses
    return np.random.normal(size=(64, 64, 1))[:, :, 0]


def _fab1_images(spark):
    block = _fab1_block()
    pdf = pd.DataFrame([{
        "image_id": "fab1", "bytes": codecs.encode_raw(block),
        "w": 64, "h": 64, "fmt": "raw", "gt": list(FAB1_GT),
        "crs": "EPSG:32643", "no_val": float("nan"),
    }])
    return spark.createDataFrame(pdf)


def compare_index(idx1, idx2, desc="root"):
    """Port of the reference's recursive comparator (test_tile.py:12-29):
    identical key sets, exact ints, rel_tol 1e-2 floats."""
    assert type(idx1) == type(idx2), f"type mismatch @ {desc}"
    if not isinstance(idx1, dict):
        if isinstance(idx1, int):
            assert idx1 == idx2, f"{desc}: {idx1} == {idx2}"
        else:
            assert isclose(idx1, idx2, rel_tol=1e-2), f"{desc}: {idx1} ~= {idx2}"
        return
    k1, k2 = sorted(idx1), sorted(idx2)
    assert k1 == k2, f"keys @ {desc}: {k1} != {k2}"
    for k in k1:
        compare_index(idx1[k], idx2[k], desc=f"{desc}/{k}")


def test_tile_config_fab1_zoom_range():
    cfg = TileConfig.for_raster(64, 64, FAB1_GT, "EPSG:32643")
    assert cfg.max_zoom() == 21
    assert cfg.min_zoom() == 18


def test_golden_fixture_local(spark):
    encoded = T.tile_index_manifest(_fab1_images(spark), mode="local")
    got = T.index_json(encoded, "fab1")
    ref = json.load(open(FIXTURE))
    compare_index(got, ref)


def test_index_json_strings_distributed_sink(spark, tmp_path):
    """The distributed manifest sink (one groupBy(image_id) job,
    round-5 VERDICT #4): per-image JSON strings byte-identical to
    json.dumps(index_json(...)) per image, and dump_index_json's
    multi-image file byte-identical to the driver-loop assembly it
    replaced."""
    from rasters_rs_spark.sources import synth

    pdf = synth.lcg_image_table(3, 16, 16, pixel_size=2.0)
    enc = T.tile_index_manifest(spark.createDataFrame(pdf), mode="local")
    enc = enc.localCheckpoint(eager=True)      # one pyramid computation
    rows = {r["image_id"]: r for r in T.index_json_strings(enc).collect()}
    ids = sorted(rows)
    assert len(ids) == 3
    for i in ids:
        assert rows[i]["manifest_json"] == json.dumps(T.index_json(enc, i))
        assert rows[i]["n_tiles"] > 0

    out = tmp_path / "multi.json"
    T.dump_index_json(enc, str(out))
    expect = json.dumps({i: T.index_json(enc, i) for i in ids})
    assert out.read_text() == expect

    # single-image path unchanged (reference-shaped bare manifest)
    single = tmp_path / "one.json"
    T.dump_index_json(enc.where("image_id = 'img_0000'"), str(single))
    assert single.read_text() == json.dumps(T.index_json(enc, "img_0000"))


def test_distributed_equals_local(spark):
    imgs = _fab1_images(spark)
    loc = T.tile_pyramid(imgs, mode="local")
    dist = T.tile_pyramid(imgs, mode="distributed")

    def key_rows(df):
        return {
            (r["z"], r["x"], r["y"]):
                codecs.decode_raw(r["data"], 256, 256)
            for r in df.collect()
        }

    a, b = key_rows(loc), key_rows(dist)
    assert set(a) == set(b)
    for k in a:
        ax, bx = a[k], b[k]
        assert np.array_equal(np.isnan(ax), np.isnan(bx))
        assert np.allclose(np.nan_to_num(ax), np.nan_to_num(bx), atol=0, rtol=0)


def test_compressed_tiles_roundtrip(spark):
    imgs = _fab1_images(spark)
    plain = {(r["z"], r["x"], r["y"]): (bytes(r["bytes"]), r["min"], r["max"])
             for r in T.tile_index_manifest(imgs).collect()}
    comp = {(r["z"], r["x"], r["y"]): (bytes(r["bytes"]), r["min"], r["max"])
            for r in T.tile_index_manifest(imgs, compress=True).collect()}
    assert set(plain) == set(comp)
    for k in plain:
        praw, vmin, vmax = plain[k]
        craw, _, _ = comp[k]
        a = T.decode_tile_bytes(praw, 256, vmin, vmax)
        b = T.decode_tile_bytes(craw, 256, vmin, vmax, compressed=True)
        assert np.array_equal(np.isnan(a), np.isnan(b))
        assert np.array_equal(np.nan_to_num(a), np.nan_to_num(b))
        assert len(craw) < len(praw)


def test_weights_partition_pixel_area():
    """Every source pixel's total emitted weight equals its footprint
    area in tile pixels (mu partitions the footprint; base.rs asserts
    0 < mu <= 1 per overlap)."""
    block = np.ones((8, 8))
    gt = [0.0, 100000.0, 0.0, 800000.0, 0.0, -100000.0]  # WM-native, huge px
    cfg = TileConfig.for_raster(8, 8, gt, "EPSG:3857", 256)
    zoom = cfg.max_zoom()
    _, top, _, bot = cfg.tile_index_bounds(zoom)
    total_w = 0.0
    for ty in range(top, bot):
        for (_, tile, vmin, vmax) in T.row_base_tiles(block, cfg, zoom, ty, float("nan")):
            valid = ~np.isnan(tile)
            if valid.any():
                # constant input -> every covered tile pixel equals 1.0
                assert np.allclose(tile[valid], 1.0)
                total_w += valid.sum()
    assert total_w > 0


def test_assignment_triples_aggregate_to_row_tiles():
    """The raw triple relation and the fused accumulator must agree:
    aggregating mu/mu*val per tile pixel reproduces row_base_tiles."""
    np.random.seed(7)
    block = np.random.normal(size=(48, 80))
    gt = [1000.25, 3.7, 0.0, 2000.75, 0.0, -3.7]
    cfg = TileConfig.for_raster(80, 48, gt, "EPSG:3857", 256)
    zoom = cfg.max_zoom()
    from rasters_rs_spark.functions import geom as G
    _, top, _, bot = cfg.tile_index_bounds(zoom)
    left_t, _, right_t, _ = cfg.tile_index_bounds(zoom)
    for ty in range(top, bot):
        tiles = {x: (arr, mn, mx)
                 for (x, arr, mn, mx) in T.row_base_tiles(block, cfg, zoom, ty, float("nan"))}
        tx, tpx, tpy, px, py, mu = T.assignment_triples(cfg, zoom, ty, (80, 48))
        pb = cfg.row_pix_bounds(zoom, ty)
        (ox, oy), _ = G.window_from_bounds(pb, (80, 48))
        agg = {x: (np.zeros((256, 256)), np.zeros((256, 256))) for x in tiles}
        for i in range(len(tx)):
            v = block[py[i] + oy, px[i] + ox]
            if np.isnan(v):
                continue
            ws, wg = agg[int(tx[i])]
            ws[tpy[i], tpx[i]] += mu[i] * v
            wg[tpy[i], tpx[i]] += mu[i]
        for x, (ws, wg) in agg.items():
            arr, _, _ = tiles[x]
            got = np.where(wg > 0, ws / np.where(wg > 0, wg, 1.0), np.nan)
            assert np.array_equal(np.isnan(got), np.isnan(arr))
            m = ~np.isnan(arr)
            assert np.allclose(got[m], arr[m], rtol=0, atol=0)


def test_nan_holes_propagate_through_pipeline():
    """No-data pixels contribute no weight: tile pixels covered only by
    NaN source pixels stay NaN at base level and through the pyramid
    (main.rs:97 validity gate + dem.rs NaN-aware averaging)."""
    np.random.seed(11)
    block = np.random.normal(size=(32, 32))
    block[8:16, 8:16] = np.nan  # a hole
    gt = [0.0, 100000.0, 0.0, 1600000.0, 0.0, -100000.0]
    cfg = TileConfig.for_raster(32, 32, gt, "EPSG:3857", 256)
    zoom = cfg.max_zoom()
    _, top, _, bot = cfg.tile_index_bounds(zoom)
    total_valid = 0
    for ty in range(top, bot):
        for (x, tile, vmin, vmax) in T.row_base_tiles(block, cfg, zoom, ty, float("nan")):
            valid = ~np.isnan(tile)
            total_valid += int(valid.sum())
            if valid.any():
                assert np.isfinite(vmin) and np.isfinite(vmax)
    assert total_valid > 0
    # with no no-data, strictly more tile pixels are touched
    full = np.random.normal(size=(32, 32))
    total_full = 0
    for ty in range(top, bot):
        for (x, tile, _, _) in T.row_base_tiles(full, cfg, zoom, ty, float("nan")):
            total_full += int((~np.isnan(tile)).sum())
    assert total_full > total_valid


def test_scale_children_corner_layout():
    ts = 4
    mk = lambda v: np.full((ts, ts), float(v))
    # children at (2,5),(3,5),(2,4),(3,4): x even->left, y odd(5)->top
    parent, vmin, vmax = T.scale_children(
        [(2, 5, mk(1)), (3, 5, mk(2)), (2, 4, mk(3)), (3, 4, mk(4))], ts)
    assert np.allclose(parent[:2, :2], 1.0)   # top-left from (2,5)
    assert np.allclose(parent[:2, 2:], 2.0)   # top-right from (3,5)
    assert np.allclose(parent[2:, :2], 3.0)   # bottom-left from (2,4)
    assert np.allclose(parent[2:, 2:], 4.0)   # bottom-right from (3,4)
    assert (vmin, vmax) == (1.0, 4.0)
    # missing corners stay NaN
    parent, vmin, vmax = T.scale_children([(2, 5, mk(7))], ts)
    assert np.allclose(parent[:2, :2], 7.0)
    assert np.isnan(parent[2:, 2:]).all()


def test_nan_aware_2x2_average():
    ts = 2
    child = np.array([[1.0, np.nan], [3.0, 5.0]])
    parent, vmin, vmax = T.scale_children([(0, 1, child)], ts)
    assert isclose(parent[0, 0], (1.0 + 3.0 + 5.0) / 3.0)
    assert vmin == vmax == parent[0, 0]


def test_index_json_refuses_huge_tile_table(spark):
    import pytest
    from rasters_rs_spark.operators import tiling as T
    from rasters_rs_spark.sources import synth
    images = spark.createDataFrame(synth.lcg_image_table(1, 64, 64, 8.0))
    enc = T.tile_index_manifest(images, mode="local")
    with pytest.raises(ValueError, match="max_tiles"):
        T.index_json(enc, max_tiles=0)
    assert T.index_json(enc, max_tiles=10)  # under the bound: normal path
