"""Polygonize + marching squares: exact cross-checks against
brute-force flood fill / a per-cell python reference, and the
chunked-vs-whole identity that pins the cross-strip merge."""

import numpy as np
import pytest

from rasters_rs_spark.functions import codecs
from rasters_rs_spark.operators import vectorize as V
from rasters_rs_spark.operators.chunked import chunk_images
from rasters_rs_spark.sources import synth


def _flood_regions(cls):
    """Brute-force 4-connectivity flood fill; label = min flat index."""
    h, w = cls.shape
    seen = np.full((h, w), False)
    out = {}
    for si in range(h):
        for sj in range(w):
            if seen[si, sj]:
                continue
            stack, members = [(si, sj)], []
            seen[si, sj] = True
            while stack:
                i, j = stack.pop()
                members.append((i, j))
                for ni, nj in ((i - 1, j), (i + 1, j), (i, j - 1),
                               (i, j + 1)):
                    if (0 <= ni < h and 0 <= nj < w and not seen[ni, nj]
                            and cls[ni, nj] == cls[i, j]):
                        seen[ni, nj] = True
                        stack.append((ni, nj))
            label = min(i * w + j for i, j in members)
            mset = set(members)
            perim = sum(
                1
                for (i, j) in members
                for ni, nj in ((i - 1, j), (i + 1, j), (i, j - 1),
                               (i, j + 1))
                if (ni, nj) not in mset)
            out[label] = (int(cls[si, sj]), len(members), perim,
                          min(i for i, _ in members),
                          min(j for _, j in members),
                          max(i for i, _ in members),
                          max(j for _, j in members))
    return out


def test_ccl_matches_flood_fill_random():
    rng = np.random.default_rng(7)
    for _ in range(5):
        cls = rng.integers(0, 3, size=(17, 13))
        lab = V.ccl_min_labels(cls).reshape(17, 13)
        want = _flood_regions(cls)
        got_labels = {}
        for i in range(17):
            for j in range(13):
                got_labels.setdefault(int(lab[i, j]), []).append((i, j))
        assert set(got_labels) == set(want)
        for label, members in got_labels.items():
            assert want[label][1] == len(members)


def test_ccl_single_class_and_single_pixel():
    assert V.ccl_min_labels(np.zeros((4, 4), dtype=int)).max() == 0
    assert list(V.ccl_min_labels(np.array([[2]]))) == [0]


def test_polygonize_matches_flood_fill(spark):
    pdf = synth.blocky_lcg_image_table(2, 32, 32)
    imgs = spark.createDataFrame(pdf)
    rows = V.polygonize(imgs, n_classes=4).collect()
    for m in range(2):
        block = codecs.decode_block(pdf.bytes[m], 32, 32, "raw")
        want = _flood_regions(V.quantize_classes(block, 4))
        got = {r["region_label"]: (r["cls"], r["n_pixels"],
                                   r["perimeter"], r["min_i"],
                                   r["min_j"], r["max_i"], r["max_j"])
               for r in rows if r["image_id"] == f"img_{m:08d}"}
        assert got == want


@pytest.mark.parametrize("min_rows,cap", [(1, 1_000_000), (3, 0),
                                          (8, 1_000_000), (32, 0)])
def test_polygonize_chunked_equals_whole(spark, min_rows, cap):
    """cap=0 forces the distributed iterative-components merge; the
    default cap takes the driver union-find fast path — both must be
    bit-identical to whole-image polygonize."""
    imgs = spark.createDataFrame(synth.blocky_lcg_image_table(2, 32, 32))
    whole = sorted(tuple(r) for r in V.polygonize(imgs).collect())
    chunks = chunk_images(imgs, min_data_size=32 * min_rows, padding=0)
    ch = sorted(tuple(r)
                for r in V.polygonize_chunked(
                    chunks, driver_graph_cap=cap).collect())
    assert whole == ch
    # every pixel accounted for exactly once
    per_img = {}
    for r in whole:
        per_img[r[0]] = per_img.get(r[0], 0) + r[3]
    assert per_img == {"img_00000000": 1024, "img_00000001": 1024}


def _py_contour_cell(v, i, j, level=0.5):
    tl, tr = v[i, j], v[i, j + 1]
    bl, br = v[i + 1, j], v[i + 1, j + 1]
    b = [int(x >= level) for x in (tl, tr, br, bl)]
    case = b[0] + 2 * b[1] + 4 * b[2] + 8 * b[3]
    nseg = 0 if case in (0, 15) else 2 if case in (5, 10) else 1

    def t(va, vb, ba, bb):
        return (level - va) / (vb - va) if ba != bb else None

    return {"case_idx": case, "n_segments": nseg,
            "t_top": t(tl, tr, b[0], b[1]),
            "t_right": t(tr, br, b[1], b[2]),
            "t_bottom": t(bl, br, b[3], b[2]),
            "t_left": t(tl, bl, b[0], b[3]),
            "saddle_high": ((tl + tr + bl + br) / 4.0 >= level)
            if case in (5, 10) else None}


def test_contour_matches_python_reference(spark):
    pdf = synth.radial_image_table(1, 32, 32)
    imgs = spark.createDataFrame(pdf)
    v = codecs.decode_block(pdf.bytes[0], 32, 32, "raw")
    got = {(r["i"], r["j"]): r
           for r in V.contour_cases(imgs, level=0.5).collect()}
    assert len(got) == 31 * 31
    cases = set()
    for i in range(31):
        for j in range(31):
            want = _py_contour_cell(v, i, j)
            r = got[(i, j)]
            for k, wv in want.items():
                assert r[k] == wv, (i, j, k, r[k], wv)
            cases.add(want["case_idx"])
    assert {0, 15} <= cases  # smooth field has full/empty cells


def test_contour_shared_edges_consistent(spark):
    """The crossing parameter on an edge shared by two cells must be
    the same number from both sides: cell (i,j)'s bottom edge is cell
    (i+1,j)'s top edge; its right edge is (i,j+1)'s left edge."""
    imgs = spark.createDataFrame(synth.lcg_image_table(1, 32, 32))
    got = {(r["i"], r["j"]): r
           for r in V.contour_cases(imgs, level=0.5).collect()}
    for i in range(30):
        for j in range(30):
            assert got[(i, j)]["t_bottom"] == got[(i + 1, j)]["t_top"]
            assert got[(i, j)]["t_right"] == got[(i, j + 1)]["t_left"]


def test_contour_saddles_present_on_lcg(spark):
    imgs = spark.createDataFrame(synth.lcg_image_table(1, 32, 32))
    rows = V.contour_cases(imgs, level=0.5).collect()
    saddles = [r for r in rows if r["case_idx"] in (5, 10)]
    assert saddles, "per-pixel LCG zigzag should be saddle-rich"
    assert all(r["saddle_high"] is not None for r in saddles)
    assert all(r["saddle_high"] is None
               for r in rows if r["case_idx"] not in (5, 10))


def test_polylines_radial_single_circle(spark):
    pdf = synth.radial_image_table(1, 32, 32)
    imgs = spark.createDataFrame(pdf)
    # level 0.25 of ((i-16)^2+(j-16)^2)/512 is the radius-sqrt(128)
    # circle (~11.31) — fully interior to the 31x31 cell domain, so
    # the contour is ONE closed loop (level 0.5's radius-16 circle
    # exits the domain near (31,31) and correctly splits into two
    # border-clipped open arcs)
    rows = V.contour_polylines(imgs, level=0.25).collect()
    assert len(rows) == 1 and rows[0]["closed"]
    xs, ys = np.array(rows[0]["xs"]), np.array(rows[0]["ys"])
    r = np.sqrt((xs - 16) ** 2 + (ys - 16) ** 2)
    # linear interpolation stays within half a pixel of the circle
    assert abs(r - np.sqrt(128.0)).max() < 0.5
    assert len(xs) > 40  # a real ring, not a degenerate chain
    # the clipped case: level 0.5 gives exactly two open border arcs
    clipped = V.contour_polylines(imgs, level=0.5).collect()
    assert len(clipped) == 2
    assert all(not c["closed"] for c in clipped)
    for c in clipped:
        for x, y in ((c["xs"][0], c["ys"][0]), (c["xs"][-1], c["ys"][-1])):
            assert x == 31.0 or y == 31.0 or x == 0.0 or y == 0.0


def test_polylines_plane_single_straight_line(spark):
    block = np.tile(np.arange(32, dtype=np.float64) / 31.0, (32, 1))
    from rasters_rs_spark.functions import codecs as C
    import pandas as _pd
    imgs = spark.createDataFrame(_pd.DataFrame([{
        "image_id": "plane", "bytes": C.encode_block(block, "raw"),
        "w": np.int32(32), "h": np.int32(32), "fmt": "raw",
        "gt": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], "crs": "",
        "no_val": float("nan")}]))
    rows = V.contour_polylines(imgs, level=0.5).collect()
    assert len(rows) == 1 and not rows[0]["closed"]
    xs, ys = np.array(rows[0]["xs"]), np.array(rows[0]["ys"])
    assert np.allclose(xs, 15.5)           # exact vertical line
    assert sorted(ys.tolist()) == list(range(0, 32))


def test_polylines_conserve_segment_count(spark):
    imgs = spark.createDataFrame(pd_concat_images())
    cells = V.contour_cases(imgs, level=0.5).collect()
    want = {}
    for r in cells:
        want[r["image_id"]] = want.get(r["image_id"], 0) + r["n_segments"]
    lines = V.contour_polylines(imgs, level=0.5).collect()
    got = {}
    for r in lines:
        npts = r["n_points"]
        got[r["image_id"]] = got.get(r["image_id"], 0) \
            + (npts if r["closed"] else npts - 1)
    assert got == {k: v for k, v in want.items() if v > 0}
    # determinism: second run returns identical geometry
    again = V.contour_polylines(imgs, level=0.5).collect()
    key = lambda r: (r["image_id"], r["line_id"])
    assert sorted(map(tuple, lines), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, again), key=lambda t: (t[0], t[1]))


def pd_concat_images():
    import pandas as _pd
    return _pd.concat([synth.radial_image_table(1, 32, 32),
                       synth.lcg_image_table(2, 32, 32)],
                      ignore_index=True)


def _shoelace2(xs, ys):
    n = len(xs)
    return sum(xs[k] * ys[(k + 1) % n] - xs[(k + 1) % n] * ys[k]
               for k in range(n))


def test_polygonize_boundaries_shoelace_identity(spark):
    """For every region: exactly one outer ring, and outer shoelace
    area minus hole areas equals the pixel count EXACTLY (integers on
    the corner lattice) — and matches polygonize's n_pixels and the
    ring count is consistent with perimeter (sum of ring lengths in
    unit edges == perimeter)."""
    imgs = spark.createDataFrame(synth.blocky_lcg_image_table(2, 32, 32))
    regions = {(r["image_id"], r["region_label"]): r
               for r in V.polygonize(imgs).collect()}
    rings = V.polygonize_boundaries(imgs).collect()
    byreg = {}
    for r in rings:
        byreg.setdefault((r["image_id"], r["region_label"]),
                         []).append(r)
    assert set(byreg) == set(regions)
    for key, rs in byreg.items():
        outers = [r for r in rs if not r["is_hole"]]
        assert len(outers) == 1, key
        net = 0.0
        perim = 0
        for r in rs:
            a = abs(_shoelace2(r["xs"], r["ys"])) / 2.0
            net += -a if r["is_hole"] else a
            # ring length in unit edges = sum of |dx|+|dy| between
            # consecutive corner points (all segments axis-aligned)
            n = len(r["xs"])
            perim += int(sum(abs(r["xs"][(k + 1) % n] - r["xs"][k])
                             + abs(r["ys"][(k + 1) % n] - r["ys"][k])
                             for k in range(n)))
        assert net == regions[key]["n_pixels"], key
        assert perim == regions[key]["perimeter"], key


def test_polygonize_boundaries_square_golden(spark):
    import pandas as _pd
    from rasters_rs_spark.functions import codecs as C
    block = np.zeros((8, 8))
    block[2:5, 3:6] = 0.9          # class 3 square on class 0 field
    imgs = spark.createDataFrame(_pd.DataFrame([{
        "image_id": "sq", "bytes": C.encode_block(block, "raw"),
        "w": np.int32(8), "h": np.int32(8), "fmt": "raw",
        "gt": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], "crs": "",
        "no_val": float("nan")}]))
    rows = V.polygonize_boundaries(imgs).collect()
    sq = [r for r in rows if r["cls"] == 3]
    assert len(sq) == 1 and not sq[0]["is_hole"]
    assert list(zip(sq[0]["xs"], sq[0]["ys"])) == [
        (3.0, 2.0), (6.0, 2.0), (6.0, 5.0), (3.0, 5.0)]
    # the background region has exactly one hole: the square
    bg = [r for r in rows if r["cls"] == 0]
    assert sorted(r["is_hole"] for r in bg) == [False, True]
    hole = [r for r in bg if r["is_hole"]][0]
    assert abs(_shoelace2(hole["xs"], hole["ys"])) / 2.0 == 9.0


def test_polylines_world_coordinates(spark):
    """world=True maps pixel-space vertices through the geo-transform
    with the +0.5 pixel-center rule."""
    pdf = synth.radial_image_table(1, 32, 32)
    imgs = spark.createDataFrame(pdf)
    pix = V.contour_polylines(imgs, level=0.25).collect()[0]
    wld = V.contour_polylines(imgs, level=0.25, world=True).collect()[0]
    gx, a, _, gy, _, e = pdf["gt"][0]
    assert wld["xs"] == [gx + (x + 0.5) * a for x in pix["xs"]]
    assert wld["ys"] == [gy + (y + 0.5) * e for y in pix["ys"]]
