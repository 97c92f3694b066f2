"""Property-based tests (hypothesis) — beyond the reference's own test
strategy: invariants that must hold for ALL configurations, not just
the golden vectors."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rasters_rs_spark.functions import codecs, geom
from rasters_rs_spark.functions import mercator as M
from rasters_rs_spark.plans.chunking import ChunkPlan, mod_ceil


@given(w=st.integers(1, 500), h=st.integers(1, 2000),
       bs=st.integers(1, 32), dh=st.integers(1, 300),
       pad=st.integers(0, 20),
       start=st.integers(0, 2100), end=st.integers(0, 2100))
@settings(max_examples=300, deadline=None)
def test_chunk_plan_invariants(w, h, bs, dh, pad, start, end):
    plan = (ChunkPlan(w, h).add_block_size(bs).with_min_data_height(dh)
            .with_padding(pad).with_start(start).with_end(end))
    rows = list(plan.chunks())
    assert len(rows) == len(plan)
    eff_start = max(start, pad)
    eff_end = min(end, h)
    if eff_start >= eff_end:
        assert rows == []
        return
    # data ranges tile [eff_start, last_data_end) contiguously
    assert rows[0][1] == eff_start
    for a, b in zip(rows, rows[1:]):
        assert a[2] == b[1], "contiguous data ranges"
    for i, (idx, ds, de, ls, le) in enumerate(rows):
        assert idx == i
        assert ls == ds - pad
        assert 0 <= ls <= le <= h, "load window inside raster"
        assert de - ds >= 0
        if 0 < i < len(rows) - 1:
            assert de - ds == plan.data_height, "interior chunks full height"
    # interior load ends on block boundaries (block-aligned I/O)
    for (_, _, _, _, le) in rows[:-1]:
        if len(rows) > 1:
            assert le % plan.block_size == 0
    # every data row in [eff_start, eff_end) is covered at most once and
    # the coverage reaches at least eff_end - pad (border rows may be
    # load-clamped away, mirroring the reference)
    covered = sum(de - ds for (_, ds, de, _, _) in rows)
    assert rows[-1][2] <= eff_end
    assert covered == rows[-1][2] - eff_start


@given(nums=st.integers(0, 10**9), m=st.integers(1, 10**6))
def test_mod_ceil_properties(nums, m):
    r = mod_ceil(nums, m)
    assert r % m == 0 and r >= nums and r - nums < m


@given(minx=st.floats(-1e6, 1e6), miny=st.floats(-1e6, 1e6),
       dx=st.floats(0.001, 1e5), dy=st.floats(0.001, 1e5),
       w=st.integers(1, 10000), h=st.integers(1, 10000))
@settings(max_examples=200, deadline=None)
def test_window_from_bounds_invariants(minx, miny, dx, dy, w, h):
    win = geom.window_from_bounds((minx, miny, minx + dx, miny + dy), (w, h))
    (ox, oy), (sw, sh) = win
    assert 0 <= ox <= w and 0 <= oy <= h
    assert ox + sw <= w and oy + sh <= h
    if sw and sh:
        # the window covers the clipped bounds (partial pixels included)
        assert ox <= max(minx, 0) + 1e-9
        assert ox + sw >= min(minx + dx, w) - 1e-9


@given(lat=st.floats(-80, 84), lon_off=st.floats(-6, 6))
@settings(max_examples=200, deadline=None)
def test_tm_roundtrip_property(lat, lon_off):
    lon0 = 75.0
    e, n = M.tm_forward(lat, lon0 + lon_off, lon0_deg=lon0)
    lat2, lon2 = M.tm_inverse(e, n, lon0_deg=lon0)
    assert abs(float(lat2) - lat) < 1e-9
    assert abs(float(lon2) - (lon0 + lon_off)) < 1e-9


@given(lon=st.floats(-179.9, 179.9), lat=st.floats(-85, 85))
def test_wm_roundtrip_property(lon, lat):
    lon2, lat2 = M.wm_to_lonlat(*M.lonlat_to_wm(lon, lat))
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_q16_roundtrip_error_bound(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    shape = (data.draw(st.integers(1, 20)), data.draw(st.integers(1, 20)))
    scale = data.draw(st.floats(1e-6, 1e6))
    block = rng.normal(size=shape) * scale
    enc = codecs.encode_q16(block)
    dec = codecs.decode_q16(enc, *shape)
    vrange = block.max() - block.min()
    if vrange > 0:
        # reconstruction error bounded by 2 quantization steps
        assert np.nanmax(np.abs(dec - block)) <= 2.01 * vrange / codecs.Q16_BINS


@given(zoom=st.integers(0, 22),
       x=st.floats(-20037507.0, 20037507.0),
       y=st.floats(-20037507.0, 20037507.0))
def test_tile_index_in_range(zoom, x, y):
    tx, ty = M.tile_index(zoom, x, y)
    assert 0 <= int(tx) < (1 << zoom) or zoom == 0
    assert 0 <= int(ty) < (1 << zoom) or zoom == 0


@given(px=st.lists(st.floats(-100, 100), min_size=1, max_size=50),
       py=st.lists(st.floats(-100, 100), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_pip_agrees_with_matplotlib_free_oracle(px, py):
    """Containment in a convex polygon == all cross products same sign
    (independent oracle for convex cases)."""
    n = min(len(px), len(py))
    pts_x = np.array(px[:n])
    pts_y = np.array(py[:n])
    # fixed convex polygon (square rotated 45 deg)
    xs = [0.0, 50.0, 0.0, -50.0]
    ys = [-50.0, 0.0, 50.0, 0.0]
    got = geom.points_in_rings(pts_x, pts_y, [0], xs, ys)
    expect = (np.abs(pts_x) + np.abs(pts_y)) < 50.0
    boundary = np.isclose(np.abs(pts_x) + np.abs(pts_y), 50.0)
    assert np.array_equal(got[~boundary], expect[~boundary])


@given(texts=st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=60), min_size=0, max_size=25),
    k=st.integers(2, 12))
@settings(max_examples=120, deadline=None)
def test_fingerprint_batch_equals_scalar_property(texts, k):
    """The cross-document vectorized fingerprint equals the scalar
    per-doc rolling hash for ARBITRARY unicode texts and window sizes
    (empty docs, docs shorter than k, multi-byte codepoints)."""
    from rasters_rs_spark.operators import text as TX
    got = TX.fingerprint_batch(texts, k=k)
    expect = [TX.fingerprint_minhash(t or "", k) for t in texts]
    assert got.tolist() == expect


@given(px=st.lists(st.floats(-2.5, 2.5), min_size=1, max_size=40),
       py=st.lists(st.floats(-2.5, 2.5), min_size=1, max_size=40),
       n=st.integers(3, 9), seed=st.integers(0, 10_000))
@settings(max_examples=150, deadline=None)
def test_winding_equals_evenodd_on_simple_polygons(px, py, n, seed):
    """For SIMPLE (non-self-intersecting) polygons — any star-convex
    ring qualifies — the nonzero winding rule and the even-odd rule
    are the same predicate, regardless of ring orientation."""
    rng = np.random.default_rng(seed)
    m = min(len(px), len(py))
    pxa = np.asarray(px[:m])
    pya = np.asarray(py[:m])
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
    if np.any(np.diff(ang) < 1e-6):      # degenerate spoke collision
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = rng.uniform(0.5, 2.0, size=n)
    xs = r * np.cos(ang)
    ys = r * np.sin(ang)
    if seed % 2:                          # flip orientation
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
    eo = geom.points_in_rings(pxa, pya, [0], xs, ys)
    nz = geom.points_in_rings_winding(pxa, pya, [0], xs, ys)
    assert eo.tolist() == nz.tolist()


@given(h=st.integers(1, 40), w=st.integers(1, 40),
       n_patch=st.integers(0, 25), seed=st.integers(0, 10_000),
       fmt=st.sampled_from(["raw", "q16"]))
@settings(max_examples=150, deadline=None)
def test_patch_block_bytes_invariants(h, w, n_patch, seed, fmt):
    """For ANY block/patch set: unpatched bytes are byte-identical to
    the input, raw patches are exact, and q16 patches land on the
    original header's grid (error <= one quantization step, header
    preserved)."""
    rng = np.random.default_rng(seed)
    block = rng.normal(size=(h, w))
    data = codecs.encode_block(block, fmt)
    n = min(n_patch, h * w)
    flat = rng.choice(h * w, size=n, replace=False)
    ii, jj = flat // w, flat % w
    vals = rng.normal(size=n)
    out = codecs.patch_block_bytes(data, ii, jj, vals, h, w, fmt)
    assert len(out) == len(data)
    dec_in = codecs.decode_block(data, h, w, fmt)
    dec_out = codecs.decode_block(out, h, w, fmt)
    mask = np.ones((h, w), dtype=bool)
    mask[ii, jj] = False
    # untouched pixels: byte-identical (stronger than value-equal)
    if fmt == "q16":
        assert out[:16] == data[:16]
        px = np.frombuffer(data, dtype=">u2", offset=16)
        qx = np.frombuffer(out, dtype=">u2", offset=16)
        assert np.array_equal(px.reshape(h, w)[mask], qx.reshape(h, w)[mask])
        import struct
        vmin, vmax = struct.unpack_from("<dd", data, 0)
        step = (vmax - vmin) / 65535.0
        clamped = np.clip(vals, vmin, vmax)
        assert np.all(np.abs(dec_out[ii, jj] - clamped) <= step + 1e-12)
    else:
        assert np.array_equal(dec_in[mask], dec_out[mask])
        assert np.array_equal(dec_out[ii, jj], vals)


@given(n=st.integers(3, 60), seed=st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_delaunay_property_random_sets(n, seed):
    """Empty-circumcircle criterion and linear-field exactness for ANY
    random point set (degenerate collinear subsets tolerated by the
    det==0 skip)."""
    from rasters_rs_spark.functions.delaunay import (_circumcircles,
                                                     delaunay_triangles)
    from rasters_rs_spark.operators.knn import barycentric_interpolate
    rng = np.random.default_rng(seed)
    x = rng.random(n) * 10.0
    y = rng.random(n) * 10.0
    tris = delaunay_triangles(x, y)
    if len(tris) == 0:
        return
    pts = np.stack([x, y], axis=1)
    centers, r2 = _circumcircles(pts, tris)
    ok = np.isfinite(r2)
    d2 = ((pts[None, :, :] - centers[ok][:, None, :]) ** 2).sum(-1)
    assert not (d2 < r2[ok][:, None] * (1.0 - 1e-7)).any()
    # linear field reproduced at the input points themselves
    z = 0.5 + 2.0 * x - 3.0 * y
    got = barycentric_interpolate(x, y, x, y, z, tris)
    inside = ~np.isnan(got)
    assert inside.any()
    assert np.allclose(got[inside], z[inside], atol=1e-6)


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.text(alphabet="ab xyü", min_size=0, max_size=40)),
    min_size=0, max_size=25),
    st.integers(min_value=1, max_value=4))
def test_repetition_batch_kernel_equals_counter(texts, n):
    """The cross-document vectorized repetition kernel equals the
    per-doc Counter mirror on arbitrary texts (nulls, empties, runs of
    spaces, multi-byte chars) for every n."""
    from collections import Counter

    import numpy as np

    from rasters_rs_spark.operators.text import _repetition_batch

    t1, p1 = _repetition_batch(texts, n)
    for i, t in enumerate(texts):
        toks = ("" if t is None else t).split(" ")
        m = max(len(toks) - (n - 1), 1)
        c = Counter(" ".join(toks[j:j + n]) for j in range(m))
        assert t1[i] == m and p1[i] == max(c.values()), (i, t, n)


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.text(alphabet="abcdeortw XY7!", min_size=0, max_size=60),
    min_size=0, max_size=15))
def test_bpe_batch_kernel_equals_scalar(texts):
    """The vectorized BPE merge kernel equals the scalar greedy-fold
    tokenizer on arbitrary text (cleaning, chained same-char runs,
    multi-rank chains)."""
    import re

    import numpy as np

    from rasters_rs_spark.operators.text import (BPE_MERGES,
                                                 _bpe_count_batch,
                                                 bpe_tokenize_scalar)

    clean = [re.sub("[^a-z ]", "", t.lower()) for t in texts]
    got = _bpe_count_batch(clean, BPE_MERGES)
    for i, t in enumerate(texts):
        assert got[i] == len(bpe_tokenize_scalar(t)), (i, t)


@given(h=st.integers(2, 24), w=st.integers(2, 24),
       ncls=st.integers(1, 4), seed=st.integers(0, 10**6))
@settings(max_examples=60, deadline=None)
def test_ccl_matches_flood_fill_property(h, w, ncls, seed):
    from rasters_rs_spark.operators.vectorize import ccl_min_labels

    rng = np.random.default_rng(seed)
    cls = rng.integers(0, ncls, size=(h, w))
    lab = ccl_min_labels(cls).reshape(h, w)
    # label of each pixel is the min flat index reachable through
    # same-class 4-paths: verify by BFS per pixel of a sample
    for _ in range(5):
        i, j = int(rng.integers(h)), int(rng.integers(w))
        seen = {(i, j)}
        stack = [(i, j)]
        best = i * w + j
        while stack:
            a, b = stack.pop()
            best = min(best, a * w + b)
            for na, nb in ((a - 1, b), (a + 1, b), (a, b - 1),
                           (a, b + 1)):
                if (0 <= na < h and 0 <= nb < w
                        and (na, nb) not in seen
                        and cls[na, nb] == cls[i, j]):
                    seen.add((na, nb))
                    stack.append((na, nb))
        assert lab[i, j] == best


@given(h=st.integers(2, 16), w=st.integers(2, 16),
       p=st.floats(0.2, 0.8), seed=st.integers(0, 10**6))
@settings(max_examples=60, deadline=None)
def test_boundary_tracing_shoelace_property(h, w, p, seed):
    from rasters_rs_spark.operators.vectorize import (
        ccl_min_labels, trace_region_boundaries)

    rng = np.random.default_rng(seed)
    cls = (rng.random((h, w)) < p).astype(int)
    lab = ccl_min_labels(cls).reshape(h, w)
    for label in np.unique(lab):
        mask = lab == label
        rings = trace_region_boundaries(mask)
        outers = [r for r in rings if not r[0]]
        assert len(outers) == 1
        net = 0.0
        for is_hole, xs, ys in rings:
            n = len(xs)
            a2 = sum(xs[k] * ys[(k + 1) % n] - xs[(k + 1) % n] * ys[k]
                     for k in range(n))
            net += -abs(a2) / 2.0 if is_hole else abs(a2) / 2.0
        assert net == mask.sum()


@given(f=st.floats(0.0, 1.0, exclude_max=True))
@settings(max_examples=200, deadline=None)
def test_cubic_kernel_partition_and_first_moment(f):
    """Catmull-Rom taps: weights sum to 1 (partition of unity) and
    their first moment equals the fractional offset (linear
    precision) for every f in [0, 1)."""
    A = -0.5

    def wcub(fv, d):
        if d == -1:
            t = 1.0 + fv
            return A * t ** 3 - 5 * A * t ** 2 + 8 * A * t - 4 * A
        if d == 0:
            return (A + 2) * fv ** 3 - (A + 3) * fv ** 2 + 1
        if d == 1:
            t = 1.0 - fv
            return (A + 2) * t ** 3 - (A + 3) * t ** 2 + 1
        t = 2.0 - fv
        return A * t ** 3 - 5 * A * t ** 2 + 8 * A * t - 4 * A

    ws = [wcub(f, d) for d in (-1, 0, 1, 2)]
    assert abs(sum(ws) - 1.0) < 1e-12
    assert abs(sum(w * d for w, d in zip(ws, (-1, 0, 1, 2))) - f) < 1e-12


@given(level=st.floats(0.05, 0.95), seed=st.integers(0, 10**6))
@settings(max_examples=40, deadline=None)
def test_marching_squares_crossing_parity(level, seed):
    """Per cell: the number of crossing edges is twice the segment
    count (every segment consumes two crossings), and a crossing
    exists exactly where the corner bits differ."""
    from rasters_rs_spark.operators.vectorize import _MS_NSEG

    rng = np.random.default_rng(seed)
    v = rng.random((6, 6))
    for i in range(5):
        for j in range(5):
            b = [int(v[i, j] >= level), int(v[i, j + 1] >= level),
                 int(v[i + 1, j + 1] >= level), int(v[i + 1, j] >= level)]
            case = b[0] + 2 * b[1] + 4 * b[2] + 8 * b[3]
            crossings = (int(b[0] != b[1]) + int(b[1] != b[2])
                         + int(b[3] != b[2]) + int(b[0] != b[3]))
            assert crossings == 2 * _MS_NSEG[case]
