"""Deterministic synthetic tables (seeded; no external data).

Generates the BASELINE.json input-hint image table
(image_id, bytes, w, h, fmt, caption, phash) plus geo metadata columns
(gt: array<double>[6], crs, no_val, bands), and the AOI-polygon and
points tables used by the spatial joins (FIXTURES.md sections 1, 3, 4).

All generators are pure functions of (seed, n) so tests, the driver
contract, and the benchmark see identical data at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import codecs

_WORDS = (
    "aerial drone ortho survey field crop ridge valley river delta canal "
    "road bridge rooftop solar panel quarry forest shore dune glacier "
    "terrace vineyard orchard paddock runway harbor reef mesa butte plain"
).split()

DEFAULT_EXTENT = (-2000.0, -2000.0, 2000.0, 2000.0)  # world coords (EPSG:3857-like)


def make_caption(rng: np.random.Generator) -> str:
    k = int(rng.integers(3, 9))
    return " ".join(rng.choice(_WORDS, size=k))


def phash64(block: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 block-mean > global mean.

    Stands in for the input_hint ``phash`` column; stable across codecs
    for blocks that survive q16 quantization (PSNR>=40dB)."""
    h, w = block.shape
    data = np.nan_to_num(block, nan=0.0)
    # average-pool to 8x8 (pad to a multiple of 8 first)
    ph = (8 - h % 8) % 8
    pw = (8 - w % 8) % 8
    if ph or pw:
        data = np.pad(data, ((0, ph), (0, pw)), mode="edge")
    hh, ww = data.shape
    pooled = data.reshape(8, hh // 8, 8, ww // 8).mean(axis=(1, 3))
    bits = (pooled > pooled.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def make_image_block(seed: int, idx: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed * 1_000_003 + idx)
    return rng.normal(size=(h, w))


def image_table(n: int, seed: int = 42, h: int = 64, w: int = 64,
                fmt_cycle=("raw", "q16"), extent=DEFAULT_EXTENT,
                pixel_size: float = 1.0, crs: str = "EPSG:3857",
                nan_frac: float = 0.0,
                plant_neardups=()) -> pd.DataFrame:
    """Image+caption table; images are placed on a deterministic grid of
    top-left corners inside ``extent`` so centroids spread across cells.

    ``plant_neardups``: (dst_idx, src_idx) pairs — dst's block becomes a
    copy of src's with one pooled phash cell bumped, so the pair's REAL
    phashes (still phash64(bytes): the column/content invariant holds)
    sit a few hamming bits apart. Keeps near-dup fixtures non-vacuous:
    48 independent gaussian images contain no pair within hamming 12,
    so an oracle over them would also pass a broken operator."""
    rows = []
    planted = dict(plant_neardups)
    ncols = max(int(np.ceil(np.sqrt(n))), 1)
    span_x = extent[2] - extent[0] - w * pixel_size
    span_y = extent[3] - extent[1] - h * pixel_size
    for i in range(n):
        if i in planted:
            block = make_image_block(seed, planted[i], h, w)
            block[: max(h // 8, 1), : max(w // 8, 1)] += 1.0
        else:
            block = make_image_block(seed, i, h, w)
        if nan_frac > 0.0:
            hole = np.random.default_rng(seed * 7 + i).random(block.shape) < nan_frac
            block[hole] = np.nan
        fmt = fmt_cycle[i % len(fmt_cycle)]
        gx = extent[0] + (i % ncols) / max(ncols - 1, 1) * max(span_x, 0.0)
        gy = extent[3] - (i // ncols) / max(ncols, 1) * max(span_y, 0.0)
        gt = [gx, pixel_size, 0.0, gy, 0.0, -pixel_size]
        rows.append(
            {
                "image_id": f"img_{i:08d}",
                "bytes": codecs.encode_block(block, fmt),
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                # per-row rng: row i is identical no matter which task
                # (or how many tasks) generate it
                "caption": make_caption(np.random.default_rng(seed * 31 + i)),
                "phash": np.int64(phash64(block)),
                "gt": [float(v) for v in gt],
                "crs": crs,
                "no_val": float("nan"),
                "bands": np.int32(1),
            }
        )
    return pd.DataFrame(rows)


IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, gt array<double>, crs string, "
    "no_val double, bands int"
)


def image_table_distributed(spark, n: int, seed: int = 42, h: int = 64,
                            w: int = 64, fmt_cycle=("raw", "q16"),
                            extent=DEFAULT_EXTENT, pixel_size: float = 1.0,
                            crs: str = "EPSG:3857", partitions: int = 32):
    """Executor-side deterministic image synthesis: spark.range(n) ->
    mapInPandas building each row from its index. Identical rows to
    ``image_table`` for the same parameters (both derive every field
    from (seed, i)); this variant never materializes pixels on the
    driver, so it scales to arbitrary n."""
    ncols = max(int(np.ceil(np.sqrt(n))), 1)
    span_x = extent[2] - extent[0] - w * pixel_size
    span_y = extent[3] - extent[1] - h * pixel_size

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                block = make_image_block(seed, i, h, w)
                fmt = fmt_cycle[i % len(fmt_cycle)]
                gx = extent[0] + (i % ncols) / max(ncols - 1, 1) * max(span_x, 0.0)
                gy = extent[3] - (i // ncols) / max(ncols, 1) * max(span_y, 0.0)
                rng = np.random.default_rng(seed * 31 + i)
                rows.append((f"img_{i:08d}", codecs.encode_block(block, fmt),
                             w, h, fmt, make_caption(rng),
                             np.int64(phash64(block)),
                             [gx, pixel_size, 0.0, gy, 0.0, -pixel_size],
                             crs, float("nan"), 1))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "gt", "crs", "no_val", "bands"])

    return spark.range(n).repartition(partitions).mapInPandas(
        gen, schema=IMAGE_SCHEMA)


LCG_A, LCG_C, LCG_M = 1103515245, 12345, 1 << 31
LCG_Q = 1 << 20  # value grid 2^-20: sums of squares stay exact in f64


def lcg_values(k: np.ndarray) -> np.ndarray:
    """Deterministic pixel values from integer indices, reproducible in
    ANSI SQL: ((A*k + C) mod 2^31) mod 2^20 / 2^20. The dyadic value
    grid makes sums AND sums of squares exactly representable, so float
    aggregates are order-independent and bit-comparable across engines."""
    raw = (LCG_A * k.astype(np.int64) + LCG_C) % LCG_M
    return (raw % LCG_Q).astype(np.float64) / float(LCG_Q)


def lcg_sql_expr(k_expr: str) -> str:
    """The DuckDB-side mirror of lcg_values for a BIGINT expression."""
    return (f"CAST(((1103515245 * ({k_expr}) + 12345) % 2147483648) "
            f"% 1048576 AS DOUBLE) / 1048576.0")


def lcg_image_table(n: int, w: int = 32, h: int = 32, pixel_size: float = 2.0,
                    k_offset: int = 0, bands: int = 1,
                    grid_cols: int = 8, spacing: float = 120.0,
                    coarse: int = 0, fmt: str = "raw",
                    origin_shift: tuple[float, float] = (0.0, 0.0),
                    holes_below: float | None = None,
                    hole_val: float = -999.0) -> pd.DataFrame:
    """Image table whose pixels come from the SQL-expressible LCG:
    pixel (i, j) of image m has k = k_offset + m*bands*h*w + b*h*w + i*w + j.
    Images sit on a deterministic grid of origins (optionally shifted by
    ``origin_shift`` for partial-overlap fixtures). ``coarse`` > 0
    quantizes values onto {0, 1/coarse, ...} (e.g. coarse=4 makes 0.0 a
    25%-likely value, useful as a no-data sentinel). ``fmt`` selects the
    codec ('q16' exercises the lossy path; its min/max/quantize math is
    SQL-mirrorable). ``holes_below`` plants SQL-derivable no-data holes:
    pixels with lcg value < holes_below become ``hole_val`` and the
    table's no_val is set accordingly."""
    rows = []
    for m in range(n):
        k0 = k_offset + m * bands * h * w
        k = k0 + np.arange(bands * h * w, dtype=np.int64)
        if coarse > 0:
            raw = (LCG_A * k + LCG_C) % LCG_M
            block = ((raw % LCG_Q) // (LCG_Q // coarse)).astype(np.float64) / coarse
            block = block.reshape(bands * h, w)
        else:
            block = lcg_values(k).reshape(bands * h, w)
        no_val = float("nan")
        if holes_below is not None:
            block = np.where(block < holes_below, hole_val, block)
            no_val = hole_val
        gx = -1000.0 + (m % grid_cols) * spacing + origin_shift[0]
        gy = 1000.0 - (m // grid_cols) * spacing + origin_shift[1]
        rows.append({
            "image_id": f"img_{m:08d}",
            "bytes": codecs.encode_block(block, fmt),
            "w": np.int32(w), "h": np.int32(h), "fmt": fmt,
            "caption": f"lcg {m}", "phash": np.int64(0),
            "gt": [gx, pixel_size, 0.0, gy, 0.0, -pixel_size],
            "crs": "EPSG:3857", "no_val": no_val,
            "bands": np.int32(bands),
        })
    return pd.DataFrame(rows)


def aoi_table(n: int, seed: int = 43, extent=DEFAULT_EXTENT) -> pd.DataFrame:
    """AOI polygons as packed coordinate buffers (FIXTURES.md section 3).

    Star-convex polygons; includes one polygon with a hole (index 0 when
    n >= 1) and one fully outside the extent (index 1 when n >= 2)."""
    rng = np.random.default_rng(seed)
    rows = []
    ex_w = extent[2] - extent[0]
    ex_h = extent[3] - extent[1]
    for i in range(n):
        if i == 1:
            # disjoint polygon, far outside the extent
            cx, cy, r = extent[2] + 10 * ex_w, extent[3] + 10 * ex_h, ex_w * 0.05
        else:
            cx = extent[0] + rng.random() * ex_w
            cy = extent[1] + rng.random() * ex_h
            r = (0.05 + rng.random() * 0.2) * min(ex_w, ex_h)
        k = int(rng.integers(5, 12))
        ang = np.sort(rng.random(k)) * 2 * np.pi
        rad = r * (0.5 + rng.random(k) * 0.5)
        xs = (cx + rad * np.cos(ang)).tolist()
        ys = (cy + rad * np.sin(ang)).tolist()
        ring_offsets = [0]
        if i == 0 and n >= 1:
            # punch a small square hole at the centroid
            hr = r * 0.15
            ring_offsets.append(len(xs))
            xs += [cx - hr, cx + hr, cx + hr, cx - hr]
            ys += [cy - hr, cy - hr, cy + hr, cy + hr]
        rows.append(
            {
                "aoi_id": f"aoi_{i:05d}",
                "ring_offsets": ring_offsets,
                "xs": xs,
                "ys": ys,
            }
        )
    return pd.DataFrame(rows)


def points_table(n: int, seed: int = 44, extent=DEFAULT_EXTENT) -> pd.DataFrame:
    """Scattered (x, y, z) points for kNN / fill (FIXTURES.md section 4)."""
    rng = np.random.default_rng(seed)
    xs = extent[0] + rng.random(n) * (extent[2] - extent[0])
    ys = extent[1] + rng.random(n) * (extent[3] - extent[1])
    zs = rng.normal(size=n) * 10.0 + 100.0
    return pd.DataFrame(
        {
            "pt_id": [f"pt_{i:07d}" for i in range(n)],
            "x": xs,
            "y": ys,
            "z": zs,
        }
    )


def clip_caption_table(n: int = 48, w: int = 32, h: int = 32,
                       grid: int = 4, buckets: int = 8,
                       plant_neardups=()) -> pd.DataFrame:
    """LCG image+caption pairs for the CLIP-style alignment gate
    (multimodal.clip_score_filter): the caption of image m DESCRIBES
    its image as one token per grid cell, ``c<cell>_<K>`` with
    K = floor(cell_mean * buckets * 64) % buckets — the FINE-scale
    fractional part, because the plain floor(mean * buckets) of a
    64-pixel uniform mean concentrates on the middle bucket (CLT) and
    a chance match would score ~0.5 instead of ~1/buckets. Cell means
    of dyadic LCG pixels are exact in f64 (and so is mean * 512), so
    K — and therefore the whole caption — is SQL-derivable from the
    pixel formula alone.

    Planted misalignments corrupt the caption TOKENS directly rather
    than swapping in a neighboring image's caption: the LCG is affine
    in k, so adjacent images differ by a near-constant value shift and
    their captions are heavily correlated (a swapped caption scored
    anywhere from 0.0 to 0.5+ depending on the mod-2^20 wrap). The
    corruption offset 1 + cell % (buckets-1) is never 0 mod buckets,
    so corrupted cells NEVER match:

    - m % 4 in (0, 1): aligned caption          -> score exactly 1.0
    - m % 4 == 2: every cell corrupted          -> score exactly 0.0
    - m % 4 == 3: odd cells corrupted           -> score exactly 0.5

    ``plant_neardups``: (dst, src) pairs — dst's block becomes src's
    with one pooled phash cell bumped (image_table's planting rule),
    so the pair's REAL phashes sit a few hamming bits apart for the
    dedup stage; dst's caption/phash/bytes are all recomputed from
    the modified block, so dst still passes the alignment gate (its
    caption class follows dst's own m % 4)."""
    base = lcg_image_table(n, w, h)
    ch, cw = h // grid, w // grid
    planted = dict(plant_neardups)

    def block_of(m: int) -> np.ndarray:
        src = planted.get(m, m)
        k0 = src * h * w
        block = lcg_values(k0 + np.arange(h * w, dtype=np.int64)).reshape(h, w)
        if m in planted:
            block[: max(h // 8, 1), : max(w // 8, 1)] += 1.0
        return block

    def tokens(m: int) -> str:
        block = block_of(m)
        means = block.reshape(grid, ch, grid, cw).mean(axis=(1, 3))
        ks = (means * buckets * 64).astype(np.int64) % buckets
        toks = []
        for ci in range(grid):
            for cj in range(grid):
                cell = ci * grid + cj
                k = int(ks[ci, cj])
                if m % 4 == 2 or (m % 4 == 3 and cell % 2 == 1):
                    k = (k + 1 + cell % (buckets - 1)) % buckets
                toks.append(f"c{cell}_{k}")
        return " ".join(toks)

    base["caption"] = [tokens(m) for m in range(n)]
    # real content phashes (lcg_image_table stubs phash=0, which would
    # make EVERY pair a phash near-dup downstream); planted rows also
    # re-encode their modified bytes to keep the content invariant
    base["phash"] = [np.int64(phash64(block_of(m))) for m in range(n)]
    for m in planted:
        base.loc[m, "bytes"] = codecs.encode_block(block_of(m), "raw")
    return base


def blocky_lcg_image_table(n: int, w: int = 32, h: int = 32,
                           cell: int = 4, n_classes: int = 4,
                           pixel_size: float = 2.0) -> pd.DataFrame:
    """Spatially-correlated class field for region-extraction fixtures
    (per-pixel LCG is useless for polygonize: consecutive values jump
    by ~0.51, so no two 4-neighbors ever share a class). Pixel (i, j)
    of image m takes its CELL's LCG class — cell index
    kc = m * 100000 + (i // cell) * 256 + (j // cell), class =
    (((A*kc + C) mod 2^31) mod 2^20) // (2^20 / n_classes) — the HIGH
    bits of the value grid, NOT mod n_classes: A = 1 and C = 1 mod 4,
    so low bits collapse to (kc+1) mod 4 and the field degenerates to
    vertical stripes (rows enter kc times 256). The high-bit form
    gives irregular multi-cell blobs whose components span chunk
    strips. Both the class and the value are exact dyadics and the
    whole construction is one integer expression in SQL."""
    rows = []
    for m in range(n):
        ii = np.arange(h, dtype=np.int64)[:, None] // cell
        jj = np.arange(w, dtype=np.int64)[None, :] // cell
        kc = m * 100000 + ii * 256 + jj
        cls = ((LCG_A * kc + LCG_C) % LCG_M % LCG_Q) // (LCG_Q // n_classes)
        block = cls.astype(np.float64) / n_classes
        gx = -1000.0 + (m % 8) * 120.0
        gy = 1000.0 - (m // 8) * 120.0
        rows.append({
            "image_id": f"img_{m:08d}",
            "bytes": codecs.encode_block(block, "raw"),
            "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
            "caption": f"blocky {m}", "phash": np.int64(0),
            "gt": [gx, pixel_size, 0.0, gy, 0.0, -pixel_size],
            "crs": "EPSG:3857", "no_val": float("nan"),
            "bands": np.int32(1),
        })
    return pd.DataFrame(rows)


def blocky_cls_sql_expr(m: str, i: str, j: str, cell: int = 4,
                        n_classes: int = 4) -> str:
    """DuckDB mirror of blocky_lcg_image_table's class formula."""
    kc = f"(({m}) * 100000 + (({i}) // {cell}) * 256 + ({j}) // {cell})"
    return (f"(((1103515245 * {kc} + 12345) % 2147483648) % 1048576 "
            f"// {1048576 // n_classes})")


def radial_image_table(n: int = 1, w: int = 32, h: int = 32,
                       pixel_size: float = 2.0,
                       k_offset: int = 0) -> pd.DataFrame:
    """Smooth radial field for contour fixtures: v(i, j) =
    ((i-16)^2 + (j-16)^2) / 512 — exact dyadic, monotone from 0 at the
    center to 1.0 at the corners, so the 0.5 level set is a circle and
    every non-saddle marching-squares case appears. Image m shifts the
    center by m pixels (k_offset unused, reserved)."""
    rows = []
    for m in range(n):
        ci, cj = 16 + m, 16 - m
        ii = np.arange(h, dtype=np.float64)[:, None]
        jj = np.arange(w, dtype=np.float64)[None, :]
        block = ((ii - ci) ** 2 + (jj - cj) ** 2) / 512.0
        gx = -1000.0 + (m % 8) * 120.0
        gy = 1000.0 - (m // 8) * 120.0
        rows.append({
            "image_id": f"rad_{m:08d}",
            "bytes": codecs.encode_block(block, "raw"),
            "w": np.int32(w), "h": np.int32(h), "fmt": "raw",
            "caption": f"radial {m}", "phash": np.int64(0),
            "gt": [gx, pixel_size, 0.0, gy, 0.0, -pixel_size],
            "crs": "EPSG:3857", "no_val": float("nan"),
            "bands": np.int32(1),
        })
    return pd.DataFrame(rows)


def blocky_image_table_distributed(spark, n: int, w: int = 512,
                                   h: int = 512, cell: int = 8,
                                   n_classes: int = 4,
                                   partitions: int = 32):
    """Executor-side blocky_lcg_image_table (same per-pixel values for
    the same parameters): pixels never materialize on the driver, so
    the polygonize scale rows can run rasters of arbitrary count."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                ii = np.arange(h, dtype=np.int64)[:, None] // cell
                jj = np.arange(w, dtype=np.int64)[None, :] // cell
                kc = m * 100000 + ii * 256 + jj
                cls = ((LCG_A * kc + LCG_C) % LCG_M % LCG_Q) \
                    // (LCG_Q // n_classes)
                block = cls.astype(np.float64) / n_classes
                gx = -1000.0 + (m % 8) * 120.0
                gy = 1000.0 - (m // 8) * 120.0
                rows.append((f"img_{m:08d}",
                             codecs.encode_block(block, "raw"),
                             np.int32(w), np.int32(h), "raw",
                             f"blocky {m}", np.int64(0),
                             [gx, 2.0, 0.0, gy, 0.0, -2.0],
                             "EPSG:3857", float("nan"), np.int32(1)))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "gt", "crs", "no_val", "bands"])

    return spark.range(n).repartition(partitions).mapInPandas(
        gen, schema=IMAGE_SCHEMA)
