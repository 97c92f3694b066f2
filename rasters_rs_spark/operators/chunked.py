"""Chunked-image representation: the reference's padded-strip chunk
model (src/chunking.rs) as a DataFrame.

For rasters too large to hold one-per-row, images explode into
full-width padded strips keyed by (image_id, chunk_idx). This is the
distributed form of the reference's physical plan: each chunk row is a
Spark partition-level work unit (P1/P2), and the alignment diff (J1)
becomes a chunk-granular equi-join — each A-chunk row joins the B rows
whose windows it needs, computed from the plan at plan time (the manual
dynamic-partition-pruning analogue described in SURVEY.md section 4).

Memory note: chunk rows duplicate the padding region only (rows
load_start..data_start and data_end..load_end), so the blow-up over the
source bytes is (2*padding / data_height), typically a few percent.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import codecs, geom
from ..plans.chunking import ChunkPlan
from .stats import merge_partials_exprs, with_derived_stats

CHUNK_SCHEMA = (
    "image_id string, chunk_idx int, data_start long, data_end long, "
    "load_start long, load_end long, bytes binary, w int, h int, "
    "fmt string, gt array<double>, crs string, no_val double"
)


def _slice_strip_bytes(data: bytes, ls: int, le: int, w: int,
                       fmt: str) -> bytes:
    """Row-range slice of an encoded block WITHOUT decode/re-encode.
    Critical for q16: re-encoding a strip would re-quantize it onto a
    strip-local min/max grid, so decoded strip values would differ from
    the whole-image decode by up to one quantization step — slicing the
    stored codes (and keeping the image-global header) is byte-exact."""
    if fmt == "raw":
        return data[ls * w * 8: le * w * 8]
    if fmt == "q16":
        return data[:16] + data[16 + ls * w * 2: 16 + le * w * 2]
    raise ValueError(f"unknown block format: {fmt}")


def chunk_images(images: DataFrame, min_data_size: int = 0x10000,
                 padding: int = 0, block_size: int = 1) -> DataFrame:
    """Explode an image table into padded chunk-strip rows. Strip bytes
    are row-slices of the stored encoding (no decode/re-encode — q16
    strips keep the image-global quantization grid, so chunked readers
    see bit-identical values); `h` stays the FULL image height (strip
    row range is load_start..load_end)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                plan = (ChunkPlan(row.w, row.h)
                        .add_block_size(block_size)
                        .with_min_data_size(min_data_size)
                        .with_padding(padding))
                for (i, ds, de, ls, le) in plan.chunks():
                    out.append((row.image_id, i, ds, de, ls, le,
                                _slice_strip_bytes(row.bytes, ls, le,
                                                   row.w, row.fmt),
                                row.w, row.h, row.fmt, list(row.gt),
                                row.crs, row.no_val))
            yield pd.DataFrame(out, columns=[
                "image_id", "chunk_idx", "data_start", "data_end",
                "load_start", "load_end", "bytes", "w", "h", "fmt",
                "gt", "crs", "no_val"])

    return images.mapInPandas(gen, schema=CHUNK_SCHEMA)


#: Largest single image assemble_images will stitch inside one task.
MAX_ASSEMBLE_BYTES = 1 << 30


def assemble_images(chunks: DataFrame,
                    max_image_bytes: int = MAX_ASSEMBLE_BYTES) -> DataFrame:
    """Inverse of chunk_images: groupBy image, stitch data ranges back
    into one block (padding rows are redundant and dropped). REFUSES an
    image whose stitched bytes exceed ``max_image_bytes`` — a raster
    chunked because it doesn't fit task memory must not be silently
    re-stitched into one task; keep operating on the chunk rows (every
    chunked operator consumes them directly), or raise the bound
    explicitly for a known-small assembly.

    Stitches the STORED row bytes (the _slice_strip_bytes inverse) —
    never decode/re-encode: a q16 re-encode would re-quantize onto a
    recomputed min/max grid, and even a same-grid decode->encode round
    trip can drift codes by one step (floor of a ~1-ulp-under-integer
    ratio), so chunk_images -> assemble_images is byte-identical to the
    input image, and rows never covered by a data range (the clamped
    borders under padding > 0) come out as NaN (q16 code 0)."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_idx")
        first = pdf.iloc[0]
        h, w = int(first["h"]), int(first["w"])
        fmt = first["fmt"]
        if h * w * 8 > max_image_bytes:
            raise ValueError(
                f"assemble_images: image {first['image_id']} is "
                f"{w}x{h} ({h * w * 8 >> 20} MiB stitched) — over "
                f"max_image_bytes={max_image_bytes}. Operate on the "
                f"chunk rows instead, or raise the bound explicitly.")
        if fmt == "raw":
            head, row_nb = 0, w * 8
            nan_row = np.full(w, np.nan).tobytes()
            header = b""
        elif fmt == "q16":
            head, row_nb = 16, w * 2
            nan_row = b"\x00" * row_nb
            header = bytes(first["bytes"])[:16]
        else:
            raise ValueError(f"assemble_images: unknown chunk format {fmt}")
        rows = [nan_row] * h
        for row in pdf.itertuples(index=False):
            data = bytes(row.bytes)
            ds, de, ls = (int(row.data_start), int(row.data_end),
                          int(row.load_start))
            for r in range(ds, de):
                off = head + (r - ls) * row_nb
                rows[r] = data[off: off + row_nb]
        return pd.DataFrame([{
            "image_id": first["image_id"],
            "bytes": header + b"".join(rows),
            "w": w, "h": h, "fmt": fmt, "gt": list(first["gt"]),
            "crs": first["crs"], "no_val": float(first["no_val"]),
        }])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double")
    return chunks.groupBy("image_id").applyInPandas(
        lambda key, pdf: assemble(pdf), schema=schema)


def diff_stats_chunked(a_chunks: DataFrame, b: DataFrame,
                       pair_col: str = "image_id", adjust: float = 0.0,
                       negate: bool = False,
                       per_pair: bool = False) -> DataFrame:
    """Chunk-granular alignment diff (J1, distributed form): every
    A-chunk row processes independently against its pair's B image; the
    partial-stat rows merge in one aggregation. With A chunked, the
    parallelism unit is the chunk, not the image — the path for rasters
    whose full block exceeds task memory. For huge-B-side pairs use
    ``diff_stats_chunked_both`` (both sides chunked, windowed B reads
    like raster-diff/diff.rs:38-57)."""
    bb = b.select(
        F.col(pair_col).alias("pair_id"),
        *[F.col(c).alias(f"b_{c}") for c in b.columns if c != pair_col],
    )
    aa = a_chunks.withColumnRenamed(pair_col, "pair_id")
    pairs = aa.join(bb, on="pair_id", how="inner")

    from .diff import DIFF_PARTIAL_SCHEMA, _acc, _empty_partial

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                strip = codecs.decode_block(
                    row.bytes, row.load_end - row.load_start, row.w, row.fmt)
                # aggregate over DATA rows only: padding rows are loaded
                # context shared with adjacent chunks and must not be
                # double-counted (mirrors chunked_pixel_stats)
                ds = int(row.data_start)
                data = strip[ds - int(row.load_start):
                             int(row.data_end) - int(row.load_start)]
                block_b = codecs.decode_block(row.b_bytes, row.b_h, row.b_w, row.b_fmt)
                t = geom.transform_between(row.gt, row.b_gt)
                h_b, w_b = block_b.shape
                rows_n = data.shape[0]
                win_b = geom.transform_window(((0, ds), (row.w, rows_n)),
                                              t, (w_b, h_b))
                (bx, by), (bw, bh) = win_b
                sub_b = block_b[by:by + bh, bx:bx + bw]
                vals = _empty_partial()
                if data.size and sub_b.size:
                    ct = geom.chunk_transform(t, (0.5, ds + 0.5),
                                              (float(bx), float(by)))
                    valid, i2, j2 = geom.index_transform_grid(
                        ct, rows_n, row.w, (bw, bh))
                    mask = valid & ~np.isnan(data)
                    if not np.isnan(row.no_val):
                        mask &= data != row.no_val
                    if mask.any():
                        ii, jj = np.nonzero(mask)
                        vb = sub_b[i2[ii, jj], j2[ii, jj]]
                        ok = ~np.isnan(vb)
                        if not np.isnan(row.b_no_val):
                            ok &= vb != row.b_no_val
                        va = data[ii[ok], jj[ok]]
                        vb = vb[ok]
                        d = vb - va + adjust
                        if negate:
                            d = -d
                        vals["count"] = float(va.size)
                        _acc(vals, "first", va)
                        _acc(vals, "second", vb)
                        _acc(vals, "diff", d)
                        _acc(vals, "abs_diff", np.abs(d))
                out.append({"pair_id": row.pair_id, **vals})
            cols = [c.split(" ")[0] for c in DIFF_PARTIAL_SCHEMA.split(", ")]
            yield pd.DataFrame(out, columns=cols)

    from .diff import diff_merge_exprs
    partials = pairs.mapInPandas(gen, schema=DIFF_PARTIAL_SCHEMA)
    out = (partials.groupBy("pair_id").agg(*diff_merge_exprs()) if per_pair
           else partials.agg(*diff_merge_exprs()))
    return out \
        .withColumn("diff_mean", F.col("diff_sum") / F.col("count")) \
        .withColumn("diff_std", F.sqrt(F.col("diff_sum_2") / F.col("count")))


def diff_stats_chunked_both(a_chunks: DataFrame, b_chunks: DataFrame,
                            pair_col: str = "image_id",
                            per_pair: bool = False) -> DataFrame:
    """Alignment diff with BOTH sides chunked — the huge-A x huge-B
    path, mirroring the reference's windowed B reads per A chunk
    (raster-diff/diff.rs:38-57) in join form.

    Plan: the B row range each A chunk needs is a plan-time expression
    of the two geo-transforms (north-aligned rasters: row mapping is
    monotonic in y), so the join is pair-key equi + a range-overlap
    predicate on B's data rows with a +/-1 safety margin. Each A pixel's
    mapped B row lands in exactly one B chunk's half-open data range,
    so no pair is double-counted. Exactly equal to the whole-image
    diff (tested).

    B chunks are lookup storage, so chunk B with padding=0 (data ranges
    then tile the full height). Padded B chunks follow the reference's
    processed-range clamp: the first/last `padding` rows are context
    only and lookups there are dropped."""
    bb = b_chunks.select(
        F.col(pair_col).alias("pair_id"),
        *[F.col(c).alias(f"b_{c}") for c in b_chunks.columns if c != pair_col],
    )
    aa = a_chunks.withColumnRenamed(pair_col, "pair_id")
    # B fractional row of the first/last A data-row center (plan-time
    # expression over the gt metadata columns; gt[2] == gt[4] == 0 per
    # the reference's north-aligned gate)
    fa = (F.col("gt")[3] + (F.col("data_start") + 0.5) * F.col("gt")[5]
          - F.col("b_gt")[3]) / F.col("b_gt")[5]
    fb = (F.col("gt")[3] + (F.col("data_end") - 0.5) * F.col("gt")[5]
          - F.col("b_gt")[3]) / F.col("b_gt")[5]
    overlap = ((F.col("b_data_start") <= F.greatest(fa, fb) + 1) &
               (F.col("b_data_end") >= F.least(fa, fb) - 1))
    pairs = aa.join(bb, on="pair_id", how="inner").where(overlap)

    from .diff import DIFF_PARTIAL_SCHEMA, _acc, _empty_partial

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                strip = codecs.decode_block(
                    row.bytes, row.load_end - row.load_start, row.w, row.fmt)
                ds = int(row.data_start)
                data = strip[ds - int(row.load_start):
                             int(row.data_end) - int(row.load_start)]
                b_strip = codecs.decode_block(
                    row.b_bytes, row.b_load_end - row.b_load_start,
                    row.b_w, row.b_fmt)
                t = geom.transform_between(row.gt, row.b_gt)
                rows_n = data.shape[0]
                vals = _empty_partial()
                if data.size and b_strip.size:
                    # GLOBAL B indices (same rounding as the whole-image
                    # path), then restrict to this B chunk's data rows
                    ct = geom.chunk_transform(t, (0.5, ds + 0.5), (0.0, 0.0))
                    valid, i2, j2 = geom.index_transform_grid(
                        ct, rows_n, row.w, (row.b_w, row.b_h))
                    bds, bde = int(row.b_data_start), int(row.b_data_end)
                    valid &= (i2 >= bds) & (i2 < bde)
                    mask = valid & ~np.isnan(data)
                    if not np.isnan(row.no_val):
                        mask &= data != row.no_val
                    if mask.any():
                        ii, jj = np.nonzero(mask)
                        bls = int(row.b_load_start)
                        vb = b_strip[i2[ii, jj] - bls, j2[ii, jj]]
                        ok = ~np.isnan(vb)
                        if not np.isnan(row.b_no_val):
                            ok &= vb != row.b_no_val
                        va = data[ii[ok], jj[ok]]
                        vb = vb[ok]
                        d = vb - va
                        vals["count"] = float(va.size)
                        _acc(vals, "first", va)
                        _acc(vals, "second", vb)
                        _acc(vals, "diff", d)
                        _acc(vals, "abs_diff", np.abs(d))
                out.append({"pair_id": row.pair_id, **vals})
            cols = [c.split(" ")[0] for c in DIFF_PARTIAL_SCHEMA.split(", ")]
            yield pd.DataFrame(out, columns=cols)

    from .diff import diff_merge_exprs
    partials = pairs.mapInPandas(gen, schema=DIFF_PARTIAL_SCHEMA)
    out = (partials.groupBy("pair_id").agg(*diff_merge_exprs()) if per_pair
           else partials.agg(*diff_merge_exprs()))
    return out \
        .withColumn("diff_mean", F.col("diff_sum") / F.col("count")) \
        .withColumn("diff_std", F.sqrt(F.col("diff_sum_2") / F.col("count")))


def diff_histogram_chunked(a_chunks: DataFrame, b: DataFrame,
                           hmin: float, hmax: float, bins: int,
                           pair_col: str = "image_id",
                           adjust: float = 0.0,
                           negate: bool = False) -> DataFrame:
    """Histogram of diff values with the A side chunked: per-strip bin
    counts (data rows only), additively merged — bin counts equal the
    whole-image diff_histogram exactly (counts are integers; the merge
    is exact). Reference shape: raster-diff bins per chunk inside the
    rayon fold and merges histograms (main.rs:108-156)."""
    bb = b.select(
        F.col(pair_col).alias("pair_id"),
        *[F.col(c).alias(f"b_{c}") for c in b.columns if c != pair_col],
    )
    aa = a_chunks.withColumnRenamed(pair_col, "pair_id")
    pairs = aa.join(bb, on="pair_id", how="inner")
    step = (hmax - hmin) / bins

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict[int, int] = {}
            for row in pdf.itertuples(index=False):
                strip = codecs.decode_block(
                    row.bytes, row.load_end - row.load_start, row.w, row.fmt)
                ds = int(row.data_start)
                data = strip[ds - int(row.load_start):
                             int(row.data_end) - int(row.load_start)]
                block_b = codecs.decode_block(row.b_bytes, row.b_h, row.b_w,
                                              row.b_fmt)
                t = geom.transform_between(row.gt, row.b_gt)
                h_b, w_b = block_b.shape
                rows_n = data.shape[0]
                (bx, by), (bw, bh) = geom.transform_window(
                    ((0, ds), (row.w, rows_n)), t, (w_b, h_b))
                sub_b = block_b[by:by + bh, bx:bx + bw]
                if not (data.size and sub_b.size):
                    continue
                ct = geom.chunk_transform(t, (0.5, ds + 0.5),
                                          (float(bx), float(by)))
                valid, i2, j2 = geom.index_transform_grid(
                    ct, rows_n, row.w, (bw, bh))
                mask = valid & ~np.isnan(data)
                if not np.isnan(row.no_val):
                    mask &= data != row.no_val
                if not mask.any():
                    continue
                ii, jj = np.nonzero(mask)
                vb = sub_b[i2[ii, jj], j2[ii, jj]]
                ok = ~np.isnan(vb)
                if not np.isnan(row.b_no_val):
                    ok &= vb != row.b_no_val
                d = vb[ok] - data[ii[ok], jj[ok]] + adjust
                if negate:
                    d = -d
                bn = np.floor((d - hmin) / step).astype(np.int64)
                bn = np.where(d >= hmax, bins,
                              np.where(d < hmin, -1, np.minimum(bn, bins)))
                idx, cnt = np.unique(bn, return_counts=True)
                for i, c in zip(idx, cnt):
                    acc[int(i)] = acc.get(int(i), 0) + int(c)
            yield pd.DataFrame({"bin": list(acc.keys()),
                                "n": list(acc.values())})

    partials = pairs.mapInPandas(gen, schema="bin long, n long")
    return partials.groupBy("bin").agg(F.sum("n").alias("n")).orderBy("bin")


def chunked_zonal_stats(chunks: DataFrame, aois: pd.DataFrame) -> DataFrame:
    """Zonal statistics over the chunked representation — the
    reference's actual execution shape (raster-stats folds per chunk,
    main.rs:50-93): each strip contributes partial per-AOI stats from
    its DATA rows only, one groupBy merges. Equals the whole-image
    zonal_stats exactly (tested); the path for rasters whose full block
    exceeds task memory."""
    from .stats import ZONAL_PARTIAL_SCHEMA, _packed_aoi_rows
    aoi_rows = _packed_aoi_rows(aois)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id", "aoi_id", "count", "min", "max", "sum", "sum_2"]
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.extend(_strip_zonal_partials(row, aoi_rows))
            yield pd.DataFrame(out, columns=cols)

    partials = chunks.mapInPandas(gen, schema=ZONAL_PARTIAL_SCHEMA)
    return with_derived_stats(
        partials.groupBy("aoi_id").agg(*merge_partials_exprs()))


def _strip_zonal_partials(row, aoi_rows) -> list:
    """Per-(strip, aoi) PixelStats partial tuples for ONE chunk-strip
    row against (aoi_id, ring_offsets, xs, ys, bbox) buffers — shared
    by chunked_zonal_stats (broadcast AOIs) and
    chunked_zonal_stats_dist (cell-join-pruned subsets)."""
    out = []
    strip = codecs.decode_block(
        row.bytes, row.load_end - row.load_start, row.w, row.fmt)
    ds = int(row.data_start)
    data = strip[ds - int(row.load_start):
                 int(row.data_end) - int(row.load_start)]
    valid = ~np.isnan(data)
    if not np.isnan(row.no_val):
        valid &= data != row.no_val
    if not valid.any():
        return out
    ii, jj = np.nonzero(valid)
    vals = data[ii, jj]
    t = geom.transform_from_gdal(row.gt)
    # pixel centers in world coords: strip rows are global
    # rows ds..data_end, so shift i by the data offset
    wx, wy = geom.transform_points(t, jj + 0.5, ii + ds + 0.5)
    # half-pixel padding: 1-row strips (common with default
    # chunk sizing on wide rasters) have a DEGENERATE
    # pixel-center bbox and the strict bounds_intersect
    # would silently skip every AOI for them
    hpx = abs(float(row.gt[1])) / 2.0
    hpy = abs(float(row.gt[5])) / 2.0
    box = (wx.min() - hpx, wy.min() - hpy,
           wx.max() + hpx, wy.max() + hpy)
    for (aoi_id, ro, xs, ys, abox) in aoi_rows:
        if geom.bounds_intersect(box, abox) is None:
            continue
        cand = ((wx >= abox[0]) & (wx <= abox[2])
                & (wy >= abox[1]) & (wy <= abox[3]))
        if not cand.any():
            continue
        ci = np.nonzero(cand)[0]
        inside = np.zeros(len(wx), dtype=bool)
        inside[ci] = geom.points_in_rings(
            wx[ci], wy[ci], ro, xs, ys)
        if not inside.any():
            continue
        v = vals[inside]
        out.append((row.image_id, aoi_id, float(v.size),
                    float(v.min()), float(v.max()),
                    float(v.sum()), float((v * v).sum())))
    return out


def chunked_zonal_stats_dist(chunks: DataFrame, aois: DataFrame,
                             zoom: int = 12) -> DataFrame:
    """The BOTH-sides-huge zonal join: raster as chunk strips (no task
    decodes a whole image) x a distributed AOI catalog (nothing
    driver-side). Strip data-row bboxes become covering cells (pure
    Catalyst over gt/w/data range), equi-join aoi_cells_dist, distinct
    (strip, part) candidates, cogroup back with the chunk rows, then
    the SAME per-strip kernel as chunked_zonal_stats over each strip's
    pruned AOI subset. Identical results to zonal_stats /
    chunked_zonal_stats (tested)."""
    from ..functions.mercator import MAX_COORD
    from .celljoin import aoi_cells_dist
    from .stats import ZONAL_PARTIAL_SCHEMA, _packed_aoi_rows

    ts = 2.0 * MAX_COORD / float(1 << zoom)
    g = [F.col("gt")[i] for i in range(6)]
    w = F.col("w").cast("double")
    dsd = F.col("data_start").cast("double")
    ded = F.col("data_end").cast("double")
    zero = F.lit(0.0)
    corners = [(zero, dsd), (w, dsd), (zero, ded), (w, ded)]
    cxs = [g[0] + j * g[1] + i * g[2] for (j, i) in corners]
    cys = [g[3] + j * g[4] + i * g[5] for (j, i) in corners]
    hx = (F.abs(g[1]) + F.abs(g[2])) / 2.0
    hy = (F.abs(g[4]) + F.abs(g[5])) / 2.0
    b = chunks.select(
        "image_id", "chunk_idx",
        F.floor((F.least(*cxs) - hx + F.lit(MAX_COORD)) / F.lit(ts))
         .cast("long").alias("_x0"),
        F.floor((F.greatest(*cxs) + hx + F.lit(MAX_COORD)) / F.lit(ts))
         .cast("long").alias("_x1"),
        F.floor((F.least(*cys) - hy + F.lit(MAX_COORD)) / F.lit(ts))
         .cast("long").alias("_y0"),
        F.floor((F.greatest(*cys) + hy + F.lit(MAX_COORD)) / F.lit(ts))
         .cast("long").alias("_y1"))
    b = b.withColumn("_cx", F.explode(F.sequence("_x0", "_x1")))
    b = b.withColumn("_cy", F.explode(F.sequence("_y0", "_y1")))
    scells = b.select(
        "image_id", "chunk_idx",
        (F.shiftleft(F.col("_cx"), 32) + F.col("_cy")).alias("cell"))

    acells = aoi_cells_dist(aois, zoom)
    # aliases: the candidate side derives from `chunks` (ambiguous
    # self-join on the cogroup keys otherwise)
    cand = (scells.join(acells, on="cell")
            .dropDuplicates(["image_id", "chunk_idx", "part"])
            .select(F.col("image_id").alias("_img"),
                    F.col("chunk_idx").alias("_ci"),
                    "aoi_id", "ring_offsets", "xs", "ys"))

    def kernel(strip_pdf: pd.DataFrame, aoi_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["image_id", "aoi_id", "count", "min", "max", "sum", "sum_2"]
        aoi_rows = _packed_aoi_rows(aoi_pdf.sort_values("aoi_id"))
        out = []
        for row in strip_pdf.itertuples(index=False):
            out.extend(_strip_zonal_partials(row, aoi_rows))
        return pd.DataFrame(out, columns=cols)

    partials = chunks.groupBy("image_id", "chunk_idx").cogroup(
        cand.groupBy("_img", "_ci")) \
        .applyInPandas(lambda key, a, c: kernel(a, c),
                       schema=ZONAL_PARTIAL_SCHEMA)
    return with_derived_stats(
        partials.groupBy("aoi_id").agg(*merge_partials_exprs()))


def chunked_pixel_stats(chunks: DataFrame) -> DataFrame:
    """PixelStats over the chunked representation: each strip
    contributes only its DATA rows (padding excluded), so totals equal
    the whole-image statistics exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .stats import _block_partial
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                strip = codecs.decode_block(
                    row.bytes, row.load_end - row.load_start, row.w, row.fmt)
                ds = int(row.data_start) - int(row.load_start)
                de = int(row.data_end) - int(row.load_start)
                c, mn, mx, s, s2 = _block_partial(strip[ds:de], row.no_val)
                out.append((row.image_id, c, mn, mx, s, s2))
            yield pd.DataFrame(out, columns=["image_id", "count", "min",
                                             "max", "sum", "sum_2"])

    partials = chunks.mapInPandas(
        gen, schema="image_id string, count double, min double, max double, "
                    "sum double, sum_2 double")
    return with_derived_stats(
        partials.groupBy("image_id").agg(*merge_partials_exprs()))


def chunked_zonal_majority(chunks: DataFrame, aois: pd.DataFrame,
                           n_classes: int = 4) -> DataFrame:
    """zonal_majority over the chunked representation: each strip
    counts its DATA-row pixels per (zone, class) — a pure count
    monoid, so the merged table equals the whole-image operator
    exactly — then the same tiny argmax window. The path for rasters
    whose full block exceeds task memory."""
    from pyspark.sql import Window

    from .stats import _packed_aoi_rows
    from .vectorize import quantize_classes

    aoi_rows = _packed_aoi_rows(aois)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id", "aoi_id", "cls", "count"]
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                strip = codecs.decode_block(
                    row.bytes, row.load_end - row.load_start, row.w,
                    row.fmt)
                ds = int(row.data_start)
                data = strip[ds - int(row.load_start):
                             int(row.data_end) - int(row.load_start)]
                valid = ~np.isnan(data)
                if not np.isnan(row.no_val):
                    valid &= data != row.no_val
                if not valid.any():
                    continue
                ii, jj = np.nonzero(valid)
                vals = data[ii, jj]
                cls = quantize_classes(vals, n_classes)
                t = geom.transform_from_gdal(row.gt)
                wx, wy = geom.transform_points(
                    t, jj + 0.5, ii + ds + 0.5)
                for (aoi_id, ro, xs, ys, box) in aoi_rows:
                    cand = ((wx >= box[0]) & (wx <= box[2])
                            & (wy >= box[1]) & (wy <= box[3]))
                    if not cand.any():
                        continue
                    ci = np.nonzero(cand)[0]
                    inside = ci[geom.points_in_rings(
                        wx[ci], wy[ci], ro, xs, ys)]
                    if len(inside) == 0:
                        continue
                    counts = np.bincount(cls[inside],
                                         minlength=n_classes)
                    for c in np.nonzero(counts)[0]:
                        out.append((row.image_id, aoi_id, int(c),
                                    int(counts[c])))
            yield pd.DataFrame(out, columns=cols)

    partials = chunks.mapInPandas(
        gen, schema=("image_id string, aoi_id string, cls int, "
                     "count long"))
    per_cls = partials.groupBy("aoi_id", "cls") \
                      .agg(F.sum("count").alias("n"))
    w = Window.partitionBy("aoi_id").orderBy(F.col("n").desc(),
                                             F.col("cls").asc())
    tot = Window.partitionBy("aoi_id")
    return (per_cls
            .withColumn("rk", F.row_number().over(w))
            .withColumn("n_total", F.sum("n").over(tot).cast("long"))
            .where(F.col("rk") == 1)
            .select("aoi_id", F.col("cls").alias("majority_cls"),
                    F.col("n").cast("long").alias("n_majority"),
                    "n_total"))
