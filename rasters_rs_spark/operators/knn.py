"""kNN join + no-data interpolation fill (reference raster-fill-nn).

The reference interpolates no-data pixels by Sibson C1 natural-neighbor
over a Delaunay triangulation built once and shared read-only across
threads (raster-fill-nn/main.rs:20,58; triangulation.rs:29-59). A
triangulation stack isn't reproducible here (and the reference itself
documents barycentric interpolation as a fast alternative,
interpolation.rs:36-39); the engine's equivalents are:

- ``knn_join``: cell-bucketed k-ring-expansion kNN — points bucketed by
  grid cell, queries probe an expanding Chebyshev ring until the kth
  neighbor is provably inside the ring, then row_number() <= k.
  Distributed: the candidate step is an equi-join on cell keys.
- ``knn_join_broadcast``: brute-force vectorized variant for small
  point sets (the reference's broadcast triangulation analogue, J6).
- ``fill_idw``: fills holes with inverse-distance weighting of the k
  nearest points. The reference's hole predicate has a quirk
  (`val == f64::NAN` is always false, interpolation.rs:19), so by
  default only `val == no_val` marks holes; pass ``fill_nan=True`` for
  the intended behavior.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions import codecs, geom


def _with_cell(df: DataFrame, x_col: str, y_col: str, cs: float, prefix: str):
    return df.withColumn(f"{prefix}cx", F.floor(F.col(x_col) / F.lit(cs)).cast("long")) \
             .withColumn(f"{prefix}cy", F.floor(F.col(y_col) / F.lit(cs)).cast("long"))


def knn_join(queries: DataFrame, points: DataFrame, k: int, cell_size: float,
             query_id: str = "qid", max_rounds: int = 8,
             fast_path_points: int = 10_000,
             max_annulus_cells: int = 1 << 18) -> DataFrame:
    """Exact kNN join: for each query row, the k nearest points.

    Ring-expansion: round i joins unsatisfied queries against the cell
    ANNULUS not yet probed (Chebyshev radius prev_r+1 .. r, doubling),
    carrying the running top-k from prior rounds, so no cell is joined
    twice. A query is *satisfied* once it has >= k candidates whose kth
    distance is at most its distance to the probed window's edge (a
    per-query bound: any unprobed point lies beyond that edge) — tight
    enough that typical densities finish in ONE round.

    Adaptive plan: when the point side is tiny (<= fast_path_points,
    known from the same stats pass that seeds the ring radius) the
    multi-job ring loop is pure overhead — a single broadcast
    crossJoin + top-k window is both exact and one job. Corpora above
    the threshold take the ring path (the 100 TB plan).

    Returns query columns + (pt_id, x, y, z) of neighbors + dist + rank.
    """
    q = _with_cell(queries, "x", "y", cell_size, "q").withColumnRenamed("x", "qx") \
        .withColumnRenamed("y", "qy")
    p = _with_cell(points, "x", "y", cell_size, "p").persist()

    remaining = q.persist()
    to_unpersist = [p, remaining]
    out = None
    carry = None          # running top-k candidate rows for unsatisfied queries
    # start the expansion where the expected candidate count already
    # covers k: mean density * (2r+1)^2 >= 4k  ->  saves whole rounds
    # (each round is several Spark jobs) when points are sparse
    stats_row = p.groupBy("pcx", "pcy").count().agg(
        F.avg("count").alias("avg"), F.sum("count").alias("n")).collect()[0]
    density = float(stats_row["avg"] or 1.0)
    n_points = int(stats_row["n"] or 0)
    if n_points <= fast_path_points:
        out = _brute_force_rank(remaining, F.broadcast(p), k, query_id) \
            .drop("qcx", "qcy").persist()
        out.count()
        for df in to_unpersist:
            df.unpersist()
        return out
    radius = 1
    while density * (2 * radius + 1) ** 2 < 4 * k and radius < 64:
        radius *= 2
    prev_radius = -1   # first round includes the query's own cell (dist 0)
    cs = float(cell_size)
    exhausted = True
    for round_i in range(max_rounds):
        if round_i > 0 and remaining.isEmpty():
            exhausted = False
            break
        # annulus offsets only: cells at Chebyshev distance prev_r+1..r.
        # The offset list is driver-built and doubles in area per round;
        # once it would exceed max_annulus_cells tuples the remaining
        # (far-from-everything) queries are cheaper to brute-force than
        # to ship millions of probe offsets from the driver
        n_cells = (2 * radius + 1) ** 2 - max(2 * prev_radius + 1, 0) ** 2
        if n_cells > max_annulus_cells:
            break
        offs = [(dx, dy) for dx in range(-radius, radius + 1)
                for dy in range(-radius, radius + 1)
                if max(abs(dx), abs(dy)) > prev_radius]
        offs_df = remaining.sparkSession.createDataFrame(offs, "dx int, dy int")
        probes = remaining.crossJoin(F.broadcast(offs_df)).select(
            "*",
            (F.col("qcx") + F.col("dx")).alias("pcx"),
            (F.col("qcy") + F.col("dy")).alias("pcy"),
        ).drop("dx", "dy")
        cand = probes.join(p, on=["pcx", "pcy"], how="inner") \
                     .withColumn("dist", _dist_expr()).drop("pcx", "pcy")
        if carry is not None:
            cand = cand.unionByName(carry)
        # rank and the satisfied test share one window partitioning: no
        # extra shuffle for the per-query count/kth aggregates
        w = Window.partitionBy(query_id).orderBy("dist", "pt_id")
        wall = Window.partitionBy(query_id)
        # per-query exactness bound: distance from the query point to
        # the edge of the probed window [(qc - r)*cs, (qc + r + 1)*cs).
        # STRICT inequality: an unprobed point can sit exactly ON the
        # open edge at exactly the kth distance and still win the
        # (dist, pt_id) tie-break — <= would wrongly stop probing
        g = F.least(
            F.col("qx") - (F.col("qcx") - radius) * F.lit(cs),
            (F.col("qcx") + radius + 1) * F.lit(cs) - F.col("qx"),
            F.col("qy") - (F.col("qcy") - radius) * F.lit(cs),
            (F.col("qcy") + radius + 1) * F.lit(cs) - F.col("qy"))
        ranked = (cand.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .withColumn("_sat", (F.count("*").over(wall) >= k) &
                              (F.max("dist").over(wall) < g))
                  .persist())
        to_unpersist.append(ranked)
        solved = ranked.where(F.col("_sat")).drop("_sat")
        out = solved if out is None else out.unionByName(solved)
        carry = ranked.where(~F.col("_sat")).drop("_sat", "rank")
        remaining = remaining.join(
            ranked.where(F.col("_sat")).select(query_id).distinct(),
            on=query_id, how="left_anti").persist()
        to_unpersist.append(remaining)
        prev_radius = radius
        radius *= 2
    if out is None:
        out = _brute_force_rank(remaining, p, k, query_id)
    elif exhausted and not remaining.isEmpty():
        out = out.unionByName(_brute_force_rank(remaining, p, k, query_id))
    out = out.drop("qcx", "qcy").persist()
    out.count()  # materialize before releasing the round intermediates
    for df in to_unpersist:
        df.unpersist()
    return out


def _dist_expr():
    """Euclidean distance via explicit multiplication (not pow): the
    same IEEE ops the DuckDB contract oracle writes, so dist values are
    bit-identical across engines."""
    dx = F.col("qx") - F.col("x")
    dy = F.col("qy") - F.col("y")
    return F.sqrt(dx * dx + dy * dy)


def _brute_force_rank(remaining: DataFrame, p: DataFrame, k: int, query_id: str):
    """Fallback for queries the bounded ring expansion never satisfied
    (sparse far-away points): a full cross join, still exact."""
    cand = remaining.crossJoin(p.drop("pcx", "pcy"))
    cand = cand.withColumn("dist", _dist_expr())
    w = Window.partitionBy(query_id).orderBy("dist", "pt_id")
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_join_broadcast(queries: DataFrame, points: pd.DataFrame, k: int,
                       query_id: str = "qid") -> DataFrame:
    """Brute-force kNN against a broadcast pandas point table (exact;
    for point sets that fit in task memory, like the reference's shared
    triangulation)."""
    px = points["x"].to_numpy()
    py = points["y"].to_numpy()
    pid = points["pt_id"].to_numpy()
    pz = points["z"].to_numpy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0 or len(px) == 0:
                continue
            qx = pdf["x"].to_numpy()
            qy = pdf["y"].to_numpy()
            d = np.sqrt((qx[:, None] - px[None, :]) ** 2 +
                        (qy[:, None] - py[None, :]) ** 2)
            kk = min(k, d.shape[1])
            # stable full sort: distance ties break by POSITIONAL index
            # (argpartition's arbitrary tie selection would diverge
            # from knn_join's (dist, pt_id) ordering at the k boundary)
            order_all = np.argsort(d, axis=1, kind="stable")[:, :kk]
            rows = []
            for qi in range(len(pdf)):
                for rank, pj in enumerate(order_all[qi], start=1):
                    rows.append((pdf[query_id].iloc[qi], str(pid[pj]),
                                 float(d[qi, pj]), float(pz[pj]), rank))
            yield pd.DataFrame(rows, columns=[query_id, "pt_id", "dist", "z", "rank"])

    return queries.mapInPandas(
        gen, schema=f"{query_id} string, pt_id string, dist double, z double, rank int")


def idw(values: np.ndarray, dists: np.ndarray, power: float = 2.0) -> np.ndarray:
    """Inverse-distance weighting along the last axis; an exact hit
    (dist == 0) returns that value. For the default power the weight is
    computed as 1/(d*d) — the same IEEE ops the SQL oracle writes."""
    if dists.shape[-1] == 0:
        raise ValueError("idw needs at least one neighbor per sample")
    with np.errstate(divide="ignore"):
        w = 1.0 / (dists * dists) if power == 2.0 else 1.0 / np.power(dists, power)
    # an INF weight means d**power underflowed to 0 for a tiny nonzero
    # distance — treat it as an exact hit too, otherwise zeroing the
    # weight would hand the estimate to FAR points (or produce 0/0)
    exact = (dists == 0.0) | np.isinf(w)
    has_exact = exact.any(axis=-1)
    w = np.where(np.isinf(w), 0.0, w)
    # strict left-fold in the given neighbor order: bit-reproducible,
    # mirrored by the SQL oracle's ordered list_reduce
    num = w[..., 0] * values[..., 0]
    den = w[..., 0].copy()
    for c in range(1, w.shape[-1]):
        num = num + w[..., c] * values[..., c]
        den = den + w[..., c]
    with np.errstate(invalid="ignore"):   # 0/0 rows are exact-hit rows,
        est = num / den                    # overridden just below
    if has_exact.any():
        first_exact = np.argmax(exact, axis=-1)
        est = np.where(has_exact, np.take_along_axis(
            values, first_exact[..., None], axis=-1)[..., 0], est)
    return est


def fill_idw(images: DataFrame, points: pd.DataFrame, k: int = 8,
             power: float = 2.0, fill_nan: bool = False) -> DataFrame:
    """Fill hole pixels by IDW over the k nearest broadcast points.

    Hole predicate defaults to the reference's literal behavior
    (val == no_val only; interpolation.rs:19's NaN test never fires).
    Emits filled image rows plus a ``filled`` count column (A11)."""
    px = points["x"].to_numpy()
    py = points["y"].to_numpy()
    pz = points["z"].to_numpy()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_block(row.bytes, row.h, row.w, row.fmt)
                holes = block == row.no_val
                if fill_nan:
                    holes |= np.isnan(block)
                n = int(holes.sum())
                if n and len(px) == 0:
                    n = 0          # nothing to interpolate from
                data = row.bytes
                if n:
                    ii, jj = np.nonzero(holes)
                    t = geom.transform_from_gdal(row.gt)
                    wx, wy = geom.transform_points(t, jj + 0.5, ii + 0.5)
                    ddx = wx[:, None] - px[None, :]
                    ddy = wy[:, None] - py[None, :]
                    d = np.sqrt(ddx * ddx + ddy * ddy)
                    kk = min(k, d.shape[1])
                    # stable full sort: the k-set AND its accumulation
                    # order are (dist, positional idx) ascending — the
                    # exact ordering knn_join's (dist, pt_id) rank and
                    # the SQL oracle's ranked fold use (argpartition
                    # would pick an arbitrary member of a tie at the
                    # k boundary)
                    idx = np.argsort(d, axis=1, kind="stable")[:, :kk]
                    dk = np.take_along_axis(d, idx, axis=1)
                    vk = pz[idx]
                    data = codecs.patch_block_bytes(
                        row.bytes, ii, jj, idw(vk, dk, power),
                        row.h, row.w, row.fmt)
                out.append((row.image_id, data,
                            row.w, row.h, row.fmt, list(row.gt), row.crs,
                            row.no_val, n))
            yield pd.DataFrame(out, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt", "crs",
                "no_val", "filled"])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double, filled long")
    return images.mapInPandas(gen, schema=schema)


def hole_pixels_chunked(chunks: DataFrame, fill_nan: bool = False) -> DataFrame:
    """hole_pixels over the chunked-strip representation
    (chunked.CHUNK_SCHEMA): each strip row emits ONLY its data-range
    holes (padding rows belong to their owner strip) with GLOBAL pixel
    indices, so world coordinates come straight from the image's gt.
    The unit of decode is the strip — the path for rasters whose full
    block exceeds task memory."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ls, le = int(row.load_start), int(row.load_end)
                ds, de = int(row.data_start), int(row.data_end)
                strip = codecs.decode_block(row.bytes, le - ls, row.w,
                                            row.fmt)
                data = strip[ds - ls:de - ls]
                holes = data == row.no_val
                if fill_nan:
                    holes |= np.isnan(data)
                if not holes.any():
                    continue
                ii, jj = np.nonzero(holes)
                gi = ii + ds                      # global pixel rows
                t = geom.transform_from_gdal(row.gt)
                wx, wy = geom.transform_points(t, jj + 0.5, gi + 0.5)
                out.append(pd.DataFrame({
                    "image_id": row.image_id,
                    "chunk_idx": int(row.chunk_idx),
                    "pi": gi, "pj": jj, "x": wx, "y": wy}))
            yield (pd.concat(out) if out else pd.DataFrame(
                columns=["image_id", "chunk_idx", "pi", "pj", "x", "y"]))

    return chunks.mapInPandas(
        gen, schema="image_id string, chunk_idx int, pi long, pj long, "
                    "x double, y double")


def fill_idw_distributed_chunked(chunks: DataFrame, points: DataFrame,
                                 k: int = 8, power: float = 2.0,
                                 fill_nan: bool = False,
                                 cell_size: float = 256.0,
                                 fast_path_points: int = 10_000) -> DataFrame:
    """The fully scaled fill: BOTH sides distributed — the raster as
    chunk strips (chunked.CHUNK_SCHEMA; no task ever decodes a whole
    image) and the points as a cell-bucketed table (no broadcast above
    fast_path_points). Composes hole_pixels_chunked -> knn_join ->
    per-STRIP cogroup patching; returns patched chunk rows (same
    schema), assemble with chunked.assemble_images if the final image
    fits a task. Output is BYTE-identical to fill_idw /
    fill_idw_distributed for raw AND q16 (same strict-fold IDW kernel
    and tie-breaks; filled codes are patched into the stored strip
    bytes on the image-global q16 grid, never a strip-local
    re-quantize): holes fall in exactly one strip's data range, and
    padding rows are re-duplicated from the patched data by the
    caller's assembly."""
    q = hole_pixels_chunked(chunks, fill_nan).withColumn(
        "qid", F.concat_ws(":", "image_id", "pi", "pj"))
    nn = knn_join(q, points, k=k, cell_size=cell_size, query_id="qid",
                  fast_path_points=fast_path_points) \
        .select("image_id", "chunk_idx", "pi", "pj", "pt_id", "dist", "z")

    from .chunked import CHUNK_SCHEMA

    def patch(chunk_pdf: pd.DataFrame, nn_pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        nn_sorted = (nn_pdf.sort_values(["pi", "pj", "dist", "pt_id"])
                     if len(nn_pdf) else nn_pdf)
        for row in chunk_pdf.itertuples(index=False):
            ls, le = int(row.load_start), int(row.load_end)
            ds, de = int(row.data_start), int(row.data_end)
            data = row.bytes
            if len(nn_sorted):
                # invariant: hole_pixels_chunked only emits data-range
                # holes and the cogroup key is (image_id, chunk_idx),
                # so every neighbor row belongs to THIS strip's data rows
                g = nn_sorted
                counts = g.groupby(["pi", "pj"], sort=True).size()
                kk = int(counts.iloc[0])
                assert (counts == kk).all(), "ragged kNN result"
                gi = counts.index.get_level_values(0).to_numpy()
                assert ((gi >= ds) & (gi < de)).all(), \
                    "neighbor rows outside the strip's data range"
                jj = counts.index.get_level_values(1).to_numpy()
                dk = g["dist"].to_numpy().reshape(len(counts), kk)
                vk = g["z"].to_numpy().reshape(len(counts), kk)
                # patch codes into the stored strip bytes: unfilled
                # pixels stay byte-identical and q16 fills land on the
                # image-global grid (never a strip-local re-quantize)
                data = codecs.patch_block_bytes(
                    row.bytes, gi - ls, jj, idw(vk, dk, power),
                    le - ls, row.w, row.fmt)
            out.append((row.image_id, int(row.chunk_idx), ds, de, ls, le,
                        data, row.w, row.h,
                        row.fmt, list(row.gt), row.crs, row.no_val))
        return pd.DataFrame(out, columns=[
            "image_id", "chunk_idx", "data_start", "data_end",
            "load_start", "load_end", "bytes", "w", "h", "fmt", "gt",
            "crs", "no_val"])

    return chunks.groupBy("image_id", "chunk_idx").cogroup(
        nn.groupBy("image_id", "chunk_idx")) \
        .applyInPandas(lambda key, a, b: patch(a, b), schema=CHUNK_SCHEMA)


def hole_pixels(images: DataFrame, fill_nan: bool = False) -> DataFrame:
    """Explode each image's hole pixels (val == no_val, optionally NaN)
    into point rows (image_id, pi, pj, x, y) with world coordinates at
    the pixel center — the query side of the distributed fill."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_block(row.bytes, row.h, row.w, row.fmt)
                holes = block == row.no_val
                if fill_nan:
                    holes |= np.isnan(block)
                if not holes.any():
                    continue
                ii, jj = np.nonzero(holes)
                t = geom.transform_from_gdal(row.gt)
                wx, wy = geom.transform_points(t, jj + 0.5, ii + 0.5)
                out.append(pd.DataFrame({
                    "image_id": row.image_id, "pi": ii, "pj": jj,
                    "x": wx, "y": wy}))
            yield (pd.concat(out) if out else pd.DataFrame(
                columns=["image_id", "pi", "pj", "x", "y"]))

    return images.mapInPandas(
        gen, schema="image_id string, pi long, pj long, x double, y double")


def fill_idw_distributed(images: DataFrame, points: DataFrame, k: int = 8,
                         power: float = 2.0, fill_nan: bool = False,
                         cell_size: float = 256.0,
                         fast_path_points: int = 10_000) -> DataFrame:
    """fill_idw for point tables too large to broadcast: composes the
    engine's own operators instead of shipping the whole point set into
    every task (the round-2 gap — fill_idw's numpy closure is the
    reference's shared-triangulation analogue and caps at task memory).

    Shape: explode hole pixels (hole_pixels) -> distributed cell-
    bucketed knn_join (the candidate step is an equi-join on cell keys;
    no broadcast of the point side when it exceeds fast_path_points) ->
    per-image reassembly that applies the SAME strict-fold IDW kernel.
    Exactly equal to fill_idw when the points' pt_id string order
    matches their positional order (zero-padded ids, e.g.
    synth.points_table), because knn_join tie-breaks by (dist, pt_id)
    and fill_idw by (dist, positional index).

    ``points``: DataFrame with (pt_id string, x, y, z). Returns the
    fill_idw schema (filled image rows + per-image filled count)."""
    # knn_join partitions by a single query-id column: derive one
    q = hole_pixels(images, fill_nan).withColumn(
        "qid", F.concat_ws(":", "image_id", "pi", "pj"))
    nn = knn_join(q, points, k=k, cell_size=cell_size, query_id="qid",
                  fast_path_points=fast_path_points) \
        .select("image_id", "pi", "pj", "pt_id", "dist", "z")

    out_schema = ("image_id string, bytes binary, w int, h int, fmt string, "
                  "gt array<double>, crs string, no_val double, filled long")

    def patch(img_pdf: pd.DataFrame, nn_pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        nn_by_img = (nn_pdf.sort_values(["pi", "pj", "dist", "pt_id"])
                     if len(nn_pdf) else nn_pdf)
        for row in img_pdf.itertuples(index=False):
            n = 0
            data = row.bytes
            if len(nn_by_img):
                g = nn_by_img[nn_by_img["image_id"] == row.image_id]
                if len(g):
                    # every hole has the same neighbor count (min(k, N))
                    counts = g.groupby(["pi", "pj"], sort=True).size()
                    kk = int(counts.iloc[0])
                    assert (counts == kk).all(), "ragged kNN result"
                    n = len(counts)
                    ii = counts.index.get_level_values(0).to_numpy()
                    jj = counts.index.get_level_values(1).to_numpy()
                    dk = g["dist"].to_numpy().reshape(n, kk)
                    vk = g["z"].to_numpy().reshape(n, kk)
                    data = codecs.patch_block_bytes(
                        row.bytes, ii, jj, idw(vk, dk, power),
                        row.h, row.w, row.fmt)
            out.append((row.image_id, data,
                        row.w, row.h, row.fmt, list(row.gt), row.crs,
                        row.no_val, n))
        return pd.DataFrame(out, columns=[
            "image_id", "bytes", "w", "h", "fmt", "gt", "crs",
            "no_val", "filled"])

    return images.groupBy("image_id").cogroup(nn.groupBy("image_id")) \
        .applyInPandas(lambda ik, a, b: patch(a, b), schema=out_schema)


# ---------------------------------------------------------------------------
# Barycentric (linear natural-neighbor) fill — the reference's own
# documented alternative to Sibson C1 interpolation
# ---------------------------------------------------------------------------


def grid_triangles(nx: int, ny: int) -> np.ndarray:
    """Triangle index table of a regular nx x ny point grid (row-major
    point index iy*nx + ix): each cell split into a lower (u + v < 1)
    and an upper triangle — which IS the grid's Delaunay triangulation,
    so no triangulation library is needed for gridded point sets. The
    precomputed-table input to fill_barycentric (the analogue of the
    reference's shared Delaunay triangulation that raster-fill-nn
    builds once and shares across chunks)."""
    tris = []
    for iy in range(ny - 1):
        for ix in range(nx - 1):
            p00 = iy * nx + ix
            p10 = p00 + 1
            p01 = p00 + nx
            p11 = p01 + 1
            tris.append((p00, p10, p01))   # lower: u + v < 1
            tris.append((p11, p01, p10))   # upper
    return np.asarray(tris, dtype=np.int64)


def _grid_bucket_pairs(bx0, by0, bx1, by1, qx, qy):
    """Uniform-grid candidate pruning shared by the barycentric and
    Sibson kernels: items with bboxes (bx0..bx1, by0..by1) vs query
    points. Returns (cell_of_query, item_cells, item_ids) where
    item_cells/item_ids list every (cell, item) overlap pair sorted by
    cell then item index — so per-cell candidate lists preserve the
    global item order (first-match semantics stay bit-identical to
    the unbucketed loop). Grid cell count ~ n_items so the expected
    candidates per cell is O(1) for well-shaped triangulations."""
    n = bx0.size
    gx0 = min(float(np.min(qx)), float(np.min(bx0)))
    gy0 = min(float(np.min(qy)), float(np.min(by0)))
    gx1 = max(float(np.max(qx)), float(np.max(bx1)))
    gy1 = max(float(np.max(qy)), float(np.max(by1)))
    g = max(1, int(np.sqrt(n)))
    sx = (gx1 - gx0) / g or 1.0
    sy = (gy1 - gy0) / g or 1.0

    def cell_of(x, y):
        cx = np.clip(((x - gx0) / sx).astype(np.int64), 0, g - 1)
        cy = np.clip(((y - gy0) / sy).astype(np.int64), 0, g - 1)
        return cy * g + cx

    q_cell = cell_of(np.asarray(qx), np.asarray(qy))
    ix0 = np.clip(((bx0 - gx0) / sx).astype(np.int64), 0, g - 1)
    ix1 = np.clip(((bx1 - gx0) / sx).astype(np.int64), 0, g - 1)
    iy0 = np.clip(((by0 - gy0) / sy).astype(np.int64), 0, g - 1)
    iy1 = np.clip(((by1 - gy0) / sy).astype(np.int64), 0, g - 1)
    spans = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    item = np.repeat(np.arange(n, dtype=np.int64), spans)
    # per-item row-major offsets within its covered cell rectangle
    k = np.arange(spans.sum(), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(spans)[:-1]]), spans)
    w = (ix1 - ix0 + 1)[item]
    cells = (iy0[item] + k // w) * g + (ix0[item] + k % w)
    order = np.lexsort((item, cells))
    return q_cell, cells[order], item[order]


def barycentric_interpolate(qx, qy, px, py, pz, triangles) -> np.ndarray:
    """Linear interpolation of query points over a triangulated point
    set (raster-fill-nn/interpolation.rs:36-39, the barycentric
    alternative the reference documents next to its Sibson kernel).
    Queries outside every triangle return NaN. Boundary points (a zero
    barycentric coordinate) are inclusive; the value is continuous
    across shared edges, so which neighbor claims the boundary is
    irrelevant. Candidate triangles come from a uniform grid keyed on
    triangle bboxes (round-4 ADVICE: the all-triangles-per-query loop
    was O(n_tri x n_holes)); per cell, candidates evaluate in triangle-
    table order on the not-yet-done queries, so the claimed triangle —
    and the output bits — are identical to the unbucketed loop."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    out = np.full(qx.shape, np.nan)
    tris = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
    if qx.size == 0 or tris.shape[0] == 0:
        return out
    tx = np.asarray(px, dtype=np.float64)[tris]
    ty = np.asarray(py, dtype=np.float64)[tris]
    q_cell, t_cells, t_ids = _grid_bucket_pairs(
        tx.min(1), ty.min(1), tx.max(1), ty.max(1), qx, qy)

    q_order = np.argsort(q_cell, kind="stable")
    q_bounds = np.searchsorted(q_cell[q_order],
                               np.arange(0, q_cell.max() + 2))
    t_lo = np.searchsorted(t_cells, np.arange(0, q_cell.max() + 2))
    for c in np.unique(q_cell):
        qs = q_order[q_bounds[c]:q_bounds[c + 1]]
        sub_x, sub_y = qx[qs], qy[qs]
        sub_done = np.zeros(qs.size, dtype=bool)
        for t in t_ids[t_lo[c]:t_lo[c + 1]]:
            if sub_done.all():
                break
            a, b, cc = tris[t]
            x1, y1, x2, y2 = px[a], py[a], px[b], py[b]
            x3, y3 = px[cc], py[cc]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            if det == 0.0:
                continue
            l1 = ((y2 - y3) * (sub_x - x3) + (x3 - x2) * (sub_y - y3)) / det
            l2 = ((y3 - y1) * (sub_x - x3) + (x1 - x3) * (sub_y - y3)) / det
            l3 = 1.0 - l1 - l2
            m = (~sub_done) & (l1 >= 0.0) & (l2 >= 0.0) & (l3 >= 0.0)
            if m.any():
                out[qs[m]] = l1[m] * pz[a] + l2[m] * pz[b] + l3[m] * pz[cc]
                sub_done |= m
    return out


def sibson_interpolate(qx, qy, px, py, pz, triangles) -> np.ndarray:
    """Sibson (C0) natural-neighbor interpolation over a precomputed
    Delaunay triangle table — the reference's raster-fill-nn kernel
    (interpolation.rs:5-35; spade NaturalNeighbor). Watson's cavity
    algorithm: the cavity of query q is every triangle whose
    circumcircle contains q; inserting q steals area from each cavity
    vertex's Voronoi cell, and because every virtual circumcenter
    cc(q, v, w) lies on bisector(q, v), the stolen polygon of v
    fan-triangulates per cavity triangle t = (v, w_a, w_b) (CCW) as
    signed_area(cc(q,v,w_a), C_t, cc(q,v,w_b)). Weights normalize, so
    the global sign cancels. Validated against a brute-force discrete
    (rasterized Voronoi) Sibson to <5e-4 and linear-exact to 1e-8
    (tests/test_knn.py). Properties: linear precision, C0 continuity
    everywhere, C1 except at data points (the reference's C1 gradient
    blend, interpolation.rs:36-46, is the remaining difference —
    weights here are Sibson's own).

    Queries outside the triangulated hull return NaN; a query exactly
    on a data point returns that point's z; a query exactly on a
    Delaunay edge (degenerate virtual circumcenter) falls back to the
    barycentric value — the two interpolants coincide there in the
    limit. Candidate cavities come from a uniform grid over
    circumcircle bboxes (same pruning as barycentric_interpolate)."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pz = np.asarray(pz, dtype=np.float64)
    tris = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
    # containment gate + fallback values in one pass: Sibson is only
    # defined inside the hull, and the barycentric value is its limit
    # on degenerate configurations
    base = barycentric_interpolate(qx, qy, px, py, pz, tris)
    if qx.size == 0 or tris.shape[0] == 0:
        return base
    # orient every triangle CCW once (contribution signs need it)
    crossz = ((px[tris[:, 1]] - px[tris[:, 0]])
              * (py[tris[:, 2]] - py[tris[:, 0]])
              - (py[tris[:, 1]] - py[tris[:, 0]])
              * (px[tris[:, 2]] - px[tris[:, 0]]))
    tris = tris.copy()
    flip = crossz < 0
    tris[flip] = tris[flip][:, [0, 2, 1]]
    from ..functions.delaunay import _circumcircles
    centers, r2 = _circumcircles(np.stack([px, py], axis=1), tris)
    valid_t = np.isfinite(r2) & np.isfinite(centers).all(axis=1)
    out = base.copy()
    todo = np.nonzero(np.isfinite(base))[0]
    if todo.size == 0 or not valid_t.any():
        return out
    # bucket only the non-degenerate triangles: a collinear row has a
    # NaN circumcenter, and one NaN bbox poisons the whole grid
    # (np.min/NaN->int casts) — degenerate triangles have no cavity
    # membership anyway (review r5)
    vidx = np.nonzero(valid_t)[0]
    vc = centers[vidx]
    vr = np.sqrt(r2[vidx])
    q_cell, t_cells, t_ids = _grid_bucket_pairs(
        vc[:, 0] - vr, vc[:, 1] - vr,
        vc[:, 0] + vr, vc[:, 1] + vr, qx[todo], qy[todo])
    t_ids = vidx[t_ids]
    t_lo = np.searchsorted(t_cells, np.arange(0, q_cell.max() + 2))
    eps_area = 1e-12 * max(float(np.nanmax(r2[valid_t]))
                           if valid_t.any() else 1.0, 1.0)
    for qi, c in zip(todo, q_cell):
        x, y = qx[qi], qy[qi]
        cand = t_ids[t_lo[c]:t_lo[c + 1]]
        if cand.size == 0:
            continue                       # keep barycentric fallback
        dd = (centers[cand, 0] - x) ** 2 + (centers[cand, 1] - y) ** 2
        cav = cand[valid_t[cand] & (dd <= r2[cand] * (1.0 + 1e-12))]
        if cav.size == 0:
            continue
        V = tris[cav]                      # (m, 3) CCW
        vx, vy = px[V], py[V]
        if bool(((vx == x) & (vy == y)).any()):
            m = (vx == x) & (vy == y)
            out[qi] = pz[V[m][0]]          # exact data-point hit
            continue
        # virtual circumcenters of (q, u, w) for the three CCW edges
        # (v0,v1), (v1,v2), (v2,v0) of each cavity triangle
        ux, uy = vx, vy
        wxe = vx[:, [1, 2, 0]]
        wye = vy[:, [1, 2, 0]]
        d = 2.0 * ((ux - x) * (wye - y) - (uy - y) * (wxe - x))
        if bool((np.abs(d) < eps_area).any()):
            continue                       # q on an edge: barycentric
        q2 = x * x + y * y
        u2 = ux * ux + uy * uy
        w2 = wxe * wxe + wye * wye
        ex = (q2 * (uy - wye) + u2 * (wye - y) + w2 * (y - uy)) / d
        ey = (q2 * (wxe - ux) + u2 * (x - wxe) + w2 * (ux - x)) / d
        # vertex i of each triangle takes signed_area(M_a, C_t, M_b)
        # with M_a = edge i's center, M_b = edge (i+2)%3's center
        ct = centers[cav]
        max_ = ex
        may = ey
        mbx = ex[:, [2, 0, 1]]
        mby = ey[:, [2, 0, 1]]
        contrib = 0.5 * ((ct[:, 0:1] - max_) * (mby - may)
                         - (ct[:, 1:2] - may) * (mbx - max_))
        ids, inv = np.unique(V.ravel(), return_inverse=True)
        w = np.bincount(inv, weights=contrib.ravel())
        tot = w.sum()
        if not np.isfinite(tot) or tot == 0.0:
            continue
        out[qi] = float(w @ pz[ids] / tot)
    return out


def _fill_with_triangles(images: DataFrame, points: pd.DataFrame,
                         triangles: np.ndarray, fill_nan: bool,
                         interp) -> DataFrame:
    """Shared mapInPandas shape of the triangulation-backed fills
    (barycentric / Sibson): decode, hole-locate, interpolate at pixel
    centers, byte-patch. Unfilled (outside-hull) pixels stay
    byte-identical; q16 re-encodes on the image-global grid."""
    px = points["x"].to_numpy()
    py = points["y"].to_numpy()
    pz = points["z"].to_numpy()
    tris = np.asarray(triangles, dtype=np.int64)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                block = codecs.decode_block(row.bytes, row.h, row.w, row.fmt)
                holes = block == row.no_val
                if fill_nan:
                    holes |= np.isnan(block)
                data = row.bytes
                n = 0
                if holes.any() and len(px):
                    ii, jj = np.nonzero(holes)
                    t = geom.transform_from_gdal(row.gt)
                    wx, wy = geom.transform_points(t, jj + 0.5, ii + 0.5)
                    vals = interp(wx, wy, px, py, pz, tris)
                    ok = ~np.isnan(vals)
                    n = int(ok.sum())
                    if n:
                        data = codecs.patch_block_bytes(
                            row.bytes, ii[ok], jj[ok], vals[ok],
                            row.h, row.w, row.fmt)
                out.append((row.image_id, data, row.w, row.h, row.fmt,
                            list(row.gt), row.crs, row.no_val, n))
            yield pd.DataFrame(out, columns=[
                "image_id", "bytes", "w", "h", "fmt", "gt", "crs",
                "no_val", "filled"])

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "gt array<double>, crs string, no_val double, filled long")
    return images.mapInPandas(gen, schema=schema)


def fill_barycentric(images: DataFrame, points: pd.DataFrame,
                     triangles: np.ndarray,
                     fill_nan: bool = False) -> DataFrame:
    """fill_idw's shape with LINEAR barycentric interpolation over a
    precomputed triangulation (grid_triangles for gridded points; any
    (n, 3) index table otherwise) instead of kNN+IDW — the J5
    interpolation the reference itself names as the alternative to
    Sibson C1 (raster-fill-nn/interpolation.rs:36-39): exact for
    piecewise-linear fields where IDW diverges up to 0.10% of range on
    curved ones (tests/test_knn.py). Holes outside the triangulated
    hull stay unfilled and are not counted. Same byte-patch discipline
    as fill_idw (unfilled pixels byte-identical, q16 on the
    image-global grid)."""
    return _fill_with_triangles(images, points, triangles, fill_nan,
                                barycentric_interpolate)


def fill_sibson(images: DataFrame, points: pd.DataFrame,
                triangles: np.ndarray,
                fill_nan: bool = False) -> DataFrame:
    """fill_barycentric with Sibson natural-neighbor weights — the
    reference's own raster-fill-nn kernel (interpolation.rs:5-35),
    closing SURVEY J5: C0-continuous natural-neighbor interpolation
    (no facet creases), linear-exact, bounded by the neighbor values.
    The reference's C1 gradient blend on top of the same weights
    (interpolation.rs:36-46) remains the one scoped-out refinement;
    divergence from this C0 kernel is the blend term only. IDW
    (fill_idw / fill_idw_distributed) and barycentric stay the default
    fills — Sibson costs a per-hole cavity solve."""
    return _fill_with_triangles(images, points, triangles, fill_nan,
                                sibson_interpolate)


DELAUNAY_TRI_SCHEMA = ("x1 double, y1 double, z1 double, "
                       "x2 double, y2 double, z2 double, "
                       "x3 double, y3 double, z3 double")


def delaunay_triangles_dist(points: DataFrame, cell_size: float,
                            max_bucket_points: int = 4000) -> DataFrame:
    """Distributed Delaunay triangulation of a scattered point
    DataFrame (pt_id, x, y, z) — the corpus-scale path the driver-side
    delaunay_triangles refuses beyond 20k points (the reference shares
    ONE driver triangulation across threads, raster-fill-nn/
    triangulation.rs:29-59 + main.rs:20,58; at 100x that scale the
    table must be built where the points live).

    Shape: each point replicates to its cell plus the 8 neighbors
    (one 9x shuffle), each bucket runs the same numpy Bowyer-Watson on
    its halo'd point set, and a triangle is emitted iff its
    circumcenter lies in the bucket's CORE cell (half-open — exactly
    one owner) AND its circumcircle fits inside the bucket's 3x3 halo
    square. The empty-circumcircle property is local: any point that
    could invalidate the triangle lies inside its circumcircle, which
    the halo fully covers — so every emitted triangle belongs to the
    GLOBAL Delaunay triangulation, each exactly once. Triangles whose
    circumcircle exceeds the halo (hull slivers, sparse regions) are
    dropped: interior-complete, boundary-conservative — holes only a
    dropped triangle could fill stay unfilled (pick cell_size a few
    multiples of the point spacing so interior circumradii stay well
    under it). Corners are canonicalized (sorted by (x, y)) so the
    emitted rows are a deterministic function of the point set alone.

    Returns one row per triangle with corner coordinates and values
    (DELAUNAY_TRI_SCHEMA) — downstream interpolation needs no global
    point ids. Buckets beyond ``max_bucket_points`` raise with
    guidance (smaller cell_size spreads the load)."""
    from ..functions.delaunay import _circumcircles, delaunay_triangles

    cs = float(cell_size)
    p = points.select("x", "y", "z")
    for d in ("_dx", "_dy"):
        p = p.withColumn(d, F.explode(F.lit([-1, 0, 1])))
    p = p.select(
        (F.floor(F.col("x") / cs).cast("long") + F.col("_dx")).alias("bcx"),
        (F.floor(F.col("y") / cs).cast("long") + F.col("_dy")).alias("bcy"),
        "x", "y", "z")

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["x1", "y1", "z1", "x2", "y2", "z2", "x3", "y3", "z3"]
        if len(pdf) < 3:
            return pd.DataFrame(columns=cols)
        if len(pdf) > max_bucket_points:
            raise ValueError(
                f"delaunay_triangles_dist: bucket {key} holds "
                f"{len(pdf)} points > max_bucket_points="
                f"{max_bucket_points}; use a smaller cell_size (or "
                f"raise the cap) so per-bucket triangulation stays "
                f"O(bucket^2)-affordable")
        bcx, bcy = int(key[0]), int(key[1])
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        z = pdf["z"].to_numpy()
        tris = delaunay_triangles(x, y, max_points=max_bucket_points)
        if tris.shape[0] == 0:
            return pd.DataFrame(columns=cols)
        centers, r2 = _circumcircles(np.stack([x, y], axis=1), tris)
        core_x0, core_y0 = bcx * cs, bcy * cs
        hx0, hy0 = (bcx - 1) * cs, (bcy - 1) * cs
        hx1, hy1 = (bcx + 2) * cs, (bcy + 2) * cs
        edge = np.minimum.reduce([
            centers[:, 0] - hx0, hx1 - centers[:, 0],
            centers[:, 1] - hy0, hy1 - centers[:, 1]])
        keep = (np.isfinite(r2)
                & (centers[:, 0] >= core_x0) & (centers[:, 0] < core_x0 + cs)
                & (centers[:, 1] >= core_y0) & (centers[:, 1] < core_y0 + cs)
                & (r2 <= edge * edge))
        tris = tris[keep]
        if tris.shape[0] == 0:
            return pd.DataFrame(columns=cols)
        # canonical corner order (by (x, y)) + row order: the output
        # is then a function of the point set, not of bucket internals
        cx9 = x[tris]
        cy9 = y[tris]
        order = np.lexsort((cy9, cx9), axis=1)
        tris = np.take_along_axis(tris, order, axis=1)
        rows = np.column_stack([x[tris[:, 0]], y[tris[:, 0]], z[tris[:, 0]],
                                x[tris[:, 1]], y[tris[:, 1]], z[tris[:, 1]],
                                x[tris[:, 2]], y[tris[:, 2]], z[tris[:, 2]]])
        rows = rows[np.lexsort(rows.T[::-1])]
        return pd.DataFrame(rows, columns=cols)

    return p.groupBy("bcx", "bcy").applyInPandas(
        lambda k, pdf: kernel(k, pdf), schema=DELAUNAY_TRI_SCHEMA)


def fill_barycentric_distributed(images: DataFrame, points: DataFrame,
                                 cell_size: float,
                                 max_bucket_points: int = 4000,
                                 fill_nan: bool = False,
                                 triangles: DataFrame | None = None
                                 ) -> DataFrame:
    """fill_barycentric for point tables too large to broadcast: the
    triangle table comes from delaunay_triangles_dist (or a precomputed
    ``triangles`` DataFrame in DELAUNAY_TRI_SCHEMA), hole pixels
    explode to cell keys, and a (cell x cell) cogroup runs the same
    bucketed barycentric kernel on each cell's holes against the
    triangles whose bbox covers that cell — rings of coordinates cross
    the wire once per (triangle, covered cell), never per hole. Equal
    to the broadcast fill_barycentric on every hole whose containing
    triangle survives the halo rule (strictly-interior holes are
    bit-identical: same canonical triangle, same IEEE expression);
    holes covered only by dropped sliver triangles stay unfilled
    (delaunay_triangles_dist docstring). Returns the fill_idw schema."""
    return _fill_dist_tri_core(images, points, cell_size,
                               max_bucket_points, fill_nan, triangles,
                               mode="barycentric")


def fill_sibson_distributed(images: DataFrame, points: DataFrame,
                            cell_size: float,
                            max_bucket_points: int = 4000,
                            fill_nan: bool = False,
                            triangles: DataFrame | None = None
                            ) -> DataFrame:
    """fill_sibson for point tables too large to broadcast — the same
    distributed shape as fill_barycentric_distributed, except the
    candidate cells come from each triangle's CIRCUMCIRCLE bbox (pure
    Catalyst closed form), because the Sibson cavity of a hole is
    every triangle whose circumcircle contains it, not just the
    containing triangle. Interior holes whose full cavity survives the
    halo keep rule match broadcast fill_sibson to summation-order fp
    noise (~1e-12, tested); holes near dropped hull slivers see a
    truncated cavity and interpolate from the surviving neighbors."""
    return _fill_dist_tri_core(images, points, cell_size,
                               max_bucket_points, fill_nan, triangles,
                               mode="sibson")


def _fill_dist_tri_core(images: DataFrame, points: DataFrame,
                        cell_size: float, max_bucket_points: int,
                        fill_nan: bool, triangles: DataFrame | None,
                        mode: str) -> DataFrame:
    cs = float(cell_size)
    tris = triangles if triangles is not None else \
        delaunay_triangles_dist(points, cs, max_bucket_points)
    t = tris
    if mode == "sibson":
        # circumcircle bbox as Catalyst closed form: the cavity test
        # (|q - C| <= r) can only hit cells the circle bbox covers
        x1, y1 = F.col("x1"), F.col("y1")
        x2, y2 = F.col("x2"), F.col("y2")
        x3, y3 = F.col("x3"), F.col("y3")
        d = 2.0 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
        s1 = x1 * x1 + y1 * y1
        s2 = x2 * x2 + y2 * y2
        s3 = x3 * x3 + y3 * y3
        ux = (s1 * (y2 - y3) + s2 * (y3 - y1) + s3 * (y1 - y2)) / d
        uy = (s1 * (x3 - x2) + s2 * (x1 - x3) + s3 * (x2 - x1)) / d
        r = F.sqrt((x1 - ux) * (x1 - ux) + (y1 - uy) * (y1 - uy))
        t = (t.where(d != 0.0)
             .withColumn("_ux", ux).withColumn("_uy", uy)
             .withColumn("_r", r))
        lox, hix = F.col("_ux") - F.col("_r"), F.col("_ux") + F.col("_r")
        loy, hiy = F.col("_uy") - F.col("_r"), F.col("_uy") + F.col("_r")
    else:
        lox, hix = F.least("x1", "x2", "x3"), F.greatest("x1", "x2", "x3")
        loy, hiy = F.least("y1", "y2", "y3"), F.greatest("y1", "y2", "y3")
    t = t.withColumn("tcx", F.explode(F.sequence(
        F.floor(lox / cs).cast("long"), F.floor(hix / cs).cast("long"))))
    t = t.withColumn("tcy", F.explode(F.sequence(
        F.floor(loy / cs).cast("long"), F.floor(hiy / cs).cast("long"))))
    t = t.select("x1", "y1", "z1", "x2", "y2", "z2", "x3", "y3", "z3",
                 "tcx", "tcy")
    interp = sibson_interpolate if mode == "sibson" \
        else barycentric_interpolate

    q = hole_pixels(images, fill_nan)
    q = q.withColumn("qcx", F.floor(F.col("x") / cs).cast("long")) \
         .withColumn("qcy", F.floor(F.col("y") / cs).cast("long"))

    def cell_kernel(key, qpdf: pd.DataFrame, tpdf: pd.DataFrame):
        cols = ["image_id", "pi", "pj", "val"]
        if len(qpdf) == 0 or len(tpdf) == 0:
            return pd.DataFrame(columns=cols)
        # deterministic candidate order (canonical rows sort the same
        # in every run), so on-edge ties resolve reproducibly
        tp = tpdf[["x1", "y1", "z1", "x2", "y2", "z2",
                   "x3", "y3", "z3"]].to_numpy()
        tp = tp[np.lexsort(tp.T[::-1])]
        m = tp.shape[0]
        px = tp[:, [0, 3, 6]].ravel()
        py = tp[:, [1, 4, 7]].ravel()
        pz = tp[:, [2, 5, 8]].ravel()
        tri_idx = np.arange(3 * m, dtype=np.int64).reshape(m, 3)
        vals = interp(
            qpdf["x"].to_numpy(), qpdf["y"].to_numpy(),
            px, py, pz, tri_idx)
        ok = np.isfinite(vals)
        return pd.DataFrame({
            "image_id": qpdf["image_id"].to_numpy()[ok],
            "pi": qpdf["pi"].to_numpy()[ok],
            "pj": qpdf["pj"].to_numpy()[ok],
            "val": vals[ok]})

    fills = q.groupBy("qcx", "qcy").cogroup(t.groupBy("tcx", "tcy")) \
        .applyInPandas(lambda k, a, b: cell_kernel(k, a, b),
                       schema="image_id string, pi long, pj long, val double")
    # fresh attribute for the patch cogroup key: fills derives from
    # images (hole_pixels), and sharing exprIds across the two cogroup
    # sides trips the ambiguous-self-join check
    fills = fills.select(F.col("image_id").alias("_fid"), "pi", "pj", "val")

    out_schema = ("image_id string, bytes binary, w int, h int, fmt string, "
                  "gt array<double>, crs string, no_val double, filled long")

    def patch(img_pdf: pd.DataFrame, f_pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in img_pdf.itertuples(index=False):
            g = f_pdf[f_pdf["_fid"] == row.image_id] if len(f_pdf) else f_pdf
            data = row.bytes
            n = len(g)
            if n:
                data = codecs.patch_block_bytes(
                    row.bytes, g["pi"].to_numpy(), g["pj"].to_numpy(),
                    g["val"].to_numpy(), row.h, row.w, row.fmt)
            out.append((row.image_id, data, row.w, row.h, row.fmt,
                        list(row.gt), row.crs, row.no_val, n))
        return pd.DataFrame(out, columns=[
            "image_id", "bytes", "w", "h", "fmt", "gt", "crs",
            "no_val", "filled"])

    return images.groupBy("image_id").cogroup(fills.groupBy("_fid")) \
        .applyInPandas(lambda k, a, b: patch(a, b), schema=out_schema)
