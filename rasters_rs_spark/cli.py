"""CLI parity with the reference's binaries, over image tables.

Reference commands -> subcommands here (same outputs, table-valued
inputs instead of single GDAL files):

  raster-stats R [--polygons]   -> stats    (JSON PixelStats per zone)
  raster-diff A B [--hist]      -> diff     (JSON RasterDiffStats / histogram)
  raster-mask R OUT             -> mask     (mask table parquet)
  raster-tile R OUT             -> tile     (tile table parquet + index.json)
  raster-fill-nn R PTS OUT      -> fill     (filled table parquet + count)

plus engine-native: resample, chunk. Run via
``spark-submit --py-files dist/rasters_rs_spark.zip -m`` or
``python -m rasters_rs_spark.cli <cmd> ...``.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _spark(args):
    from .session import get_spark
    return get_spark("rasters-cli", cores=args.cores)


def _images(spark, path: str):
    from .sources.io import read_table
    return read_table(spark, path)


def cmd_stats(args):
    import pandas as pd
    from .operators.stats import image_pixel_stats, zonal_stats
    spark = _spark(args)
    images = _images(spark, args.input)
    if args.polygons:
        if args.distributed_aois:
            from .operators.stats import zonal_stats_dist
            # cast onto AOI_SCHEMA types (pandas-written parquet holds
            # int64 ring offsets)
            adf = spark.read.parquet(args.polygons).selectExpr(
                "cast(aoi_id as string) aoi_id",
                "transform(ring_offsets, v -> cast(v as int)) ring_offsets",
                "transform(xs, v -> cast(v as double)) xs",
                "transform(ys, v -> cast(v as double)) ys")
            out = zonal_stats_dist(images, adf,
                                   include_whole=args.include_whole)
        else:
            aois = pd.read_parquet(args.polygons)
            out = zonal_stats(images, aois,
                              include_whole=args.include_whole)
        rows = [r.asDict() for r in out.orderBy("aoi_id").collect()]
    else:
        rows = [r.asDict() for r in image_pixel_stats(images).collect()]
    print(json.dumps(rows, default=float))


def cmd_diff(args):
    from .operators.diff import diff_histogram, diff_raster, diff_stats
    spark = _spark(args)
    a = _images(spark, args.input_a)
    b = _images(spark, args.input_b)
    if args.hist:
        hmin, hmax, bins = args.hist
        out = diff_histogram(a, b, float(hmin), float(hmax), int(bins),
                             adjust=args.adjust, negate=args.negate)
        hist = {str(r["bin"]): r["n"] for r in out.collect()}
        if args.bin:
            # the reference's --hist artifact is CBOR (write_bin,
            # raster-tools/src/utils.rs:117-122)
            from .functions.cbor import write_bin
            write_bin(args.bin, hist)
        print(json.dumps(hist))
        return
    if args.output:
        disc = tuple(args.discretize) if args.discretize else None
        diff_raster(a, b, adjust=args.adjust, negate=args.negate,
                    discretize=disc).write.mode("overwrite").parquet(args.output)
    row = diff_stats(a, b, adjust=args.adjust, negate=args.negate).collect()[0]
    print(json.dumps(row.asDict(), default=float))


def cmd_mask(args):
    from .operators.mask import mask
    spark = _spark(args)
    mask(_images(spark, args.input)).write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output}))


def cmd_tile(args):
    from .operators.tiling import dump_index_json, tile_index_manifest
    from .sources.io import write_tiles
    spark = _spark(args)
    enc = tile_index_manifest(_images(spark, args.input),
                              tile_size=args.tile_size,
                              min_zoom=args.min_zoom, max_zoom=args.max_zoom,
                              mode=args.mode)
    enc = enc.persist()
    write_tiles(enc.drop("bins"), f"{args.output}/tiles")
    dump_index_json(enc, f"{args.output}/index.json", image_id=args.image_id)
    print(json.dumps({"tiles": enc.count(), "output": args.output}))


def cmd_fill(args):
    import pandas as pd
    from .operators.knn import fill_barycentric, fill_idw, fill_sibson
    spark = _spark(args)
    pts = pd.read_parquet(args.points)
    if args.method in ("barycentric", "sibson", "sibson-c1"):
        from .functions.delaunay import delaunay_triangles
        tris = delaunay_triangles(pts["x"].to_numpy(), pts["y"].to_numpy())
        if args.method == "barycentric":
            out = fill_barycentric(_images(spark, args.input), pts, tris,
                                   fill_nan=args.fill_nan).persist()
        else:
            out = fill_sibson(_images(spark, args.input), pts, tris,
                              fill_nan=args.fill_nan,
                              c1=args.method == "sibson-c1").persist()
    else:
        out = fill_idw(_images(spark, args.input), pts, k=args.k,
                       fill_nan=args.fill_nan).persist()
    out.write.mode("overwrite").parquet(args.output)
    filled = out.agg({"filled": "sum"}).collect()[0][0]
    print(json.dumps({"filled": int(filled), "output": args.output}))


def cmd_resample(args):
    from .operators.resample import resample
    spark = _spark(args)
    gt = [float(v) for v in args.gt]
    resample(_images(spark, args.input), gt, args.width, args.height,
             method=args.method).write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output}))


def cmd_chunk(args):
    from .operators.chunked import chunk_images
    spark = _spark(args)
    out = chunk_images(_images(spark, args.input),
                       min_data_size=args.chunk_size, padding=args.padding)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output}))


def cmd_validate(args):
    from .operators.multimodal import validate_images
    spark = _spark(args)
    out = validate_images(_images(spark, args.input_a),
                          _images(spark, args.input_b),
                          min_psnr=args.min_psnr).persist()
    bad = out.where("NOT psnr_ok OR NOT caption_match")
    n_bad = bad.count()
    print(json.dumps({"rows": out.count(), "failures": n_bad,
                      "failed_ids": [r["image_id"]
                                     for r in bad.limit(20).collect()]}))


def cmd_augment(args):
    from .operators.multimodal import augment_images
    spark = _spark(args)
    crop = tuple(args.crop) if args.crop else None
    out = augment_images(_images(spark, args.input), args.op, crop=crop)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output, "op": args.op}))


def cmd_mosaic(args):
    from .operators.resample import mosaic
    spark = _spark(args)
    gt = [float(v) for v in args.gt]
    out = mosaic(_images(spark, args.input), gt, args.width, args.height,
                 method=args.method, strip_height=args.strip_height,
                 tile_width=args.tile_width, assemble=args.assemble)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output,
                      "representation": ("image" if args.assemble
                                         else "tiles")}))


def cmd_focal(args):
    from .operators.focal import focal
    spark = _spark(args)
    out = focal(_images(spark, args.input), args.op,
                sun_azimuth_deg=args.azimuth,
                sun_altitude_deg=args.altitude)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output, "op": args.op}))


def cmd_rasterize(args):
    import pandas as pd
    from .operators.celljoin import rasterize, rasterize_dist
    from .operators.chunked import assemble_images
    spark = _spark(args)
    gt = [float(v) for v in args.gt]
    if args.distributed_aois:
        adf = spark.read.parquet(args.aois).selectExpr(
            "cast(aoi_id as string) aoi_id",
            "transform(ring_offsets, v -> cast(v as int)) ring_offsets",
            "transform(xs, v -> cast(v as double)) xs",
            "transform(ys, v -> cast(v as double)) ys")
        chunks = rasterize_dist(adf, gt, args.width, args.height,
                                strip_height=args.strip_height)
    else:
        aois = pd.read_parquet(args.aois)
        chunks = rasterize(spark, aois, gt, args.width, args.height,
                           strip_height=args.strip_height)
    out = assemble_images(chunks) if args.assemble else chunks
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"written": args.output,
                      "representation": ("image" if args.assemble
                                         else "chunks")}))


def cmd_polygonize(args):
    from .operators.chunked import chunk_images
    from .operators.vectorize import polygonize, polygonize_chunked
    spark = _spark(args)
    images = _images(spark, args.input)
    if args.chunked:
        # min_data_size is in pixels; strip height rides the widest
        # image's row length (one tiny agg, not a per-row collect)
        w = images.agg({"w": "max"}).first()[0]
        if w is None:
            raise SystemExit("polygonize --chunked: no input images "
                             f"under {args.input}")
        out = polygonize_chunked(
            chunk_images(images, min_data_size=args.strip_height * int(w),
                         padding=0), n_classes=args.classes)
    else:
        out = polygonize(images, n_classes=args.classes)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"written": args.output, "regions": n,
                      "classes": args.classes}))


def cmd_contour(args):
    from .operators.vectorize import contour_cases, contour_polylines
    spark = _spark(args)
    images = _images(spark, args.input)
    out = (contour_polylines(images, level=args.level) if args.lines
           else contour_cases(images, level=args.level))
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"written": args.output,
                      "rows": n, "level": args.level,
                      "representation": ("polylines" if args.lines
                                         else "cells")}))


def cmd_quality(args):
    from pyspark.sql import functions as F
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    if args.ruleset == "gopher":
        out = T.gopher_quality_filter(docs, min_words=args.min_words,
                                      id_col=args.id_col,
                                      text_col=args.text_col)
    else:
        out = T.c4_clean(docs, id_col=args.id_col,
                         text_col=args.text_col)
    if args.keep_only:
        out = out.where(F.col("keep"))
    out.write.mode("overwrite").parquet(args.output)
    n_all = docs.count()
    n_keep = spark.read.parquet(args.output)         .where(F.col("keep")).count() if not args.keep_only         else spark.read.parquet(args.output).count()
    print(json.dumps({"written": args.output, "ruleset": args.ruleset,
                      "input_docs": n_all, "kept": n_keep}))


def cmd_passages(args):
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    out = T.split_passages(docs, window=args.window, stride=args.stride,
                           id_col=args.id_col, text_col=args.text_col)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"written": args.output, "passages": n,
                      "window": args.window, "stride": args.stride}))


def cmd_dedup(args):
    from .operators import dedup as D
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    if args.method == "minhash":
        pairs = D.minhash_dedup(docs, text_col=args.text_col,
                                id_col=args.id_col,
                                threshold=args.threshold,
                                shingle_k=args.shingle_k)
    else:
        pairs = D.simhash_dedup(docs, text_col=args.text_col,
                                id_col=args.id_col,
                                max_hamming=args.max_hamming)
    pairs = pairs.persist()
    pairs.write.mode("overwrite").parquet(args.output)
    n = pairs.count()
    out = {"pairs": n, "output": args.output, "method": args.method}
    if args.keep:
        kept = D.keep_canonical(docs, pairs, id_col=args.id_col)
        kept.write.mode("overwrite").parquet(args.keep)
        out["kept_rows"] = kept.count()
        out["kept_output"] = args.keep
    print(json.dumps(out))


def cmd_tokenize(args):
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    if args.counts_only:
        out = T.bpe_token_count(docs, id_col=args.id_col,
                                text_col=args.text_col)
    else:
        out = T.bpe_tokenize(docs, id_col=args.id_col,
                             text_col=args.text_col)
    out = out.persist()
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"docs": out.count(), "output": args.output,
                      "mode": "counts" if args.counts_only else "stream"}))


def cmd_pack(args):
    from pyspark.sql import functions as F
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    out = T.pack_sequences(docs, budget=args.budget, id_col=args.id_col,
                           text_col=args.text_col).persist()
    out.write.mode("overwrite").parquet(args.output)
    toks = int(out.agg(F.sum("n_tokens")).first()[0] or 0)
    print(json.dumps({"docs": out.count(), "tokens": toks,
                      "sequences": -(-toks // args.budget),
                      "budget": args.budget, "output": args.output}))


def cmd_sample(args):
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    fracs = {}
    for spec in args.stratum or []:
        k, v = spec.split("=", 1)
        fracs[k] = float(v)
    out = T.stratified_sample(docs, fracs, strata_col=args.strata_col,
                              id_col=args.id_col, salt=args.salt,
                              default=args.default).persist()
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"kept": out.count(), "output": args.output,
                      "fractions": fracs, "default": args.default}))


def cmd_decon(args):
    from .operators import dedup as D
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    tests = spark.read.parquet(args.tests)
    flagged = D.decontaminate(docs, tests, shingle_k=args.shingle_k,
                              min_hits=args.min_hits,
                              text_col=args.text_col,
                              id_col=args.id_col).persist()
    flagged.write.mode("overwrite").parquet(args.output)
    out = {"flagged_pairs": flagged.count(), "output": args.output}
    if args.keep:
        kept = D.keep_uncontaminated(docs, flagged, id_col=args.id_col)
        kept.write.mode("overwrite").parquet(args.keep)
        out["kept_rows"] = kept.count()
        out["kept_output"] = args.keep
    print(json.dumps(out))


def cmd_spanrm(args):
    from pyspark.sql import functions as F
    from .operators import text as T
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    cleaned = T.remove_duplicated_spans(
        docs, k=args.k, id_col=args.id_col, text_col=args.text_col,
        within_doc=args.within_doc).persist()
    # carry every non-text column through; cleaned text replaces it
    out = docs.drop(args.text_col).join(
        cleaned.select(args.id_col,
                       F.col("text_clean").alias(args.text_col)),
        on=args.id_col)
    out.write.mode("overwrite").parquet(args.output)
    agg = cleaned.agg(
        F.sum("n_spans_removed").alias("s"),
        F.sum("n_chars_removed").alias("c"),
        F.count("*").alias("n")).first()
    print(json.dumps({"docs": int(agg["n"]),
                      "spans_removed": int(agg["s"] or 0),
                      "chars_removed": int(agg["c"] or 0),
                      "within_doc": bool(args.within_doc),
                      "k": args.k, "output": args.output}))


def cmd_search(args):
    from .operators import similarity as S
    spark = _spark(args)
    docs = spark.read.parquet(args.corpus)
    queries = spark.read.parquet(args.queries)
    out = S.bm25_topk(queries, docs, k=args.k, k1=args.k1, b=args.b,
                      id_col=args.id_col, text_col=args.text_col,
                      q_id_col=args.q_id_col,
                      q_text_col=args.q_text_col).persist()
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": out.count(), "k": args.k,
                      "output": args.output}))


def cmd_ann(args):
    from pyspark.sql import functions as F
    from .operators import similarity as S
    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus).selectExpr(
        f"cast({args.id_col} as string) vec_id",
        f"transform({args.vec_col}, x -> cast(x as double)) embedding")
    queries = spark.read.parquet(args.queries).selectExpr(
        f"cast({args.id_col} as string) q_id",
        f"transform({args.vec_col}, x -> cast(x as double)) q_vec")
    fn = {
        "exact": lambda: S.cosine_topk(queries, corpus, k=args.k),
        "lsh": lambda: S.lsh_topk_det(queries, corpus, k=args.k,
                                      dim=args.dim),
        "ivf": lambda: S.ivf_topk_det(queries, corpus, k=args.k,
                                      dim=args.dim),
        "pq": lambda: S.ann_pq(queries, corpus, k=args.k, dim=args.dim),
        "ivfpq": lambda: S.ann_ivfpq(queries, corpus, k=args.k,
                                     dim=args.dim),
    }[args.method]
    out = fn().persist()
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": out.count(), "method": args.method,
                      "k": args.k, "output": args.output}))


def build_parser():
    p = argparse.ArgumentParser(prog="rasters-rs-spark")
    p.add_argument("--cores", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stats")
    s.add_argument("input")
    s.add_argument("--polygons")
    s.add_argument("--include-whole", action="store_true")
    s.add_argument("--distributed-aois", action="store_true",
                   help="treat --polygons as a corpus-scale AOI "
                        "catalog: covering cells as Catalyst exprs, "
                        "nothing driver-side (zonal_stats_dist)")
    s.set_defaults(fn=cmd_stats)

    d = sub.add_parser("diff")
    d.add_argument("input_a")
    d.add_argument("input_b")
    d.add_argument("--adjust", type=float, default=0.0)
    d.add_argument("--negate", action="store_true")
    d.add_argument("--hist", nargs=3, metavar=("MIN", "MAX", "BINS"))
    d.add_argument("--bin", help="also write the histogram as CBOR "
                                 "(reference write_bin artifact)")
    d.add_argument("--output")
    d.add_argument("--discretize", nargs=3, type=float)
    d.set_defaults(fn=cmd_diff)

    m = sub.add_parser("mask")
    m.add_argument("input")
    m.add_argument("output")
    m.set_defaults(fn=cmd_mask)

    t = sub.add_parser("tile")
    t.add_argument("input")
    t.add_argument("output")
    t.add_argument("--tile-size", type=int, default=256)
    t.add_argument("--min-zoom", type=int)
    t.add_argument("--max-zoom", type=int)
    t.add_argument("--mode", default="local", choices=["local", "distributed"])
    t.add_argument("--image-id")
    t.set_defaults(fn=cmd_tile)

    f = sub.add_parser("fill")
    f.add_argument("input")
    f.add_argument("points")
    f.add_argument("output")
    f.add_argument("-k", type=int, default=8)
    f.add_argument("--fill-nan", action="store_true")
    f.add_argument("--method", default="idw",
                   choices=["idw", "barycentric", "sibson", "sibson-c1"],
                   help="barycentric = linear interpolation over a "
                        "driver-built Delaunay triangulation; sibson = "
                        "C0 natural-neighbor (Watson cavity); sibson-c1 "
                        "= the reference raster-fill-nn default (C1 "
                        "gradient blend, flatness 0.5)")
    f.set_defaults(fn=cmd_fill)

    r = sub.add_parser("resample")
    r.add_argument("input")
    r.add_argument("output")
    r.add_argument("--gt", nargs=6, required=True)
    r.add_argument("--width", type=int, required=True)
    r.add_argument("--height", type=int, required=True)
    r.add_argument("--method", default="nearest", choices=["nearest", "bilinear", "cubic"])
    r.set_defaults(fn=cmd_resample)

    c = sub.add_parser("chunk")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("-c", "--chunk-size", type=int, default=0x10000)
    c.add_argument("--padding", type=int, default=0)
    c.set_defaults(fn=cmd_chunk)

    v = sub.add_parser("validate", help="per-row PSNR/caption invariant gate")
    v.add_argument("input_a")
    v.add_argument("input_b")
    v.add_argument("--min-psnr", type=float, default=40.0)
    v.set_defaults(fn=cmd_validate)

    g = sub.add_parser("augment", help="deterministic image augmentation")
    g.add_argument("input")
    g.add_argument("output")
    g.add_argument("--op", required=True,
                   choices=["fliph", "flipv", "rot90", "rot180", "rot270",
                            "crop"])
    g.add_argument("--crop", nargs=4, type=int,
                   metavar=("I0", "J0", "H", "W"))
    g.set_defaults(fn=cmd_augment)

    mo = sub.add_parser("mosaic", help="composite images onto one grid "
                                       "(NaN-aware overlap mean)")
    mo.add_argument("input")
    mo.add_argument("output")
    mo.add_argument("--gt", nargs=6, required=True)
    mo.add_argument("--width", type=int, required=True)
    mo.add_argument("--height", type=int, required=True)
    mo.add_argument("--method", default="nearest",
                    choices=["nearest", "bilinear", "cubic"])
    mo.add_argument("--strip-height", type=int, default=256)
    mo.add_argument("--tile-width", type=int, default=1024)
    mo.add_argument("--tiles", dest="assemble", action="store_false",
                    help="write the bounded (sy, sx) tile representation "
                         "instead of one assembled image row")
    mo.set_defaults(fn=cmd_mosaic, assemble=True)

    fo = sub.add_parser("focal", help="neighborhood kernels: 3x3 mean, "
                                      "gradient, slope, hillshade")
    fo.add_argument("input")
    fo.add_argument("output")
    fo.add_argument("--op", required=True,
                    choices=["mean3", "grad_mag", "slope", "hillshade"])
    fo.add_argument("--azimuth", type=float, default=315.0)
    fo.add_argument("--altitude", type=float, default=45.0)
    fo.set_defaults(fn=cmd_focal)

    rz = sub.add_parser("rasterize", help="burn AOI polygons into a "
                                          "raster grid")
    rz.add_argument("aois", help="parquet with aoi_id/ring_offsets/xs/ys")
    rz.add_argument("output")
    rz.add_argument("--gt", nargs=6, required=True)
    rz.add_argument("--width", type=int, required=True)
    rz.add_argument("--height", type=int, required=True)
    rz.add_argument("--strip-height", type=int, default=256)
    rz.add_argument("--chunks", dest="assemble", action="store_false",
                    help="write strip chunks instead of one image row")
    rz.add_argument("--distributed-aois", action="store_true",
                    help="treat the AOI parquet as a corpus-scale "
                         "catalog (rasterize_dist)")
    rz.set_defaults(fn=cmd_rasterize, assemble=True)

    pz = sub.add_parser("polygonize", help="raster -> vector regions "
                                           "(connected components of "
                                           "quantized classes)")
    pz.add_argument("input")
    pz.add_argument("output")
    pz.add_argument("--classes", type=int, default=4)
    pz.add_argument("--chunked", action="store_true",
                    help="per-strip CCL + boundary-graph merge")
    pz.add_argument("--strip-height", type=int, default=64)
    pz.set_defaults(fn=cmd_polygonize)

    co = sub.add_parser("contour", help="marching-squares contours "
                                        "(cell table or polylines)")
    co.add_argument("input")
    co.add_argument("output")
    co.add_argument("--level", type=float, default=0.5)
    co.add_argument("--lines", action="store_true",
                    help="assemble polylines instead of the cell table")
    co.set_defaults(fn=cmd_contour)

    ql = sub.add_parser("quality", help="document quality gates "
                                        "(Gopher rules / C4 cleaning)")
    ql.add_argument("input")
    ql.add_argument("output")
    ql.add_argument("--ruleset", default="gopher",
                    choices=["gopher", "c4"])
    ql.add_argument("--min-words", type=int, default=50)
    ql.add_argument("--id-col", default="doc_id")
    ql.add_argument("--text-col", default="text")
    ql.add_argument("--keep-only", action="store_true",
                    help="write surviving rows only")
    ql.set_defaults(fn=cmd_quality)

    pg = sub.add_parser("passages", help="overlapping token-window "
                                         "passage splitting")
    pg.add_argument("input")
    pg.add_argument("output")
    pg.add_argument("--window", type=int, default=64)
    pg.add_argument("--stride", type=int, default=48)
    pg.add_argument("--id-col", default="doc_id")
    pg.add_argument("--text-col", default="text")
    pg.set_defaults(fn=cmd_passages)

    dd = sub.add_parser("dedup", help="near-duplicate document pairs "
                                      "(MinHash LSH or SimHash)")
    dd.add_argument("input")
    dd.add_argument("output")
    dd.add_argument("--method", default="minhash",
                    choices=["minhash", "simhash"])
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--threshold", type=float, default=0.8)
    dd.add_argument("--shingle-k", type=int, default=3)
    dd.add_argument("--max-hamming", type=int, default=3)
    dd.add_argument("--keep", default=None,
                    help="also write the deduplicated corpus "
                         "(canonical keepers) to this path")
    dd.set_defaults(fn=cmd_dedup)

    tk = sub.add_parser("tokenize", help="real merges-table BPE over the "
                                         "cleaned [a-z ] alphabet")
    tk.add_argument("input")
    tk.add_argument("output")
    tk.add_argument("--id-col", default="doc_id")
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--counts-only", action="store_true",
                    help="write (doc_id, n_tokens) instead of the "
                         "delimited token stream")
    tk.set_defaults(fn=cmd_tokenize)

    pk = sub.add_parser("pack", help="GPT-style concat-and-chunk sequence "
                                     "packing (docs may span sequences)")
    pk.add_argument("input")
    pk.add_argument("output")
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--text-col", default="text")
    pk.set_defaults(fn=cmd_pack)

    sm = sub.add_parser("sample", help="deterministic per-stratum "
                                       "Bernoulli sampling")
    sm.add_argument("input")
    sm.add_argument("output")
    sm.add_argument("--stratum", action="append", metavar="NAME=FRAC",
                    help="per-stratum keep fraction (repeatable)")
    sm.add_argument("--strata-col", default="lang")
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--salt", default="s1")
    sm.add_argument("--default", type=float, default=0.0)
    sm.set_defaults(fn=cmd_sample)

    dc = sub.add_parser("decon", help="benchmark decontamination "
                                      "(n-gram overlap vs a test set)")
    dc.add_argument("input")
    dc.add_argument("tests", help="parquet benchmark/test-set table")
    dc.add_argument("output", help="flagged (doc, test) pairs parquet")
    dc.add_argument("--shingle-k", type=int, default=8)
    dc.add_argument("--min-hits", type=int, default=1)
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--keep", default=None,
                    help="also write the decontaminated corpus here")
    dc.set_defaults(fn=cmd_decon)

    sr = sub.add_parser("spanrm", help="exact duplicated-span removal "
                                       "(substring dedup, Lee et al.)")
    sr.add_argument("input")
    sr.add_argument("output", help="cleaned corpus parquet")
    sr.add_argument("--k", type=int, default=16,
                    help="window length in characters")
    sr.add_argument("--within-doc", action="store_true",
                    help="also cut repeats inside a single document")
    sr.add_argument("--text-col", default="text")
    sr.add_argument("--id-col", default="doc_id")
    sr.set_defaults(fn=cmd_spanrm)

    se = sub.add_parser("search", help="BM25 lexical top-k retrieval")
    se.add_argument("corpus")
    se.add_argument("queries", help="parquet with (q_id, q_text)")
    se.add_argument("output")
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--k1", type=float, default=1.2)
    se.add_argument("--b", type=float, default=0.75)
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--q-id-col", default="q_id")
    se.add_argument("--q-text-col", default="q_text")
    se.set_defaults(fn=cmd_search)

    an = sub.add_parser("ann", help="similarity search over an "
                                    "embedding corpus")
    an.add_argument("corpus")
    an.add_argument("queries")
    an.add_argument("output")
    an.add_argument("--method", default="exact",
                    choices=["exact", "lsh", "ivf", "pq", "ivfpq"])
    an.add_argument("--k", type=int, default=5)
    an.add_argument("--dim", type=int, default=64)
    an.add_argument("--id-col", default="vec_id")
    an.add_argument("--vec-col", default="embedding")
    an.set_defaults(fn=cmd_ann)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
