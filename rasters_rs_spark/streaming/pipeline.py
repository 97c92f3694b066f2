"""End-to-end resumable pipeline: the headline flow wired through the
checkpoint manifest (north rule: any failed tiling or join stage
resumes idempotently with per-partition lineage + metrics)."""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..operators import celljoin, stats, tiling
from ..sources import synth
from .manifest import CheckpointRunner


def run_headline(spark: SparkSession, root: str, n_images: int = 64,
                 aoi_count: int = 16, img_px: int = 64) -> dict:
    """images -> centroids -> cell-PIP join -> zonal agg -> tile pyramid,
    each stage checkpointed. Re-running with the same ``root`` skips
    every completed stage; deleting one stage's manifest recomputes
    exactly that stage (downstream stages reload their checkpoints)."""
    runner = CheckpointRunner(spark, root)
    aois = synth.aoi_table(aoi_count, seed=43)

    images = runner.run(
        "images",
        lambda: synth.image_table_distributed(spark, n_images, seed=42,
                                              h=img_px, w=img_px,
                                              pixel_size=2.0, partitions=8))

    def join_stage():
        cents = images.select(
            "image_id",
            (F.col("gt")[0] + F.col("gt")[1] * F.col("w") / 2).alias("x"),
            (F.col("gt")[3] + F.col("gt")[5] * F.col("h") / 2).alias("y"))
        return celljoin.cell_pip_join(cents, aois, zoom=12)

    joined = runner.run("cell_join", join_stage)

    zonal = runner.run(
        "zonal_stats",
        lambda: stats.zonal_stats(images, aois))

    tiles = runner.run(
        "tiles",
        lambda: tiling.tile_index_manifest(images, mode="local"))

    return {
        "stages": runner.summary(),
        "images": images.count(),
        "join_rows": joined.count(),
        "zones": zonal.count(),
        "tiles": tiles.count(),
    }
