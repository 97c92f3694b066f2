"""CLIP-style caption<->image alignment gate tests.

The deterministic grid-token embedders are the test double for a real
CLIP pair (see multimodal.clip_score_filter); the fixture plants three
exact score classes (1.0 / 0.0 / 0.5 — synth.clip_caption_table) so
the gate's accept/reject behavior is pinned, not just its plumbing.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_rs_spark.operators import multimodal as MM
from rasters_rs_spark.sources import synth


@pytest.fixture(scope="module")
def clip_df(spark):
    return spark.createDataFrame(synth.clip_caption_table(24)).cache()


def test_clip_gate_planted_classes(clip_df):
    rows = {r.image_id: r for r in
            MM.clip_score_filter(clip_df, threshold=0.75).collect()}
    assert len(rows) == 24
    for m in range(24):
        r = rows[f"img_{m:08d}"]
        if m % 4 in (0, 1):
            assert r.clip_score == 1.0 and r.keep
        elif m % 4 == 2:
            assert r.clip_score == 0.0 and not r.keep
        else:
            assert r.clip_score == 0.5 and not r.keep


def test_clip_gate_threshold_is_inclusive(clip_df):
    rows = MM.clip_score_filter(clip_df, threshold=0.5).collect()
    # half-corrupted rows score exactly 0.5 -> kept at threshold 0.5
    kept = sum(r.keep for r in rows)
    assert kept == 18  # 12 aligned + 6 half-corrupted of 24


def test_clip_gate_external_embeddings_path(clip_df, spark):
    """The real-model injection point: precomputed embedding tables
    through the join path give identical scores to the fused path."""
    img = MM.image_grid_embedding(clip_df)
    cap = MM.caption_token_embedding(
        clip_df.select("image_id", "caption")).select("image_id", "cap_emb")
    ext = MM.clip_score_filter(clip_df, threshold=0.75,
                               image_embeddings=img,
                               caption_embeddings=cap)
    fused = MM.clip_score_filter(clip_df, threshold=0.75)
    a = sorted((r.image_id, r.clip_score, r.keep) for r in ext.collect())
    b = sorted((r.image_id, r.clip_score, r.keep) for r in fused.collect())
    assert a == b


def test_clip_gate_zero_norm_sides(spark):
    """Unparseable caption and all-no-data image both score 0.0
    instead of NULL/throwing (ANSI divide-by-zero is the trap)."""
    pdf = synth.clip_caption_table(4)
    pdf.loc[0, "caption"] = "completely unrelated words"
    df = spark.createDataFrame(pdf)
    rows = {r.image_id: r for r in MM.clip_score_filter(df).collect()}
    assert rows["img_00000000"].clip_score == 0.0
    assert not rows["img_00000000"].keep


def test_clip_gate_fused_plan_has_no_shuffle(clip_df):
    """The default path must stay one-scan / zero-exchange: a per-row
    gate that shuffles would be wrong at 100 TB."""
    plan = MM.clip_score_filter(clip_df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_image_grid_embedding_matches_numpy(clip_df):
    """Embedding one-hots equal the direct numpy quantization."""
    out = {r.image_id: np.array(r.img_emb)
           for r in MM.image_grid_embedding(clip_df).collect()}
    h = w = 32
    for m in (0, 3, 7):
        k0 = m * h * w
        block = synth.lcg_values(
            k0 + np.arange(h * w, dtype=np.int64)).reshape(h, w)
        means = block.reshape(4, 8, 4, 8).mean(axis=(1, 3))
        ks = (means * 8 * 64).astype(np.int64) % 8
        exp = np.zeros(128)
        for ci in range(4):
            for cj in range(4):
                exp[(ci * 4 + cj) * 8 + ks[ci, cj]] = 1.0
        assert np.array_equal(out[f"img_{m:08d}"], exp)
