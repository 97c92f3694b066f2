"""Checkpoint manifest: lineage recorded, resume skips complete stages."""

import json
import os

import pandas as pd

from rasters_rs_spark.streaming.manifest import CheckpointRunner


def test_stage_runs_and_resumes(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def make_df():
        calls["n"] += 1
        return spark.createDataFrame(pd.DataFrame({"x": range(100)}))

    r1 = CheckpointRunner(spark, root)
    out1 = r1.run("stage_a", make_df)
    assert out1.count() == 100
    assert calls["n"] == 1

    mf = json.load(open(os.path.join(root, "stage_a", "manifest.json")))
    assert mf["status"] == "complete"
    assert mf["rows"] == 100
    assert mf["bytes"] > 0 and len(mf["files"]) >= 1
    assert sum(f["bytes"] for f in mf["files"]) == mf["bytes"]

    # resume: a fresh runner over the same root must NOT recompute
    r2 = CheckpointRunner(spark, root)
    out2 = r2.run("stage_a", make_df)
    assert calls["n"] == 1
    assert out2.count() == 100
    assert r2.summary()[0]["skipped"] is True


def test_incomplete_stage_reruns(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    calls = {"n": 0}

    def make_df():
        calls["n"] += 1
        return spark.createDataFrame(pd.DataFrame({"x": range(10)}))

    r = CheckpointRunner(spark, root)
    r.run("s", make_df)
    # corrupt the manifest -> stage must rerun (torn write simulation)
    with open(os.path.join(root, "s", "manifest.json"), "w") as f:
        f.write("{not json")
    r2 = CheckpointRunner(spark, root)
    r2.run("s", make_df)
    assert calls["n"] == 2
