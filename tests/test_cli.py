"""CLI smoke tests (subprocess-free: call main() in-process against the
session fixture's JVM via a fresh getOrCreate)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from rasters_rs_spark import cli
from rasters_rs_spark.sources import synth


@pytest.fixture(scope="module")
def img_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "imgs")
    spark.createDataFrame(synth.image_table(4, seed=77, h=32, w=32,
                                            fmt_cycle=("raw",))) \
         .write.mode("overwrite").parquet(p)
    return p


def _run(capsys, argv):
    cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_stats(capsys, img_path):
    rows = _run(capsys, ["--cores", "4", "stats", img_path])
    assert rows[0]["count"] == 4 * 32 * 32


def test_cli_tile_and_mask(capsys, img_path, tmp_path):
    out = _run(capsys, ["--cores", "4", "tile", img_path, str(tmp_path / "t"),
                        "--min-zoom", "15"])
    assert out["tiles"] > 0
    assert os.path.exists(str(tmp_path / "t" / "index.json"))
    out = _run(capsys, ["--cores", "4", "mask", img_path, str(tmp_path / "m")])
    assert "written" in out


def test_cli_diff_and_resample(capsys, img_path, tmp_path):
    row = _run(capsys, ["--cores", "4", "diff", img_path, img_path])
    assert row["count"] == 4 * 32 * 32  # self-diff pairs every pixel
    assert abs(row["diff_sum"]) < 1e-9
    out = _run(capsys, ["--cores", "4", "resample", img_path,
                        str(tmp_path / "r"), "--gt"] +
               "0 2 0 64 0 -2".split() +
               ["--width", "16", "--height", "16", "--method", "bilinear"])
    assert "written" in out


def test_cli_diff_hist_cbor_artifact(capsys, img_path, tmp_path):
    """S10: the --hist artifact is also written as CBOR (reference
    write_bin); read_bin round-trips to the printed JSON dict."""
    from rasters_rs_spark.functions.cbor import read_bin
    bin_path = str(tmp_path / "hist.cbor")
    hist = _run(capsys, ["--cores", "4", "diff", img_path, img_path,
                         "--hist", "-1", "1", "8", "--bin", bin_path])
    assert os.path.exists(bin_path)
    assert read_bin(bin_path) == hist


def test_cli_validate_and_augment(capsys, img_path, tmp_path):
    out = _run(capsys, ["--cores", "4", "augment", img_path,
                        str(tmp_path / "aug"), "--op", "fliph"])
    assert out["op"] == "fliph"
    # fliph is lossless on raw: flipped-vs-flipped... validate original
    # against the written augmentation of the augmentation (identity)
    out2 = _run(capsys, ["--cores", "4", "augment", str(tmp_path / "aug"),
                         str(tmp_path / "aug2"), "--op", "fliph"])
    res = _run(capsys, ["--cores", "4", "validate", img_path,
                        str(tmp_path / "aug2")])
    assert res["rows"] == 4 and res["failures"] == 0


def test_cli_fill_and_chunk(capsys, img_path, tmp_path, spark):
    pts = synth.points_table(30, seed=5, extent=(-2000, -2000, 2000, 2000))
    ppath = str(tmp_path / "pts.parquet")
    pts.to_parquet(ppath)
    out = _run(capsys, ["--cores", "4", "fill", img_path, ppath,
                        str(tmp_path / "f"), "--fill-nan"])
    assert out["filled"] >= 0
    out = _run(capsys, ["--cores", "4", "chunk", img_path, str(tmp_path / "c"),
                        "-c", "256"])
    assert "written" in out


def test_cli_mosaic(capsys, tmp_path, spark):
    from rasters_rs_spark.functions import codecs
    a = np.full((4, 4), 2.0)
    b = np.full((4, 4), 6.0)
    rows = [
        {"image_id": "a", "bytes": codecs.encode_raw(a), "w": 4, "h": 4,
         "fmt": "raw", "gt": [0.0, 1.0, 0.0, 4.0, 0.0, -1.0],
         "crs": "IDENTITY", "no_val": float("nan")},
        {"image_id": "b", "bytes": codecs.encode_raw(b), "w": 4, "h": 4,
         "fmt": "raw", "gt": [2.0, 1.0, 0.0, 4.0, 0.0, -1.0],
         "crs": "IDENTITY", "no_val": float("nan")},
    ]
    src = str(tmp_path / "mosrc")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    dst = str(tmp_path / "modst")
    res = _run(capsys, ["mosaic", src, dst, "--gt", "0", "1", "0", "4",
                        "0", "-1", "--width", "6", "--height", "4"])
    assert res["representation"] == "image"
    out = spark.read.parquet(dst).collect()[0]
    got = codecs.decode_raw(bytes(out["bytes"]), 4, 6)
    assert np.allclose(got[:, 2:4], 4.0)       # overlap mean

    dst2 = str(tmp_path / "motiles")
    res2 = _run(capsys, ["mosaic", src, dst2, "--gt", "0", "1", "0", "4",
                         "0", "-1", "--width", "6", "--height", "4",
                         "--tiles", "--tile-width", "4"])
    assert res2["representation"] == "tiles"
    assert spark.read.parquet(dst2).count() > 1


def test_cli_dedup(capsys, tmp_path, spark):
    docs = pd.DataFrame({
        "doc_id": ["a1", "a2", "b1", "c1"],
        "text": ["the quick brown fox jumps over the lazy dog today",
                 "the quick brown fox jumps over the lazy dog today",
                 "an entirely different document about spark pipelines",
                 "yet another unrelated text with its own words here"],
    })
    src = str(tmp_path / "ddsrc")
    spark.createDataFrame(docs).write.parquet(src)
    dst = str(tmp_path / "dddst")
    kept = str(tmp_path / "ddkeep")
    res = _run(capsys, ["dedup", src, dst, "--threshold", "0.8",
                        "--keep", kept])
    assert res["pairs"] == 1 and res["kept_rows"] == 3
    pair = spark.read.parquet(dst).collect()[0]
    assert (pair["id_a"], pair["id_b"]) == ("a1", "a2")
    assert "a2" not in {r["doc_id"]
                        for r in spark.read.parquet(kept).collect()}


def test_cli_focal(capsys, img_path, tmp_path, spark):
    dst = str(tmp_path / "hs")
    res = _run(capsys, ["focal", img_path, dst, "--op", "hillshade"])
    assert res["op"] == "hillshade"
    out = spark.read.parquet(dst)
    assert out.count() == 4
    r = out.collect()[0]
    from rasters_rs_spark.functions import codecs as CC
    block = CC.decode_raw(bytes(r["bytes"]), r["h"], r["w"])
    interior = block[1:-1, 1:-1]
    assert np.isfinite(interior).all()
    assert (interior >= 0).all() and (interior <= 255).all()


def test_cli_rasterize(capsys, tmp_path, spark):
    aois = pd.DataFrame([
        {"aoi_id": "a", "ring_offsets": [0],
         "xs": [0.3, 7.7, 7.7, 0.3], "ys": [0.3, 0.3, 7.7, 7.7]},
    ])
    asrc = str(tmp_path / "rz_aois")
    aois.to_parquet(asrc)
    dst = str(tmp_path / "rz_out")
    res = _run(capsys, ["rasterize", asrc, dst, "--gt", "0", "1", "0",
                        "8", "0", "-1", "--width", "8", "--height", "8"])
    assert res["representation"] == "image"
    from rasters_rs_spark.functions import codecs as CC
    r = spark.read.parquet(dst).collect()[0]
    block = CC.decode_raw(bytes(r["bytes"]), 8, 8)
    assert np.nansum(block == 0.0) == 64 - np.isnan(block).sum()
    assert (~np.isnan(block)).sum() > 0


def test_cli_fill_barycentric(capsys, tmp_path, spark):
    import numpy as np
    import pandas as pd
    from rasters_rs_spark.functions import codecs
    from rasters_rs_spark.sources import synth

    field = lambda x, y: 2.0 + 0.3 * x + 0.7 * y
    block = field(np.arange(16) + 0.5, (16.0 - np.arange(16) - 0.5)[:, None])
    block = np.ascontiguousarray(block)
    block[6:8, 6:8] = -999.0
    src = str(tmp_path / "img.parquet")
    pd.DataFrame([{
        "image_id": "c0", "bytes": codecs.encode_raw(block),
        "w": 16, "h": 16, "fmt": "raw",
        "gt": [0.0, 1.0, 0.0, 16.0, 0.0, -1.0],
        "crs": "IDENTITY", "no_val": -999.0}]).to_parquet(src)
    rng = np.random.default_rng(3)
    px = rng.random(120) * 20.0 - 2.0
    py = rng.random(120) * 20.0 - 2.0
    ptsp = str(tmp_path / "pts.parquet")
    pd.DataFrame({"pt_id": [f"p{i}" for i in range(120)],
                  "x": px, "y": py,
                  "z": field(px, py)}).to_parquet(ptsp)
    dst = str(tmp_path / "filled")
    res = _run(capsys, ["fill", src, ptsp, dst, "--method", "barycentric"])
    assert res["filled"] == 4
    out = pd.read_parquet(dst)
    got = codecs.decode_raw(out.iloc[0]["bytes"], 16, 16)
    ii, jj = np.nonzero(block == -999.0)
    assert np.abs(got[ii, jj] - field(jj + 0.5, 16.0 - ii - 0.5)).max() < 1e-9

    # sibson-c1 (the reference raster-fill-nn default): linear field
    # stays exact through the C1 blend
    dst2 = str(tmp_path / "filled_c1")
    res2 = _run(capsys, ["fill", src, ptsp, dst2, "--method", "sibson-c1"])
    assert res2["filled"] == 4
    got2 = codecs.decode_raw(pd.read_parquet(dst2).iloc[0]["bytes"], 16, 16)
    assert np.abs(got2[ii, jj] - field(jj + 0.5, 16.0 - ii - 0.5)).max() < 1e-7


def test_cli_stats_distributed_aois(capsys, tmp_path, spark):
    import pandas as pd
    from rasters_rs_spark.sources import synth

    src = str(tmp_path / "imgs.parquet")
    synth.lcg_image_table(4, 32, 32, pixel_size=2.0,
                          spacing=64.0, grid_cols=2).to_parquet(src)
    aois = synth.aoi_table(6, seed=16,
                           extent=(-1020.0, 850.0, -850.0, 1010.0))
    ap = str(tmp_path / "aois.parquet")
    aois[["aoi_id", "ring_offsets", "xs", "ys"]].to_parquet(ap)
    a = _run(capsys, ["stats", src, "--polygons", ap])
    b = _run(capsys, ["stats", src, "--polygons", ap, "--distributed-aois"])
    assert a == b and len(a) >= 1


def test_cli_rasterize_distributed_aois(capsys, tmp_path, spark):
    """--distributed-aois burns byte-identical output to the pandas
    path for a unique-id catalog."""
    from rasters_rs_spark.sources import synth
    aois = synth.aoi_table(6, seed=10)
    asrc = str(tmp_path / "rz_aois")
    aois[["aoi_id", "ring_offsets", "xs", "ys"]].to_parquet(asrc)
    args = ["rasterize", asrc, "", "--gt", "-800", "8", "0", "800", "0",
            "-8", "--width", "128", "--height", "128"]
    a_dst = str(tmp_path / "rz_a")
    b_dst = str(tmp_path / "rz_b")
    args[2] = a_dst
    _run(capsys, args)
    args[2] = b_dst
    _run(capsys, args + ["--distributed-aois"])
    ra = spark.read.parquet(a_dst).collect()[0]
    rb = spark.read.parquet(b_dst).collect()[0]
    assert bytes(ra["bytes"]) == bytes(rb["bytes"])


def test_cli_tokenize_pack_sample(tmp_path):
    """The round-5 text subcommands end to end: tokenize (counts and
    stream), pack, sample — parquet in, parquet + one-line JSON out."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src = str(tmp_path / "docs.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the theme of things", "row row row", "standing by", "x"],
        "lang": ["en", "en", "es", "de"],
    }).to_parquet(src)

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "rasters_rs_spark.cli", "--cores", "2",
             *args], capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = run("tokenize", src, str(tmp_path / "tok.parquet"),
              "--counts-only")
    assert out["docs"] == 4 and out["mode"] == "counts"
    out = run("pack", src, str(tmp_path / "pack.parquet"), "--budget", "4")
    assert out["docs"] == 4 and out["tokens"] == 10 and out["sequences"] == 3
    out = run("sample", src, str(tmp_path / "samp.parquet"),
              "--stratum", "en=1.0", "--default", "0.0")
    assert out["kept"] == 2


def test_cli_decon_and_ann(tmp_path):
    """The decon and ann subcommands end to end."""
    import json
    import subprocess
    import sys

    import pandas as pd

    bench = "the quick brown fox jumps over the lazy dog tonight"
    src = str(tmp_path / "docs.parquet")
    pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x " + bench + " y", "clean unrelated content here"],
    }).to_parquet(src)
    tsrc = str(tmp_path / "tests.parquet")
    pd.DataFrame({"doc_id": [100], "text": [bench]}).to_parquet(tsrc)

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "rasters_rs_spark.cli", "--cores", "2",
             *args], capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = run("decon", src, tsrc, str(tmp_path / "flag.parquet"),
              "--keep", str(tmp_path / "kept.parquet"))
    assert out["flagged_pairs"] == 1 and out["kept_rows"] == 1

    import numpy as np
    rng = np.random.default_rng(5)
    esrc = str(tmp_path / "emb.parquet")
    pd.DataFrame({
        "vec_id": list(range(40)),
        "embedding": [rng.random(64).tolist() for _ in range(40)],
    }).to_parquet(esrc)
    qsrc = str(tmp_path / "q.parquet")
    pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [rng.random(64).tolist() for _ in range(2)],
    }).to_parquet(qsrc)
    out = run("ann", esrc, qsrc, str(tmp_path / "nn.parquet"),
              "--method", "pq", "--k", "3")
    assert out["rows"] == 6 and out["method"] == "pq"


def test_cli_spanrm(tmp_path):
    """spanrm end to end: cross-doc duplicated boilerplate leaves only
    the canonical copy; --within-doc also collapses internal runs;
    non-text columns ride through."""
    import json
    import subprocess
    import sys

    import pandas as pd

    boiler = "SHARED BOILERPLATE SEGMENT HERE!"
    src = str(tmp_path / "docs.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["aa " + boiler + " bb", "cc " + boiler + " dd",
                 "unique and unrepeated content entirely"],
        "lang": ["en", "en", "de"],
    }).to_parquet(src)

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "rasters_rs_spark.cli", "--cores", "2",
             *args], capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    dst = str(tmp_path / "clean.parquet")
    out = run("spanrm", src, dst)
    assert out["docs"] == 3 and out["spans_removed"] == 1
    got = pd.read_parquet(dst).set_index("doc_id")
    assert boiler in got.loc[1, "text"] and boiler not in got.loc[2, "text"]
    assert set(got.columns) >= {"text", "lang"}

    src2 = str(tmp_path / "docs2.parquet")
    pd.DataFrame({"doc_id": [1], "text": ["xyzw" * 10]}).to_parquet(src2)
    out = run("spanrm", src2, str(tmp_path / "clean2.parquet"),
              "--within-doc")
    assert out["spans_removed"] == 1 and out["chars_removed"] == 36


def test_cli_search(tmp_path):
    """BM25 search subcommand end to end."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src = str(tmp_path / "docs.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox", "lazy dog sleeps", "fox and dog"],
    }).to_parquet(src)
    qsrc = str(tmp_path / "q.parquet")
    pd.DataFrame({"q_id": [10], "q_text": ["fox"]}).to_parquet(qsrc)

    r = subprocess.run(
        [sys.executable, "-m", "rasters_rs_spark.cli", "--cores", "2",
         "search", src, qsrc, str(tmp_path / "hits.parquet"), "--k", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 2
    hits = pd.read_parquet(str(tmp_path / "hits.parquet"))
    assert set(hits["doc_id"]) == {1, 3}


def test_cli_polygonize_and_contour(capsys, tmp_path, spark):
    src = str(tmp_path / "blocky")
    spark.createDataFrame(synth.blocky_lcg_image_table(2, 32, 32)) \
         .write.mode("overwrite").parquet(src)

    dst = str(tmp_path / "pz")
    res = _run(capsys, ["polygonize", src, dst, "--classes", "4"])
    assert res["regions"] > 0
    whole = {tuple(r) for r in spark.read.parquet(dst).collect()}

    dst2 = str(tmp_path / "pzc")
    res2 = _run(capsys, ["polygonize", src, dst2, "--classes", "4",
                         "--chunked", "--strip-height", "8"])
    assert res2["regions"] == res["regions"]
    assert {tuple(r) for r in spark.read.parquet(dst2).collect()} == whole

    csrc = str(tmp_path / "rad")
    spark.createDataFrame(synth.radial_image_table(1, 32, 32)) \
         .write.mode("overwrite").parquet(csrc)
    cdst = str(tmp_path / "cells")
    rc = _run(capsys, ["contour", csrc, cdst, "--level", "0.25"])
    assert rc["representation"] == "cells" and rc["rows"] == 31 * 31
    ldst = str(tmp_path / "lines")
    rl = _run(capsys, ["contour", csrc, ldst, "--level", "0.25",
                       "--lines"])
    assert rl["representation"] == "polylines" and rl["rows"] == 1
    row = spark.read.parquet(ldst).collect()[0]
    assert row["closed"] and row["n_points"] > 40


def test_cli_quality_and_passages(capsys, tmp_path, spark):
    src = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .write.mode("overwrite").parquet(src)

    g = _run(capsys, ["quality", src, str(tmp_path / "gq"),
                      "--ruleset", "gopher", "--min-words", "5"])
    assert g["input_docs"] == 502 or g["input_docs"] == 500
    assert 0 <= g["kept"] <= g["input_docs"]
    out = spark.read.parquet(str(tmp_path / "gq"))
    assert "ok_stop" in out.columns

    c = _run(capsys, ["quality", src, str(tmp_path / "c4"),
                      "--ruleset", "c4", "--keep-only"])
    assert c["kept"] == spark.read.parquet(str(tmp_path / "c4")).count()

    p = _run(capsys, ["passages", src, str(tmp_path / "pp"),
                      "--window", "24", "--stride", "16"])
    assert p["passages"] >= 500
