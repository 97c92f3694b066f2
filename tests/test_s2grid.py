"""S2-style quad-sphere cell index: faces, round-trip, engine parity."""

import numpy as np
import pandas as pd

from rasters_rs_spark.functions import s2grid


def _lcg_dirs(n: int, seed: int = 77):
    """Deterministic dyadic direction components in (-1, 1), never 0."""
    s = seed
    vals = np.empty(3 * n, dtype=np.float64)
    for i in range(3 * n):
        s = (6364136223846793005 * s + 1442695040888963407) & (2**64 - 1)
        m = (s >> 20) & 0xFFFFF
        vals[i] = (2.0 * m + 1.0) / float(1 << 20) - 1.0
    return vals[:n], vals[n:2 * n], vals[2 * n:]


def test_cell_np_ranges_and_faces():
    vx, vy, vz = _lcg_dirs(6000)
    level = 6
    cells = s2grid.s2_cell_np(vx, vy, vz, level)
    n2 = 1 << (2 * level)
    assert cells.min() >= 0 and cells.max() < 6 * n2
    faces = cells // n2
    assert set(np.unique(faces)) == set(range(6))
    # face really is the largest-|component| axis with matching sign
    comp = np.stack([vx, vy, vz])
    amax = np.abs(comp).argmax(axis=0)
    assert np.array_equal(faces % 3, amax)
    major = np.choose(amax, comp)
    assert np.array_equal(faces >= 3, major < 0)


def test_center_round_trip():
    """A cell's center direction re-indexes to the same cell."""
    vx, vy, vz = _lcg_dirs(800)
    for level in (4, 8):
        cells = s2grid.s2_cell_np(vx, vy, vz, level)
        ctr = s2grid.s2_cell_center_np(np.unique(cells), level)
        back = s2grid.s2_cell_np(ctr[:, 0], ctr[:, 1], ctr[:, 2], level)
        assert np.array_equal(back, np.unique(cells))


def test_scale_invariance():
    vx, vy, vz = _lcg_dirs(1000)
    a = s2grid.s2_cell_np(vx, vy, vz, 7)
    b = s2grid.s2_cell_np(4.0 * vx, 4.0 * vy, 4.0 * vz, 7)
    assert np.array_equal(a, b)


def test_spark_matches_numpy(spark):
    vx, vy, vz = _lcg_dirs(3000)
    pdf = pd.DataFrame({"pid": np.arange(3000, dtype=np.int64),
                        "vx": vx, "vy": vy, "vz": vz})
    got = s2grid.with_s2_cell(spark.createDataFrame(pdf), level=8) \
        .select("pid", "s2_cell").toPandas().sort_values("pid")
    exp = s2grid.s2_cell_np(vx, vy, vz, 8)
    assert np.array_equal(got["s2_cell"].to_numpy(), exp)


def test_sql_mirror_matches_spark(spark):
    import duckdb
    vx, vy, vz = _lcg_dirs(2000)
    pdf = pd.DataFrame({"pid": np.arange(2000, dtype=np.int64),
                        "vx": vx, "vy": vy, "vz": vz})
    got = s2grid.with_s2_cell(spark.createDataFrame(pdf), level=8) \
        .select("pid", "s2_cell").toPandas().sort_values("pid")
    con = duckdb.connect()
    con.register("dirs", pdf)
    sql = s2grid.s2_cell_sql("vx", "vy", "vz", 8, "FROM dirs",
                             extra_cols="pid")
    exp = con.sql(sql + " ORDER BY pid").df()
    assert np.array_equal(got["s2_cell"].to_numpy(),
                          exp["s2_cell"].to_numpy())


def test_hilbert_locality():
    """Consecutive cell ids within a face are adjacent (i, j) cells —
    the range-locality property the tile sink sorts by."""
    level = 5
    n = 1 << level
    ij = np.array([s2grid._hilbert_d2xy(d, level) for d in range(n * n)])
    step = np.abs(np.diff(ij, axis=0)).sum(axis=1)
    assert (step == 1).all()
