"""Hex cell index: axial assignment, k-ring, binning, Voronoi property."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from rasters_rs_spark.functions import hexgrid


def _lcg_points(n: int, lo: float, hi: float, seed: int = 0x5e1f):
    """Deterministic dyadic-grid points (exact doubles)."""
    s = seed
    out = np.empty((2, n), dtype=np.float64)
    vals = np.empty(2 * n, dtype=np.float64)
    for i in range(2 * n):
        s = (6364136223846793005 * s + 1442695040888963407) & (2**64 - 1)
        vals[i] = float((s >> 20) & 0xFFFFF) / float(1 << 20)
    out[0] = lo + (hi - lo) * vals[:n]
    out[1] = lo + (hi - lo) * vals[n:]
    return out[0], out[1]


def test_cell_np_voronoi_property():
    """The assigned cell's center is the nearest hex center — checked
    against the cell's full 1-ring (the only possible competitors)."""
    x, y = _lcg_points(2000, -9000.0, 9000.0)
    size = 250.0
    q, r = hexgrid.hex_cell_np(x, y, size)
    cx, cy = hexgrid.hex_center_np(q, r, size)
    d_own = np.hypot(x - cx, y - cy)
    # max center distance inside a hexagon is the circumradius (= size:
    # center -> corner); all points fall inside their assigned hexagon
    assert np.all(d_own <= size + 1e-9)
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx, ny = hexgrid.hex_center_np(q + dq, r + dr, size)
        d_nb = np.hypot(x - nx, y - ny)
        assert np.all(d_own <= d_nb + 1e-9)


def test_center_round_trip():
    qs = np.arange(-50, 50, dtype=np.int64)
    rs = (qs * 7 % 23) - 11
    cx, cy = hexgrid.hex_center_np(qs, rs, 123.0)
    q2, r2 = hexgrid.hex_cell_np(cx, cy, 123.0)
    assert np.array_equal(q2, qs) and np.array_equal(r2, rs)


def test_spark_matches_numpy(spark):
    x, y = _lcg_points(3000, -9000.0, 9000.0)
    pdf = pd.DataFrame({"pid": np.arange(3000), "x": x, "y": y})
    df = hexgrid.with_hex_cell(spark.createDataFrame(pdf), size=250.0)
    got = df.select("pid", "hq", "hr").toPandas().sort_values("pid")
    q, r = hexgrid.hex_cell_np(x, y, 250.0)
    assert np.array_equal(got["hq"].to_numpy(), q)
    assert np.array_equal(got["hr"].to_numpy(), r)


def test_kring_explode_counts_and_rings(spark):
    df = spark.createDataFrame(pd.DataFrame({"hq": [3, -2], "hr": [-1, 5]}))
    for k in (1, 2, 3):
        ring = hexgrid.kring_explode(df, k=k).toPandas()
        assert len(ring) == 2 * (1 + 3 * k * (k + 1))
        for _, g in ring.groupby(["hq", "hr"]):
            assert len(g) == len(g[["nq", "nr"]].drop_duplicates())
            dq = g["nq"] - g["hq"]
            dr = g["nr"] - g["hr"]
            dist = (dq.abs() + dr.abs() + (dq + dr).abs()) // 2
            assert (g["ring"].to_numpy() == dist.to_numpy()).all()
            assert g["ring"].max() == k
            # ring sizes: 1 at ring 0, 6k at ring k
            sizes = g.groupby("ring").size()
            assert sizes[0] == 1
            for kk in range(1, k + 1):
                assert sizes[kk] == 6 * kk


def test_hex_bin_stats_matches_pandas(spark):
    x, y = _lcg_points(4000, -9000.0, 9000.0)
    val = np.round(np.abs(x) * 0.01, 2)
    pdf = pd.DataFrame({"x": x, "y": y, "value": val})
    got = hexgrid.hex_bin_stats(spark.createDataFrame(pdf), size=500.0) \
        .toPandas().sort_values(["hq", "hr"]).reset_index(drop=True)
    q, r = hexgrid.hex_cell_np(x, y, 500.0)
    exp = pd.DataFrame({"hq": q, "hr": r, "value": val}) \
        .groupby(["hq", "hr"], as_index=False) \
        .agg(n=("value", "size"), sum_value=("value", "sum")) \
        .sort_values(["hq", "hr"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.array_equal(got["n"].to_numpy(), exp["n"].to_numpy())
    assert np.allclose(got["sum_value"], exp["sum_value"], atol=1e-9)


def test_hex_kring_join_matches_brute_force(spark):
    x, y = _lcg_points(1500, -9000.0, 9000.0)
    size, k = 400.0, 2
    pts = pd.DataFrame({"x": x, "y": y})
    q, r = hexgrid.hex_cell_np(x, y, size)
    # queries: cells of the first 5 points
    queries = pd.DataFrame({"hq": q[:5], "hr": r[:5]}).drop_duplicates()
    got = hexgrid.hex_kring_join(
        spark.createDataFrame(queries),
        spark.createDataFrame(pts), size=size, k=k) \
        .toPandas().sort_values(["hq", "hr", "ring"]).reset_index(drop=True)
    rows = []
    for _, qq in queries.iterrows():
        dq = q - qq["hq"]
        dr = r - qq["hr"]
        dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
        for ring in range(k + 1):
            n = int((dist == ring).sum())
            if n:
                rows.append((qq["hq"], qq["hr"], ring, n))
    exp = pd.DataFrame(rows, columns=["hq", "hr", "ring", "n"]) \
        .sort_values(["hq", "hr", "ring"]).reset_index(drop=True)
    assert got.astype("int64").equals(exp.astype("int64"))


def test_sql_mirror_matches_spark(spark):
    """hex_cell_sql through DuckDB bit-matches the Catalyst assignment."""
    import duckdb
    x, y = _lcg_points(2500, -9000.0, 9000.0)
    pdf = pd.DataFrame({"pid": np.arange(2500, dtype=np.int64),
                        "x": x, "y": y})
    got = hexgrid.with_hex_cell(spark.createDataFrame(pdf), size=333.0) \
        .select("pid", "hq", "hr").toPandas().sort_values("pid")
    con = duckdb.connect()
    con.register("pts", pdf)
    sql = hexgrid.hex_cell_sql("x", "y", 333.0, "FROM pts",
                               extra_cols="pid")
    exp = con.sql(sql + " ORDER BY pid").df()
    assert np.array_equal(got["hq"].to_numpy(), exp["hq"].to_numpy())
    assert np.array_equal(got["hr"].to_numpy(), exp["hr"].to_numpy())


def test_hex_polyfill_matches_brute_force(spark):
    """Polyfill == brute-force lattice enumeration + the numpy winding
    PIP over cell centers (even-odd equals winding for simple
    polygons), across rect / triangle / concave shapes and two cell
    sizes; centers match hex_center_np bitwise."""
    import numpy as np

    from rasters_rs_spark.functions import geom, hexgrid as H

    shapes = [
        ("rect", [-900.5, -400.5, -400.5, -900.5],
                 [600.5, 600.5, 950.25, 950.25]),
        ("tri", [-1000.0, -600.0, -800.0], [100.0, 120.0, 500.0]),
        ("concave", [-300.0, 0.0, 0.0, -150.0, -300.0],
                    [0.0, 0.0, 300.0, 100.0, 300.0]),
    ]
    aois = spark.createDataFrame(shapes, ["aoi_id", "xs", "ys"])
    for s in (37.5, 80.0):
        rows = H.hex_polyfill(aois, size=s).collect()
        got = {}
        for r in rows:
            got.setdefault(r["aoi_id"], set()).add((r["hq"], r["hr"]))
            cx, cy = H.hex_center_np(np.array([r["hq"]]),
                                     np.array([r["hr"]]), s)
            assert r["cx"] == cx[0] and r["cy"] == cy[0]
        for (aid, xs, ys) in shapes:
            xs, ys = np.array(xs), np.array(ys)
            want = set()
            r_lo = int(np.floor(ys.min() / (1.5 * s))) - 2
            r_hi = int(np.floor(ys.max() / (1.5 * s))) + 3
            for hr in range(r_lo, r_hi):
                q_lo = int(np.floor(xs.min() / (np.sqrt(3) * s)
                                    - hr / 2)) - 2
                q_hi = int(np.floor(xs.max() / (np.sqrt(3) * s)
                                    - hr / 2)) + 3
                for hq in range(q_lo, q_hi):
                    cx, cy = H.hex_center_np(np.array([hq]),
                                             np.array([hr]), s)
                    if geom.points_in_rings(cx, cy, np.array([0]),
                                            xs, ys)[0]:
                        want.add((hq, hr))
            assert got.get(aid, set()) == want, (aid, s)


def test_hex_polyfill_partition_property(spark):
    """Polyfill of two disjoint polygons assigns disjoint interior
    points: a dense sample of points strictly inside each polygon maps
    (hex_cell_np) only to cells polyfill found for SOME polygon when
    the point's own cell-center is inside — i.e. polyfill is exactly
    the center-containment partition, no more, no less (verified via
    the brute-force equality above; here we assert no cell is claimed
    by both disjoint AOIs)."""
    from rasters_rs_spark.functions import hexgrid as H

    aois = spark.createDataFrame([
        ("a", [0.0, 500.0, 500.0, 0.0], [0.0, 0.0, 400.0, 400.0]),
        ("b", [700.0, 1200.0, 1200.0, 700.0], [0.0, 0.0, 400.0, 400.0]),
    ], ["aoi_id", "xs", "ys"])
    rows = H.hex_polyfill(aois, size=30.0).collect()
    a = {(r["hq"], r["hr"]) for r in rows if r["aoi_id"] == "a"}
    b = {(r["hq"], r["hr"]) for r in rows if r["aoi_id"] == "b"}
    assert a and b and not (a & b)


def test_hex_polyfill_plan_no_shuffle_no_udf(spark):
    """Polyfill is a generator + filter stage over the AOI table: no
    Exchange, no python workers (pure Catalyst higher-order exprs)."""
    aois = spark.createDataFrame(
        [("a", [0.0, 100.0, 50.0], [0.0, 0.0, 90.0])],
        ["aoi_id", "xs", "ys"])
    from rasters_rs_spark.functions import hexgrid as H
    plan = H.hex_polyfill(aois, size=30.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_hex_hotspots_python_reference_and_planted_hotspot(spark):
    """Gi* against a direct python computation over the binned cells,
    plus sanity: a planted high-value cluster scores the top z."""
    import math

    import numpy as np

    from rasters_rs_spark.functions import hexgrid as H

    rows = []
    rng = np.random.default_rng(9)
    # uniform low-value field + one hot cluster near (5000, 5000)
    for i in range(400):
        rows.append((float(rng.uniform(-8000, 8000)),
                     float(rng.uniform(-8000, 8000)), 1.0))
    for i in range(80):
        rows.append((5000.0 + float(rng.uniform(-400, 400)),
                     5000.0 + float(rng.uniform(-400, 400)), 50.0))
    pts = spark.createDataFrame(rows, ["x", "y", "value"])
    out = H.hex_hotspots(pts, size=500.0, k=1).collect()
    cells = {(r["hq"], r["hr"]): r for r in out}

    # python reference over the same binning
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    vs = np.array([r[2] for r in rows])
    hq, hr = H.hex_cell_np(xs, ys, 500.0)
    agg = {}
    for q, r, v in zip(hq, hr, vs):
        agg[(q, r)] = agg.get((q, r), 0.0) + v
    n = len(agg)
    vals = np.array(list(agg.values()))
    xbar = vals.sum() / n
    s = math.sqrt((vals ** 2).sum() / n - xbar * xbar)
    for (q, r), rec in cells.items():
        nb = [v for (q2, r2), v in agg.items()
              if (abs(q - q2) + abs(r - r2) + abs(q + r - q2 - r2)) / 2
              <= 1]
        w = len(nb)
        denom = s * math.sqrt((n * w - w * w) / (n - 1))
        want = (sum(nb) - xbar * w) / denom
        assert abs(rec["gi_z"] - want) < 1e-9, (q, r)
    # the hot cluster's cell has the maximum z and it is large
    top = max(out, key=lambda r: r["gi_z"] or -1e9)
    tq, tr = H.hex_cell_np(np.array([5000.0]), np.array([5000.0]), 500.0)
    assert (abs(top["hq"] - tq[0]) + abs(top["hr"] - tr[0])) <= 2
    assert top["gi_z"] > 5.0


def test_hex_hotspots_degenerate_null_z(spark):
    """All cell values equal -> S == 0 -> every z NULL; single cell ->
    N == 1 -> NULL."""
    from rasters_rs_spark.functions import hexgrid as H

    pts = spark.createDataFrame(
        [(x * 2000.0, 0.0, 3.0) for x in range(5)], ["x", "y", "value"])
    out = H.hex_hotspots(pts, size=500.0, k=1).collect()
    assert len(out) == 5 and all(r["gi_z"] is None for r in out)
    one = spark.createDataFrame([(0.0, 0.0, 1.0)], ["x", "y", "value"])
    r = H.hex_hotspots(one, size=500.0, k=1).collect()[0]
    assert r["gi_z"] is None


def test_hex_density_clusters_planted_blobs(spark):
    """Two planted dense blobs + sparse noise: exactly two clusters,
    each containing its blob's cells; noise cells below min_count are
    dropped; totals add up."""
    import numpy as np

    from rasters_rs_spark.functions import hexgrid as H

    rng = np.random.default_rng(21)
    rows = []
    for cx, cy in ((0.0, 0.0), (20000.0, 0.0)):
        for _ in range(400):
            rows.append((cx + float(rng.uniform(-1200, 1200)),
                         cy + float(rng.uniform(-1200, 1200))))
    for _ in range(60):   # sparse noise, far away
        rows.append((float(rng.uniform(-80000, -40000)),
                     float(rng.uniform(40000, 80000))))
    pts = spark.createDataFrame([(x, y, 1.0) for x, y in rows],
                                ["x", "y", "value"])
    out = H.hex_density_clusters(pts, size=500.0, min_count=10).collect()
    clusters = {}
    for r in out:
        clusters.setdefault((r["cluster_q"], r["cluster_r"]),
                            []).append(r)
    assert len(clusters) == 2
    for cid, cells in clusters.items():
        sizes = {(c["cluster_size_cells"], c["cluster_n_points"])
                 for c in cells}
        assert len(sizes) == 1
        sz_cells, sz_pts = next(iter(sizes))
        assert sz_cells == len(cells)
        assert sz_pts == sum(c["n"] for c in cells)
        # canonical id is the lexicographic min member
        assert cid == min((c["hq"], c["hr"]) for c in cells)
    # blob separation: the two clusters' x-extents don't overlap
    cents = sorted(H.hex_center_np(
        np.array([c[0] for c in clusters]),
        np.array([c[1] for c in clusters]), 500.0)[0])
    assert cents[1] - cents[0] > 10000


def test_hex_density_clusters_iterative_path_equal(spark):
    """cap=0 forces the distributed iterative components (higher
    max_iters); results identical to the driver union-find path."""
    import numpy as np

    from rasters_rs_spark.functions import hexgrid as H

    rng = np.random.default_rng(4)
    rows = [(float(rng.uniform(-6000, 6000)),
             float(rng.uniform(-6000, 6000)), 1.0) for _ in range(2000)]
    pts = spark.createDataFrame(rows, ["x", "y", "value"])
    a = sorted(tuple(r) for r in H.hex_density_clusters(
        pts, size=500.0, min_count=3).collect())
    b = sorted(tuple(r) for r in H.hex_density_clusters(
        pts, size=500.0, min_count=3, driver_graph_cap=0,
        max_iters=60).collect())
    assert a == b and len(a) > 10
