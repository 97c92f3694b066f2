"""Memory-bandwidth scaling probe (no Spark): evidence for the 8->32
core efficiency ceiling in BENCH/BASELINE.md.

N worker processes each stream a triad-style numpy kernel
(c = a + s*b over 64 MB arrays, the same read/write mix as the tiling
pipeline's array traffic). Aggregate GB/s vs N shows where the single
socket's memory bus saturates — if aggregate bandwidth stops growing
between 8 and 32 workers, the pipeline's 8->32 efficiency is a
hardware ceiling, not an engine property.

Usage: python tools/membw_probe.py [workers ...]  (default 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 64
REPS = 8


def worker(out_q):
    n = ARR_MB * 1024 * 1024 // 8
    a = np.random.default_rng(1).random(n)
    b = np.random.default_rng(2).random(n)
    c = np.empty(n)
    # warm
    np.add(a, b, out=c)
    t0 = time.time()
    for _ in range(REPS):
        np.multiply(b, 1.000001, out=c)
        np.add(c, a, out=c)
    dt = time.time() - t0
    # bytes moved per rep: read a + read b + write c (x2 kernels ~ 5 arrays)
    gb = REPS * 5 * n * 8 / 1e9
    out_q.put(gb / dt)


def run(nworkers: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(nworkers)]
    t0 = time.time()
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    del t0
    return sum(rates)


def main():
    counts = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    out = {}
    for n in counts:
        out[str(n)] = round(run(n), 1)
    eff = {}
    for lo, hi in zip(counts, counts[1:]):
        eff[f"{lo}->{hi}"] = round(
            (out[str(hi)] / out[str(lo)]) / (hi / lo), 2)
    print(json.dumps({"aggregate_gb_per_s": out, "bw_scaling_eff": eff}))


if __name__ == "__main__":
    main()
