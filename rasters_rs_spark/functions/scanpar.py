"""Scale-adaptive scan parallelism (round-8 optimization).

The driver's testdata tables are single-file, single-row-group parquet,
so every scan — and everything upstream of the first Exchange — runs in
ONE task regardless of cluster size (Spark assigns a parquet row group
to exactly one split). That serializes the expensive per-row stages
(Arrow kernels, md5 shingling, tokenize+explode) on a 32-core box.

``fan_out(df)`` applies the optimization-guide section 2.5 fix ("input
skew: one huge unsplittable file -> repartition immediately after the
read"), but ADAPTIVELY: only when the frame has fewer partitions than
the session's default parallelism. On a real multi-file corpus (the
100 TB layout) the scan already carries >= cores partitions and the
helper is a no-op — no shuffle is added at scale, so per-operator
"corpus never shuffles" plan claims hold where they matter. The
repartition key, when given, must be a deterministic column (guide
2.5: retried round-robin repartitions of nondeterministic input can
lose rows; a hash key sidesteps the sort-before-repartition cost too).

Row placement never affects any operator's RESULT here: the helper is
only applied upstream of row-local kernels / commutative aggregations
(each caller notes why).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key: str | None = None,
            factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``factor * defaultParallelism`` partitions
    iff it currently has fewer than that — a no-op on inputs that
    already scan wide (the at-scale case). ``key``: optional column to
    hash-partition by (deterministic; skips round-robin's local
    sort-before-repartition); omit for round-robin."""
    if os.environ.get("RRS_SCANPAR_DISABLE") == "1":  # A/B toggle
        return df
    sc = df.sparkSession.sparkContext
    target = max(int(sc.defaultParallelism) * factor, 1)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - planning-only probe; never fatal
        return df
    if current >= target:
        return df
    if key is not None:
        return df.repartition(target, key)
    return df.repartition(target)
