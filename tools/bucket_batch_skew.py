"""Categorical-bucket skew evidence for bucket_batches (north rule:
skew handled explicitly).

bucket_batches ranks rows WITHIN aspect buckets. Buckets are
categorical (SDXL has 17), and real corpora concentrate on a few
landscape/portrait shapes — so the naive plan, one global
Window.partitionBy(bucket_id), funnels the whole corpus through
<= n_buckets sort tasks and the hottest bucket pins one task. The
operator's two-pass range-repartition rank spreads every bucket's
rows across the range partitioner instead.

This tool builds a pathologically skewed table — 85% of rows in ONE
of 17 buckets — and measures the operator against the naive
single-window implementation, asserting identical output rows.
Appends to BENCH/BASELINE.md.

Usage: python tools/bucket_batch_skew.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402

from rasters_rs_spark.operators.multimodal import bucket_batches  # noqa: E402
from rasters_rs_spark.session import get_spark  # noqa: E402

BATCH = 64


def skewed_table(spark, n: int, hot_frac: float = 0.85, buckets: int = 17):
    """n rows; hot_frac of them in bucket 0, the rest round-robin over
    the other buckets. Order key is the md5 shuffle key."""
    cold = buckets - 1
    return spark.range(n).select(
        F.col("id").cast("bigint").alias("id"),
        F.when((F.col("id") % 100) < int(hot_frac * 100), F.lit(0))
         .otherwise((F.col("id") % cold + 1).cast("int"))
         .cast("int").alias("bucket_id"),
        F.md5(F.col("id").cast("string")).alias("ord"))


def naive_batches(df):
    """The rejected plan: one global window per categorical bucket."""
    w = Window.partitionBy("bucket_id").orderBy("ord", "id")
    nw = Window.partitionBy("bucket_id")
    r = df.withColumn("rank_in_bucket",
                      (F.row_number().over(w) - 1).cast("long")) \
          .withColumn("_n", F.count("*").over(nw))
    return r.where(F.col("rank_in_bucket")
                   < F.expr(f"_n div {BATCH}") * BATCH) \
        .select("id", "bucket_id", "rank_in_bucket",
                F.expr(f"rank_in_bucket div {BATCH}")
                 .cast("long").alias("batch_id"),
                (F.col("rank_in_bucket") % BATCH).cast("long")
                 .alias("pos_in_batch"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("bucketskew", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    # isolate the plan shapes: no AQE re-planning of either variant
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    df = skewed_table(spark, n).persist()
    df.count()

    def run(fn):
        t0 = time.time()
        cnt = fn(df).count()
        return time.time() - t0, cnt

    run(lambda d: bucket_batches(d, BATCH, bucket_col="bucket_id",
                                 order_col="ord", id_col="id"))  # warm
    t_op, n_op = run(lambda d: bucket_batches(
        d, BATCH, bucket_col="bucket_id", order_col="ord", id_col="id"))
    t_naive, n_naive = run(naive_batches)
    assert n_op == n_naive, (n_op, n_naive)
    # spot-check exact row equality on a deterministic slice (full
    # collect of n rows would be driver-hostile at larger n)
    sl = lambda out: sorted(  # noqa: E731
        tuple(r) for r in out.where(F.col("id") % 9973 == 0).collect())
    assert sl(bucket_batches(df, BATCH, bucket_col="bucket_id",
                             order_col="ord", id_col="id")) \
        == sl(naive_batches(df)), "row mismatch on slice"
    df.unpersist()

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""
## Categorical-bucket skew: bucket_batches (tools/bucket_batch_skew.py {n})

{n} rows, 85% in ONE of 17 aspect buckets (the SDXL regime: real
corpora concentrate on a few shapes), batch_size {BATCH}, AQE off to
isolate the plan shapes; identical outputs asserted (count + a
deterministic id-slice row-for-row):

| plan | wall (s) | batch rows |
|---|---|---|
| two-pass range-repartition rank (the operator) | {t_op:.2f} | {n_op} |
| naive Window.partitionBy(bucket_id)            | {t_naive:.2f} | {n_naive} |

The naive window sorts the hot bucket's {int(0.85 * n)} rows inside
ONE task; the operator's range exchange spreads them across the
partitioner and the per-partition windows stay bounded. The gap grows
with corpus size — at 10^12 rows the naive plan is a single-task sort
of ~10^12 rows, i.e. not runnable.
""")
    print(json.dumps({"operator_s": round(t_op, 2),
                      "naive_s": round(t_naive, 2),
                      "rows": n_op,
                      "speedup": round(t_naive / t_op, 2)}))


if __name__ == "__main__":
    main()
