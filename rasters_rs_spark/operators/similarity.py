"""Similarity search over embedding columns (array<float/double>).

- ``cosine_topk``: exact brute-force top-k. The dot product stays
  JVM-side (F.zip_with + F.aggregate inside whole-stage codegen); the
  query side is broadcast, so the scan parallelizes over the corpus and
  the only shuffle is the per-query top-k window.
- ``lsh_topk``: random-hyperplane LSH buckets as the scale path: probe
  the query's bucket (plus optional multi-probe flips), rerank with the
  exact cosine; recall measured against brute force in the tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _norm_expr(col: str):
    sq = F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return F.sqrt(sq)


def cosine_expr(a: str, b: str):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    return dot / (_norm_expr(a) * _norm_expr(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                q_id: str = "q_id", c_id: str = "vec_id",
                q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Exact top-k by cosine: returns (q_id, vec_id, cosine, rank).
    Ties broken by corpus id for determinism."""
    cand = corpus.crossJoin(F.broadcast(queries))
    scored = cand.withColumn("cosine", cosine_expr(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id, c_id, "cosine", "rank"))


def lcg_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic LSH hyperplanes from the SQL-expressible LCG:
    plane[j][d] = lcg(j*dim + d) - 0.5. Same closed form on the DuckDB
    oracle side, so bucket bits are reproducible across engines."""
    from ..sources.synth import lcg_values
    import numpy as np
    k = np.arange(n_planes * dim, dtype=np.int64)
    vals = lcg_values(k) - 0.5
    return [vals[j * dim:(j + 1) * dim].tolist() for j in range(n_planes)]


def _dot_fold_expr(vec_col: str, plane: list[float]):
    """Sequential left-fold dot product against a literal plane — the
    exact op order the SQL oracle's list_reduce uses (bit-identical
    signs, so bucket membership matches across engines)."""
    arr = F.array(*[F.lit(float(v)) for v in plane])
    return F.aggregate(F.zip_with(F.col(vec_col), arr, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]):
    """Bucket id = hyperplane sign bits (bit j set when dot_j > 0)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bucket = bucket + F.when(_dot_fold_expr(vec_col, plane) > 0,
                                 F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk_det(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
                 n_planes: int = 8, probes: int = 3,
                 q_id: str = "q_id", c_id: str = "vec_id",
                 q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """lsh_topk with deterministic LCG hyperplanes and JVM-side fold
    dot products: same plan shape (bucket equi-join + multi-probe +
    exact rerank), but every intermediate is reproducible in ANSI SQL —
    this is the contract-oracled variant."""
    planes = lcg_planes(n_planes, dim)
    ck = corpus.withColumn("bucket", lsh_bucket_expr(c_vec, planes))
    qk = queries.withColumn("bucket", lsh_bucket_expr(q_vec, planes))
    flips = [0] + [1 << b for b in range(min(probes, n_planes))]
    probe_df = qk.sparkSession.createDataFrame([(f,) for f in flips], "flip long")
    qprobe = qk.crossJoin(F.broadcast(probe_df)).withColumn(
        "bucket", F.col("bucket").bitwiseXOR(F.col("flip"))).drop("flip")
    cand = ck.join(F.broadcast(qprobe), on="bucket").dropDuplicates([q_id, c_id])
    scored = cand.withColumn("cosine", cosine_expr(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id, c_id, "cosine", "rank"))


def lcg_centroids(n_lists: int, dim: int) -> list[list[float]]:
    """Deterministic IVF coarse centroids from the LCG (k-offset 5e6 to
    decorrelate from the LSH planes)."""
    from ..sources.synth import lcg_values
    import numpy as np
    k = 5_000_000 + np.arange(n_lists * dim, dtype=np.int64)
    vals = lcg_values(k)
    return [vals[c * dim:(c + 1) * dim].tolist() for c in range(n_lists)]


def _sqdist_fold_expr(vec_col: str, cent: list[float]):
    arr = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(F.col(vec_col), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def ivf_topk_det(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
                 n_lists: int = 16, nprobe: int = 4,
                 q_id: str = "q_id", c_id: str = "vec_id",
                 q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """ivf_topk with deterministic LCG centroids (no k-means training):
    corpus rows go to their argmin list (ties to the lowest list id),
    queries probe their nprobe nearest lists, exact rerank inside. The
    SQL-oracled variant — same join shape as the trained ivf_topk."""
    cents = lcg_centroids(n_lists, dim)

    def assign_argmin(df, vec):
        dists = [_sqdist_fold_expr(vec, c).alias(f"_d{i}")
                 for i, c in enumerate(cents)]
        df = df.select("*", *dists)
        m = F.least(*[F.col(f"_d{i}") for i in range(n_lists)])
        pick = F.lit(n_lists - 1)
        for i in reversed(range(n_lists)):
            pick = F.when(F.col(f"_d{i}") == m, F.lit(i)).otherwise(pick)
        return df.withColumn("list_id", pick.cast("int")) \
                 .drop(*[f"_d{i}" for i in range(n_lists)])

    ck = assign_argmin(corpus, c_vec)
    # queries: rank all lists by distance, probe the nprobe nearest
    dists = [_sqdist_fold_expr(q_vec, c).alias(f"_d{i}")
             for i, c in enumerate(cents)]
    qd = queries.select("*", *dists)
    pairs = F.array(*[F.struct(F.col(f"_d{i}").alias("d"),
                               F.lit(i).cast("int").alias("c"))
                      for i in range(n_lists)])
    qk = qd.withColumn("_pair", F.explode(F.slice(F.array_sort(pairs), 1, nprobe))) \
           .withColumn("list_id", F.col("_pair.c")) \
           .drop("_pair", *[f"_d{i}" for i in range(n_lists)])
    cand = ck.join(F.broadcast(qk), on="list_id").dropDuplicates([q_id, c_id])
    scored = cand.withColumn("cosine", cosine_expr(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id, c_id, "cosine", "rank"))


def _bucket_udf(vec_col: str, dim: int, n_planes: int, seed: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(dim, n_planes))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            signs = (mat @ planes) > 0
            key = np.zeros(len(pdf), dtype=np.int64)
            for b in range(n_planes):
                key = key * 2 + signs[:, b].astype(np.int64)
            res = pdf.copy()
            res["bucket"] = key
            yield res
    return gen


def train_ivf_centroids(sample: np.ndarray, n_lists: int, iters: int = 10,
                        seed: int = 11) -> np.ndarray:
    """Driver-side k-means (Lloyd, numpy) over a corpus sample — the IVF
    coarse quantizer. At 10^12 scale the sample is a cheap limit() pull;
    centroids broadcast to every task."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def _ivf_assign_udf(vec_col: str, cents: np.ndarray, nprobe: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1)[:, :nprobe]
            res = pdf.copy()
            res["lists"] = [row.tolist() for row in order]
            yield res
    return gen


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
             n_lists: int = 16, nprobe: int = 4, train_sample: int = 2048,
             q_id: str = "q_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, corpus rows
    assigned to their nearest list, queries probe their ``nprobe``
    nearest lists, exact cosine rerank inside the probed lists.
    Same output schema as cosine_topk."""
    sample = np.stack([
        np.asarray(r[c_vec], dtype=np.float64)
        for r in corpus.limit(train_sample).collect()
    ])
    cents = train_ivf_centroids(sample, n_lists)

    c_schema = ", ".join(f"{n} {t}" for n, t in corpus.dtypes) + ", lists array<int>"
    q_schema = ", ".join(f"{n} {t}" for n, t in queries.dtypes) + ", lists array<int>"
    ck = corpus.mapInPandas(_ivf_assign_udf(c_vec, cents, 1), schema=c_schema) \
               .withColumn("list_id", F.col("lists")[0]).drop("lists")
    qk = queries.mapInPandas(_ivf_assign_udf(q_vec, cents, nprobe), schema=q_schema) \
                .withColumn("list_id", F.explode("lists")).drop("lists")

    cand = ck.join(F.broadcast(qk), on="list_id").dropDuplicates([q_id, c_id])
    scored = cand.withColumn("cosine", cosine_expr(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id, c_id, "cosine", "rank"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
             n_planes: int = 12, probes: int = 3, seed: int = 7,
             q_id: str = "q_id", c_id: str = "vec_id",
             q_vec: str = "q_vec", c_vec: str = "embedding") -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signs,
    multi-probe by flipping ``probes`` single bits, equi-join on bucket,
    exact cosine rerank. Same output schema as cosine_topk."""
    c_schema = ", ".join(f"{n} {t}" for n, t in corpus.dtypes) + ", bucket long"
    q_schema = ", ".join(f"{n} {t}" for n, t in queries.dtypes) + ", bucket long"
    ck = corpus.mapInPandas(_bucket_udf(c_vec, dim, n_planes, seed), schema=c_schema)
    qk = queries.mapInPandas(_bucket_udf(q_vec, dim, n_planes, seed), schema=q_schema)

    # multi-probe: original bucket plus single-bit flips
    flips = [0] + [1 << b for b in range(min(probes, n_planes))]
    probe_df = qk.sparkSession.createDataFrame([(f,) for f in flips], "flip long")
    qprobe = qk.crossJoin(F.broadcast(probe_df)).withColumn(
        "bucket", F.col("bucket").bitwiseXOR(F.col("flip"))).drop("flip")

    cand = ck.join(F.broadcast(qprobe), on="bucket").dropDuplicates([q_id, c_id])
    scored = cand.withColumn("cosine", cosine_expr(q_vec, c_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(c_id))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(q_id, c_id, "cosine", "rank"))
