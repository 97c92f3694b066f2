"""Deduplication operators for large text/image corpora.

Engine-native additions beyond the reference (SURVEY.md's training-data
layer): exact dedup, MinHash+LSH, SimHash, n-gram Jaccard verification,
and embedding near-dup. Design rules: signatures are computed in
Arrow-batched pandas UDFs (numpy-hashed, deterministic — no Python
`hash()`), candidate generation is an equi-join on band/bucket keys so
Catalyst can pick broadcast vs shuffle-hash, and verification only ever
touches candidate pairs (never the full cross product).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_MERSENNE = (1 << 61) - 1
_HASH_BASE = np.uint64(1000003)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, cols, id_col: str) -> DataFrame:
    """Keep one row (smallest id) per duplicate group of ``cols``."""
    w = Window.partitionBy(*cols).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)) \
             .where(F.col("_rn") == 1).drop("_rn")


def duplicate_groups(df: DataFrame, cols, id_col: str) -> DataFrame:
    """(group key, n_dups, keeper id) for groups with more than one row."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper"))
        .where(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingling + deterministic hashing (numpy, no Python hash())
# ---------------------------------------------------------------------------


def _token_shingles(text: str, k: int) -> np.ndarray:
    """Deterministic 64-bit hashes of word k-shingles.

    Token hash: FNV-1a over bytes (wrapping uint64); shingle hash:
    polynomial combine of k consecutive token hashes (wrapping uint64 —
    mod-2^64 wrap is the hash, not an error)."""
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    with np.errstate(over="ignore"):
        th = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = np.uint64(1469598103934665603)
            for b in tok.encode():
                h = (h ^ np.uint64(b)) * np.uint64(1099511628211)
            th[i] = h
        n = len(toks) - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for i in range(k):
            acc = acc * _HASH_BASE + th[i:i + n]
    return np.unique(acc)


def _minhash_params(num_hashes: int, seed: int = 0xC0FFEE):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_hashes-wide minhash: min over (a*s + b), wrapping uint64
    multiply-shift hashing (deterministic, overflow is the mixer)."""
    s = shingles.astype(np.uint64)[:, None]
    with np.errstate(over="ignore"):
        hv = s * a[None, :] + b[None, :]
    return hv.min(axis=0)


def jaccard(text_a: str, text_b: str, k: int) -> float:
    sa = _token_shingles(text_a, k)
    sb = _token_shingles(text_b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_bands(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_hashes: int = 64, bands: int = 16, shingle_k: int = 3) -> DataFrame:
    """(id, band, band_key) rows: LSH banding of minhash signatures.
    band_key packs the band's rows into one deterministic 64-bit key."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    a, b = _minhash_params(num_hashes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_band, out_key = [], [], []
            for rid, text in zip(pdf[id_col].astype(str), pdf[text_col]):
                sig = minhash_signature(_token_shingles(text or "", shingle_k), a, b)
                banded = sig.reshape(bands, rows_per_band)
                key = np.full(bands, 1469598103934665603, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    for c in range(rows_per_band):
                        key = key * _HASH_BASE + banded[:, c]
                key = (key % np.uint64(_MERSENNE)).astype(np.int64)
                out_id += [rid] * bands
                out_band += list(range(bands))
                out_key += [int(v) for v in key]
            yield pd.DataFrame({"id": out_id, "band": out_band, "band_key": out_key})

    return docs.select(F.col(id_col).alias(id_col), F.col(text_col)) \
               .mapInPandas(gen, schema="id string, band int, band_key long")


def lsh_candidate_pairs(band_rows: DataFrame) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH bucket.
    Bucket self-join expressed as an equi-join on (band, band_key)."""
    left = band_rows.select(F.col("id").alias("id_a"), "band", "band_key")
    right = band_rows.select(F.col("id").alias("id_b"), "band", "band_key")
    return (
        left.join(right, on=["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def minhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  num_hashes: int = 64, bands: int = 16, shingle_k: int = 3,
                  threshold: float = 0.8) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates refined by exact
    n-gram Jaccard >= threshold. Returns (id_a, id_b, jaccard)."""
    band_rows = minhash_bands(docs, text_col, id_col, num_hashes, bands, shingle_k)
    cand = lsh_candidate_pairs(band_rows)
    texts = docs.select(F.col(id_col).cast("string").alias("id"),
                        F.col(text_col).alias("_t"))
    pairs = (
        cand.join(texts.withColumnRenamed("id", "id_a").withColumnRenamed("_t", "_ta"), "id_a")
            .join(texts.withColumnRenamed("id", "id_b").withColumnRenamed("_t", "_tb"), "id_b")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            jac = [jaccard(ta, tb, shingle_k) for ta, tb in zip(pdf["_ta"], pdf["_tb"])]
            res = pdf[["id_a", "id_b"]].copy()
            res["jaccard"] = jac
            yield res

    verified = pairs.mapInPandas(gen, schema="id_a string, id_b string, jaccard double")
    return verified.where(F.col("jaccard") >= threshold)


def keep_canonical(docs: DataFrame, dup_pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Drop every row that near-duplicates a smaller id (greedy keeper
    rule; standard for LSH dedup pipelines)."""
    losers = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, tok in enumerate(toks):
            h = np.uint64(1469598103934665603)
            for bb in tok.encode():
                h = h * np.uint64(1099511628211) + np.uint64(bb)  # FNV-ish, wraps mod 2^64
            hs[i] = h
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    for bit in range(64):
        if votes[bit] > 0:
            out |= np.uint64(1) << np.uint64(bit)
    return int(out.astype(np.int64))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "simhash": [_simhash64(t or "") for t in pdf[text_col]],
            })

    return docs.mapInPandas(gen, schema="id string, simhash long")


def simhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, blocks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of ``blocks``
    16-bit blocks (pigeonhole guarantees recall for hamming < blocks),
    verified by exact popcount <= max_hamming."""
    sh = simhash(docs, text_col, id_col)
    block_cols = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"b{i}")
        for i in range(blocks)
    ]
    keyed = sh.select("id", "simhash", *block_cols)
    cands = None
    for i in range(blocks):
        left = keyed.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
                            F.col(f"b{i}").alias("bk"))
        right = keyed.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
                             F.col(f"b{i}").alias("bk"))
        c = left.join(right, "bk").where(F.col("id_a") < F.col("id_b")) \
                .select("id_a", "id_b", "sh_a", "sh_b")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", ham).where(F.col("hamming") <= max_hamming) \
                .select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# image near-dup: phash hamming + caption equality (input_hint M8)
# ---------------------------------------------------------------------------


def phash_neardup(images: DataFrame, max_hamming: int = 6,
                  id_col: str = "image_id", hash_col: str = "phash",
                  blocks: int = 4) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash hamming distance.

    Same block-pigeonhole LSH as simhash_dedup (candidates share one of
    ``blocks`` 16-bit blocks — complete for hamming < blocks), verified
    with bit_count(xor) entirely JVM-side. Returns (id_a, id_b, hamming).
    """
    block_cols = [
        F.shiftrightunsigned(F.col(hash_col), 16 * i).bitwiseAND(F.lit(0xFFFF))
         .alias(f"b{i}")
        for i in range(blocks)
    ]
    keyed = images.select(F.col(id_col).cast("string").alias("id"),
                          F.col(hash_col).alias("ph"), *block_cols)
    cands = None
    for i in range(blocks):
        left = keyed.select(F.col("id").alias("id_a"), F.col("ph").alias("ph_a"),
                            F.col(f"b{i}").alias("bk"))
        right = keyed.select(F.col("id").alias("id_b"), F.col("ph").alias("ph_b"),
                             F.col(f"b{i}").alias("bk"))
        c = left.join(right, "bk").where(F.col("id_a") < F.col("id_b")) \
                .select("id_a", "id_b", "ph_a", "ph_b")
        cands = c if cands is None else cands.unionByName(c)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (cands.distinct().withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def caption_dup_groups(images: DataFrame, id_col: str = "image_id",
                       caption_col: str = "caption") -> DataFrame:
    """Exact caption duplicate groups (caption-equality joins are the
    input-hint's cheap text-side dedup signal)."""
    return duplicate_groups(images, [caption_col], id_col)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def embedding_neardup(embs: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", n_planes: int = 16,
                      threshold: float = 0.95, seed: int = 7) -> DataFrame:
    """Near-dup pairs by cosine >= threshold. Candidates = identical
    random-hyperplane sign signature (prefilter), exact cosine verify."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.normal(size=(mat.shape[1], n_planes))
            signs = (mat @ planes) > 0
            key = np.zeros(len(pdf), dtype=np.int64)
            for b in range(n_planes):
                key = key * 2 + signs[:, b].astype(np.int64)
            norm = np.linalg.norm(mat, axis=1)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str), "bucket": key,
                "vec": [v.tolist() for v in (mat / np.maximum(norm, 1e-300)[:, None])],
            })

    keyed = embs.mapInPandas(gen, schema="id string, bucket long, vec array<double>")
    left = keyed.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), "bucket")
    right = keyed.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), "bucket")
    pairs = left.join(right, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    return pairs.withColumn("cosine", cos).where(F.col("cosine") >= threshold) \
                .select("id_a", "id_b", "cosine").distinct()
