"""End-to-end resumable pipeline: the headline flow wired through the
checkpoint manifest (north rule: any failed tiling or join stage
resumes idempotently with per-partition lineage + metrics)."""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..operators import celljoin, stats, tiling
from ..sources import synth
from .manifest import CheckpointRunner


def run_headline(spark: SparkSession, root: str, n_images: int = 64,
                 aoi_count: int = 16, img_px: int = 64) -> dict:
    """images -> centroids -> cell-PIP join -> zonal agg -> tile pyramid,
    each stage checkpointed. Re-running with the same ``root`` skips
    every completed stage; deleting one stage's manifest recomputes
    exactly that stage (downstream stages reload their checkpoints)."""
    runner = CheckpointRunner(spark, root)
    aois = synth.aoi_table(aoi_count, seed=43)

    images = runner.run(
        "images",
        lambda: synth.image_table_distributed(spark, n_images, seed=42,
                                              h=img_px, w=img_px,
                                              pixel_size=2.0, partitions=8))

    def join_stage():
        cents = images.select(
            "image_id",
            (F.col("gt")[0] + F.col("gt")[1] * F.col("w") / 2).alias("x"),
            (F.col("gt")[3] + F.col("gt")[5] * F.col("h") / 2).alias("y"))
        return celljoin.cell_pip_join(cents, aois, zoom=12)

    joined = runner.run("cell_join", join_stage)

    zonal = runner.run(
        "zonal_stats",
        lambda: stats.zonal_stats(images, aois))

    tiles = runner.run(
        "tiles",
        lambda: tiling.tile_index_manifest(images, mode="local"))

    return {
        "stages": runner.summary(),
        "images": images.count(),
        "join_rows": joined.count(),
        "zones": zonal.count(),
        "tiles": tiles.count(),
    }


def run_corpus_curation(spark: SparkSession, root: str, sf_dir: str,
                        budget: int = 2048, dedup_threshold: float = 0.8,
                        sample_fracs: dict | None = None,
                        decon_k: int = 4, test_split: int = 490,
                        span_k: int | None = None,
                        ppl_model: dict | None = None,
                        max_avg_nll: float | None = None,
                        c4: bool = False,
                        gopher_min_words: int | None = None) -> dict:
    """The TRAINING-DATA half of the engine as a resumable pipeline:
    documents -> optional C4 line cleaning (``c4=True``: rebuild every
    doc from its surviving lines, drop pages the C4 gate rejects) ->
    quality-filter cascade -> optional Gopher rule gate
    (``gopher_min_words``: the Rae et al. 2021 A1.1 rule set with the
    word-count floor adapted to the corpus) -> optional CCNet-style
    perplexity gate (``ppl_model`` + ``max_avg_nll``: keep docs whose
    avg negative log-likelihood under the reference char-bigram model
    is at most the bound) -> benchmark decontamination -> minhash
    near-dup pairs -> canonical keepers -> optional duplicated-span
    removal (``span_k``) -> per-language stratified sampling ->
    sequence packing. Every stage checkpoints through the manifest
    (per-partition lineage + row/byte metrics); re-running with the
    same ``root`` skips completed stages, and deleting one stage's
    manifest recomputes exactly that stage while downstream stages
    reload their checkpoints — the north rule's idempotent-resume
    contract over the corpus-curation dataflow."""
    from ..operators import dedup, text

    runner = CheckpointRunner(spark, root)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs_raw = docs
    # the held-out benchmark set is the RAW documents — cleaning must
    # not touch what decontamination protects against
    tests = docs.where(F.col("doc_id") >= test_split)

    if c4:
        # line-level cleanup FIRST (C4 runs before any doc-level
        # signal: dropped boilerplate lines shouldn't feed token
        # counts, repetition, or dedup shingles); row-local, keeps the
        # document schema with text rebuilt from surviving lines
        raw = docs
        docs = runner.run(
            "c4_clean",
            lambda: raw.drop("text").join(
                text.c4_clean(raw).where(F.col("keep"))
                .select("doc_id", F.col("cleaned_text").alias("text")),
                on="doc_id"))

    docs_q = docs
    filtered = runner.run(
        "quality_filter",
        lambda: docs_q.join(
            text.filter_corpus(docs_q, min_tokens=30, max_rep=0.5,
                               langs=("en", "es", "de", "fr", "zh"))
            .select("doc_id"), on="doc_id"))

    if gopher_min_words is not None:
        g_in = filtered
        filtered = runner.run(
            "gopher_rules",
            lambda: g_in.join(
                text.gopher_quality_filter(
                    g_in, min_words=gopher_min_words)
                .where(F.col("keep")).select("doc_id"), on="doc_id"))

    if ppl_model is not None and max_avg_nll is not None:
        # LM quality gate (Wenzek et al. 2020): row-local scoring
        # against the BROADCAST reference model — stage output keeps
        # the document schema (score columns are recomputable)
        gate_in = filtered
        filtered = runner.run(
            "perplexity_filter",
            lambda: text.perplexity_filter(gate_in, ppl_model,
                                           max_avg_nll)
            .select(*gate_in.columns))

    # the training corpus is doc_id < test_split ONLY: the held-out
    # benchmark docs must not reach any downstream training stage
    # (dedup / sampling / packing), not merely fail to flag themselves
    # (round-5 ADVICE: keep_uncontaminated over the full `filtered`
    # let test docs flow into the curated corpus and total_tokens)
    train = filtered.where(F.col("doc_id") < test_split)
    clean = runner.run(
        "decontaminate",
        lambda: dedup.keep_uncontaminated(
            train, dedup.decontaminate(train, tests, shingle_k=decon_k)))

    pairs = runner.run(
        "minhash_pairs",
        lambda: dedup.minhash_dedup(clean, threshold=dedup_threshold))

    # minhash ids ride the string pipeline, so its (id_a < id_b) is
    # LEXICOGRAPHIC ("10" < "5"); canonicalize numerically before the
    # keeper rule — "keep the smallest doc_id" is the stable contract
    # (and the one the streaming ingest variant can honor append-only:
    # the kept doc of any pair is always the earlier-arrived one)
    def numeric_pairs():
        a = F.col("id_a").cast("bigint")
        b = F.col("id_b").cast("bigint")
        return pairs.select(F.least(a, b).alias("id_a"),
                            F.greatest(a, b).alias("id_b"))

    kept = runner.run(
        "canonical_keepers",
        lambda: dedup.keep_canonical(clean, numeric_pairs()))

    if span_k:
        # sub-document dedup among the kept docs: cut non-canonical
        # duplicated spans (doc-level dedup only removes whole docs;
        # shared boilerplate across otherwise-distinct docs survives
        # it and still inflates total_tokens)
        kept = runner.run(
            "span_removal",
            lambda: kept.drop("text").join(
                text.remove_duplicated_spans(kept, k=span_k)
                    .select("doc_id",
                            F.col("text_clean").alias("text")),
                on="doc_id"))

    sampled = runner.run(
        "stratified_sample",
        lambda: text.stratified_sample(
            kept, sample_fracs or {"en": 1.0, "es": 0.8, "de": 0.8},
            default=0.5))

    packed = runner.run(
        "pack_sequences",
        lambda: text.pack_sequences(sampled, budget=budget))

    return {
        "stages": runner.summary(),
        "input_docs": docs_raw.count(),
        "after_quality": filtered.count(),   # post LM gate if enabled
        "after_decontaminate": clean.count(),
        "dup_pairs": pairs.count(),
        "after_dedup": kept.count(),
        "after_sample": sampled.count(),
        "packed_docs": packed.count(),
        "total_tokens": int(packed.agg(F.sum("n_tokens")).first()[0] or 0),
    }


def run_corpus_curation_streaming(spark: SparkSession, source_dir: str,
                                  schema: str, out_dir: str, test_set,
                                  dedup_threshold: float = 0.8,
                                  sample_fracs: dict | None = None,
                                  decon_k: int = 4,
                                  max_files_per_trigger: int | None = None,
                                  ppl_model: dict | None = None,
                                  max_avg_nll: float | None = None,
                                  c4: bool = False,
                                  gopher_min_words: int | None = None):
    """Streaming-ingest variant of run_corpus_curation (round-5
    VERDICT #9): documents arrive as micro-batches and each batch runs
    quality filter -> benchmark decontamination (static ``test_set``)
    -> incremental MinHash near-dup against EVERYTHING previously
    ingested -> greedy larger-id drop -> stratified sampling, with
    survivors appended to ``out_dir/curated`` and the full
    quality+decon survivor set appended to ``out_dir/register`` (the
    corpus the next batch's incremental dedup probes).

    Parity with the batch pipeline is exact when batches arrive in
    doc_id order (the append-only ingest contract): batch
    keep_canonical drops the LARGER id of every verified pair, and
    probing each new doc against ALL prior survivors — kept or
    dropped, hence the register — reproduces precisely that drop set
    (checking only kept docs would diverge on dup chains A~B~C).
    Sampling is md5-row-local, so per-doc decisions are
    batch-independent, and so is the optional perplexity gate
    (``ppl_model`` + ``max_avg_nll``): the reference model is STATIC,
    every doc scores alone, so streamed == batch exactly. Sequence
    packing stays an offline step over the curated store (its output
    depends on global corpus order), and so does duplicated-SPAN
    removal: its canonical-occurrence rule is a GLOBAL min over every
    occurrence of a window hash, which an append-only stream cannot
    honor without rewriting already-emitted documents (a later batch
    can contain the duplicate that marks an earlier doc's span) — run
    it batch-side via ``run_corpus_curation(span_k=...)``, or
    per-batch with the incremental-register pattern if within-stream
    approximation is acceptable. Returns the started StreamingQuery;
    tested streamed == batch on a two-batch replay."""
    import os

    from pyspark.sql import functions as SF

    from ..operators import dedup, text

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    register = f"{out_dir}/register"
    curated = f"{out_dir}/curated"

    def curate_batch(batch_df, epoch_id):
        # C4 cleaning and the Gopher gate are row-local (each doc
        # decides alone), so applying them per micro-batch is exactly
        # the batch pipeline's semantics — streamed == batch holds
        if c4:
            batch_df = batch_df.drop("text").join(
                text.c4_clean(batch_df).where(SF.col("keep"))
                .select("doc_id",
                        SF.col("cleaned_text").alias("text")),
                on="doc_id")
        if gopher_min_words is not None:
            batch_df = batch_df.join(
                text.gopher_quality_filter(
                    batch_df, min_words=gopher_min_words)
                .where(SF.col("keep")).select("doc_id"), on="doc_id")
        filtered = batch_df.join(
            text.filter_corpus(batch_df, min_tokens=30, max_rep=0.5,
                               langs=("en", "es", "de", "fr", "zh"))
            .select("doc_id"), on="doc_id")
        if ppl_model is not None and max_avg_nll is not None:
            filtered = text.perplexity_filter(
                filtered, ppl_model, max_avg_nll) \
                .select(*batch_df.columns)
        clean = dedup.keep_uncontaminated(
            filtered, dedup.decontaminate(filtered, test_set,
                                          shingle_k=decon_k))
        clean = clean.localCheckpoint(eager=True)
        if os.path.exists(register):
            prior = spark.read.parquet(register)
            pairs = dedup.minhash_dedup_incremental(
                clean, prior, threshold=dedup_threshold)
        else:
            pairs = dedup.minhash_dedup(clean, threshold=dedup_threshold)
        # batch keep_canonical == drop the larger id of every pair
        # (id-ordered arrival makes every cross-batch pair's larger id
        # the new doc)
        losers = pairs.select(
            SF.greatest(SF.col("id_a").cast("bigint"),
                        SF.col("id_b").cast("bigint")).alias("doc_id")
        ).distinct()
        kept = clean.join(losers, on="doc_id", how="left_anti")
        sampled = text.stratified_sample(
            kept, sample_fracs or {"en": 1.0, "es": 0.8, "de": 0.8},
            default=0.5)
        sampled.write.mode("append").parquet(curated)
        clean.write.mode("append").parquet(register)

    return (stream.writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", f"{out_dir}/_ckpt")
            .trigger(availableNow=True).start())


def run_image_curation(spark: SparkSession, root: str, n_images: int = 48,
                       clip_threshold: float = 0.75, max_hamming: int = 6,
                       min_px: int = 16, shard_bytes: int = 1 << 16,
                       train_batch_size: int = 4,
                       plant_neardups=((5, 4), (13, 12))) -> dict:
    """The IMAGE+caption half of the engine as a resumable pipeline —
    the north-star input shape end-to-end: image+caption table ->
    DataComp basic metadata filters -> CLIP-style alignment gate
    (LAION rule) -> phash near-dup pairs -> canonical keepers ->
    SDXL aspect buckets -> deterministic training order ->
    WebDataset-style shard assignment in that training order ->
    SDXL bucketed train batches (full same-bucket batches in training
    order, trailing partials dropped) -> retrieval-eval QA
    (text->image recall on input vs curated — the metric a curation
    run is judged by). Every stage checkpoints through the manifest
    (per-partition lineage + row/byte metrics); re-running with the
    same ``root`` skips completed stages, and deleting one stage's
    manifest recomputes exactly that stage — same idempotent-resume
    contract as run_corpus_curation, over the multimodal dataflow.

    The gate precedes dedup deliberately (the LAION/DataComp order):
    misaligned pairs are the cheapest drop, and dedup then runs on
    the smaller surviving corpus. The keeper rule is "smallest
    image_id" — ids are fixed-width zero-padded, so the string
    keeper of keep_canonical IS the numeric one (the corpus-pipeline
    lexicographic-vs-numeric bug class does not arise)."""
    from ..operators import dedup, multimodal, text

    runner = CheckpointRunner(spark, root)
    images = runner.run(
        "images",
        lambda: spark.createDataFrame(
            synth.clip_caption_table(n_images,
                                     plant_neardups=plant_neardups)))

    # DataComp stage order: the cheap metadata gate first, the
    # (embedding) alignment gate second on the survivors
    basic = runner.run(
        "basic_filters",
        lambda: multimodal.basic_image_filters(images, min_px=min_px))
    sized = images.join(
        basic.where(F.col("keep")).select("image_id"), on="image_id")

    gate = runner.run(
        "clip_gate",
        lambda: multimodal.clip_score_filter(sized,
                                             threshold=clip_threshold))
    aligned = sized.join(
        gate.where(F.col("keep")).select("image_id"), on="image_id")

    pairs = runner.run(
        "phash_pairs",
        lambda: dedup.phash_neardup(aligned, max_hamming=max_hamming))

    kept = runner.run(
        "canonical_keepers",
        lambda: dedup.keep_canonical(aligned, pairs,
                                     id_col="image_id"))

    buckets = runner.run(
        "aspect_buckets",
        lambda: multimodal.bucket_by_aspect(kept))

    order = runner.run(
        "train_order",
        lambda: text.deterministic_shuffle(kept, salt="img1",
                                           id_col="image_id"))

    # shard in TRAINING order (WebDataset writers consume shards
    # sequentially): the shuffle rank is the ordering key, so shard
    # contents follow the deterministic shuffle, not ingest order
    def shard_stage():
        ranked = kept.join(order.select("image_id", "shuffle_rank"),
                           on="image_id")
        return multimodal.assign_shards(
            ranked, shard_bytes=shard_bytes, id_col="shuffle_rank") \
            .join(ranked.select("image_id", "shuffle_rank"),
                  on="shuffle_rank")

    shards = runner.run("shards", shard_stage)

    # SDXL-style bucketed train batches: full same-aspect-bucket
    # batches cut in training order (trailing partials dropped — the
    # training-loader rule); batch_id is per-bucket, the loader key is
    # (bucket_id, batch_id)
    batches = runner.run(
        "bucket_batches",
        lambda: multimodal.bucket_batches(
            kept.select("image_id")
                .join(buckets.select("image_id", "bucket_id"),
                      on="image_id")
                .join(order.select("image_id", "shuffle_rank"),
                      on="image_id"),
            batch_size=train_batch_size))

    # post-curation QA (batch-only: a global metric over the final
    # set): CLIP-protocol text->image retrieval eval on the raw input
    # vs the curated keepers — the practice of validating a curation
    # run by its retrieval metrics, not only by row counts. Misaligned
    # captions rank their true image off the top (recall@1 < 1 on the
    # input); curation lifts both R@1 and R@5. Residual R@1 ties on
    # the curated set are the fixture's period-16 SEMANTIC TWINS
    # (grid K = floor(mean*512) % 8 is invariant under m -> m+16: the
    # exact mean*512 shift is 360 - 8*wraps, always 0 mod 8 — distinct
    # pixels and phashes, identical embedding AND caption), i.e. the
    # irreducible-tie case real text->image retrieval also has.
    def eval_stage():
        from ..operators import similarity

        def metrics(df, label):
            qs = multimodal.caption_token_embedding(
                df.select("image_id", "caption")).select(
                F.col("image_id").alias("q_id"),
                F.col("cap_emb").alias("q_vec"))
            corpus = multimodal.image_grid_embedding(df).select(
                F.col("image_id").alias("vec_id"),
                F.col("img_emb").alias("embedding"))
            ev = similarity.retrieval_rank_eval(qs, corpus,
                                                hits_at=(1, 5))
            return ev.agg(
                F.count("*").alias("n_rankable"),
                F.sum("hit_at_1").cast("bigint").alias("hits_at_1"),
                F.sum("hit_at_5").cast("bigint").alias("hits_at_5")) \
                .select(F.lit(label).alias("dataset"), "*")

        return metrics(images, "input") \
            .unionByName(metrics(kept, "curated"))

    ev = runner.run("retrieval_eval", eval_stage)

    return {
        "stages": runner.summary(),
        "retrieval_eval": {
            r["dataset"]: {"n_rankable": int(r["n_rankable"]),
                           "hits_at_1": int(r["hits_at_1"]),
                           "hits_at_5": int(r["hits_at_5"])}
            for r in ev.collect()},
        "input_images": images.count(),
        "after_basic": sized.count(),
        "after_gate": aligned.count(),
        "dup_pairs": pairs.count(),
        "after_dedup": kept.count(),
        "bucket_histogram": {
            int(r["bucket_id"]): int(r["n"]) for r in
            buckets.groupBy("bucket_id").agg(F.count("*").alias("n"))
                   .collect()},
        "train_order_rows": order.count(),
        "n_shards": int(shards.agg(F.max("shard_id")).first()[0] or 0) + 1,
        "train_batches": {
            (int(r["bucket_id"]), int(r["batch_id"])): int(r["n"])
            for r in batches.groupBy("bucket_id", "batch_id")
                            .agg(F.count("*").alias("n")).collect()},
    }


def run_image_curation_streaming(spark: SparkSession, source_dir: str,
                                 schema: str, out_dir: str,
                                 clip_threshold: float = 0.75,
                                 max_hamming: int = 6, min_px: int = 16,
                                 max_files_per_trigger: int | None = None):
    """Streaming-ingest variant of run_image_curation: image+caption
    rows arrive as micro-batches and each batch runs the DataComp
    basic metadata gate + the CLIP-style alignment gate (both
    row-local: static thresholds / deterministic embedders, so
    streamed == batch per row) -> incremental phash near-dup against
    EVERYTHING previously gated in (kept or dropped — the register) ->
    greedy larger-id drop -> SDXL aspect buckets (row-local), with
    keepers+buckets appended to ``out_dir/curated`` and the full gate
    survivor set appended to ``out_dir/register``.

    Parity with the batch pipeline is exact when batches arrive in
    image_id order (ids are fixed-width zero-padded, so the string
    order is the numeric one): batch keep_canonical drops the larger
    id of every pair, and probing each new image against all prior
    gate survivors reproduces precisely that drop set — probing only
    KEPT images would diverge on dup chains A~B~C, the same argument
    as the document pipeline. The deterministic training-order ranks
    stay an offline step over the curated store (a global permutation
    depends on the final corpus; run text.deterministic_shuffle over
    ``curated`` once ingest settles) — and so do the downstream
    consumers of that order (multimodal.assign_shards,
    multimodal.bucket_batches: global cumsums/ranks over the final
    set) and the retrieval-eval QA (a global metric whose corpus side
    is the final keeper set). All four are deliberately BATCH-ONLY
    stages, not streaming gaps: each is a function of the settled
    corpus that an append-only stream cannot finalize row-by-row.
    The sinks are epoch-partitioned so the fold is idempotent under
    micro-batch replay (see image_curate_fold). Returns the started
    StreamingQuery; tested streamed == batch on a two-batch replay."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(source_dir)
    curate_batch = image_curate_fold(spark, out_dir, clip_threshold,
                                     max_hamming, min_px)
    return (stream.writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", f"{out_dir}/_ckpt")
            .trigger(availableNow=True).start())


def image_curate_fold(spark: SparkSession, out_dir: str,
                      clip_threshold: float = 0.75,
                      max_hamming: int = 6, min_px: int = 16):
    """The foreachBatch fold of run_image_curation_streaming, exposed
    so replay semantics are directly testable. IDEMPOTENT under
    micro-batch replay (round-7 ADVICE): each epoch's keepers and
    gate survivors land in epoch=<id> PARTITION directories of
    ``out_dir/curated`` / ``out_dir/register`` written with overwrite
    — a replayed epoch overwrites its own partition instead of
    appending duplicates, and the incremental phash probe already
    supersedes replayed ids on the register side
    (phash_neardup_incremental's replay filter), so the pair set is
    unchanged on the second attempt. Existence probes use the Hadoop
    FS API, not os.path. Readers of the two stores see an extra
    ``epoch`` partition column."""
    from pyspark.sql import functions as SF

    from ..operators import dedup, multimodal
    from .windows import _hadoop_fs

    register = f"{out_dir}/register"
    curated = f"{out_dir}/curated"

    def curate_batch(batch_df, epoch_id):
        epoch_id = int(epoch_id)
        fs, P = _hadoop_fs(spark, out_dir)
        # same stage order as the batch pipeline (both gates are
        # row-local, so streamed == batch per row)
        basic = multimodal.basic_image_filters(batch_df, min_px=min_px)
        sized = batch_df.join(
            basic.where(SF.col("keep")).select("image_id"), on="image_id")
        gate = multimodal.clip_score_filter(sized,
                                            threshold=clip_threshold)
        aligned = sized.join(
            gate.where(SF.col("keep")).select("image_id"),
            on="image_id").localCheckpoint(eager=True)
        if fs.exists(P(register)):
            prior = spark.read.parquet(register).drop("epoch")
            pairs = dedup.phash_neardup_incremental(
                aligned, prior, max_hamming=max_hamming)
        else:
            pairs = dedup.phash_neardup(aligned, max_hamming=max_hamming)
        # batch keep_canonical == drop the larger id of every pair
        # (id-ordered arrival makes every cross-batch pair's larger id
        # the new image; ids are zero-padded so string max == numeric)
        losers = pairs.select(
            SF.greatest("id_a", "id_b").alias("image_id")).distinct()
        kept = aligned.join(losers, on="image_id", how="left_anti")
        bucketed = kept.join(
            multimodal.bucket_by_aspect(kept)
            .select("image_id", "bucket_id", "bucket_w", "bucket_h"),
            on="image_id")
        bucketed.write.mode("overwrite") \
            .parquet(f"{curated}/epoch={epoch_id}")
        aligned.write.mode("overwrite") \
            .parquet(f"{register}/epoch={epoch_id}")

    return curate_batch
