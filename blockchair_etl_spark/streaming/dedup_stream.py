"""Streaming incremental MinHash dedup: the daily dedup loop as a
Structured Streaming operator.

The batch form (llmdata.dedup.incremental_minhash_dedup) documents the
production contract: "write `updated_store` out and reload it rather
than chaining unionByName over persisted batches". This module IS that
loop, run by the engine: a document stream drains per trigger
(Trigger.AvailableNow for a daily cadence, continuous micro-batches for
a firehose), and each micro-batch

  1. computes the batch's signature/band store once
     (llmdata.dedup.minhash_band_store),
  2. emits WITHIN-batch near-dup pairs (minhash_pairs_from_store) and
     batch-vs-index pairs (minhash_cross_pairs) against the persisted
     parquet index,
  3. appends the batch's signatures to the index — tomorrow's batch
     compares against them with no corpus rescan.

Parity: the union of pairs emitted across all micro-batches equals
minhash_lsh_pairs over the full corpus (every pair is found exactly
once — in the batch where its LATER document arrives), verified in
tests/test_llmdata.py. The md5-of-literal-seed hash family is what
makes signatures appended today comparable with signatures appended
last month.

Delivery semantics — two modes:

- Default (``exactly_once=False``): plain appends. foreachBatch is
  at-least-once on retry, so a micro-batch replayed after a failure
  can re-emit its pairs, and a failure between the store append and
  the checkpoint commit re-appends the batch's SIGNATURES too —
  duplicate store rows inflate the index and re-find the batch's pairs
  as cross-pairs on replay. Downstream consumers must dedup on
  (id_a, id_b).
- ``exactly_once=True``: both sinks are partitioned by ``batch_id``
  and written with DYNAMIC partition overwrite, so a replayed batch
  REWRITES exactly its own partition in both the pairs table and the
  store — idempotent under any failure point; and the cross-pair probe
  filters the current batch_id out of the index (partition-pruned), so
  signatures registered by a half-finished earlier attempt of the SAME
  batch can never echo its within-pairs back as cross-pairs. Verified
  by a simulated-replay test (same batch processed twice → identical
  pairs and store contents).

A store's mode is FIXED at creation: the batch_id partition column
either exists in the layout or it doesn't, and the two modes cannot
read each other's stores — mixing raises a ValueError naming the
mismatch instead of failing opaquely (exactly_once=True over an
unpartitioned store) or silently producing a mixed layout (append
mode into a partitioned store).

``exactly_once`` defaults to False ON PURPOSE: at-least-once matches
foreachBatch's native contract and costs nothing extra, while the
exactly-once mode buys its idempotence with a dynamic partition
overwrite per trigger (a directory swap per batch) and a batch_id
partition column in both sinks' layouts — a real cost and a layout
commitment a caller should opt into, exactly as Spark's own
foreachBatch leaves idempotence to the writer. Callers whose
downstream cannot dedup on (id_a, id_b) should pass
``exactly_once=True``.

Scale notes: per-trigger cost is O(|batch|) hashing + one band-bucket
join probing the index — the measured bigstore families
(BENCH_SCALING.json: dedup_incremental_mh_bigstore alpha≈0.29) are the
evidence this stays sublinear as the index outgrows the batch. The
batch_id partition column adds one directory level per trigger (a
daily loop = one partition per day — the layout a retention sweep
wants anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def make_batch_processor(
    store_dir: str,
    pairs_dir: str,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    exactly_once: bool = False,
    max_bucket: int | None = None,
):
    """The foreachBatch body, exposed so tests can drive it directly
    (including replaying a (batch_df, batch_id) to simulate a retry
    after a partial failure — the exactly-once contract's test)."""
    from ..caching import release_tracked, tracked_persist
    from ..llmdata.dedup import (
        minhash_band_store,
        minhash_cross_pairs,
        minhash_pairs_from_store,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # the batch store feeds three branches (within-pairs banding +
        # scoring, cross-pairs, the index append); persist so the
        # shingle→hash→agg pipeline runs once per micro-batch
        new_store = tracked_persist(
            minhash_band_store(
                batch_df, num_hashes, band_size, text_col, id_col, shingle_n
            )
        )
        try:
            pairs = minhash_pairs_from_store(
                new_store,
                num_hashes=num_hashes,
                threshold=threshold,
                max_bucket=max_bucket,
            )
            old = _check_mode_and_prune(
                _read_store(spark, store_dir), exactly_once, batch_id, store_dir
            )
            if old is not None:
                old = old.drop("batch_id")
                pairs = pairs.unionByName(
                    minhash_cross_pairs(
                        new_store,
                        old,
                        num_hashes,
                        threshold,
                        max_bucket=max_bucket,
                    )
                )
            if exactly_once:
                _overwrite_batch_partition(pairs, batch_id, pairs_dir)
                _overwrite_batch_partition(new_store, batch_id, store_dir)
            else:
                pairs.write.mode("append").parquet(pairs_dir)
                # store append LAST: a replayed batch re-emits pairs
                # (at-least-once, see module docstring) but never
                # registers its signatures before its pairs are durable
                new_store.write.mode("append").parquet(store_dir)
        finally:
            release_tracked()

    return _process


def _check_mode_and_prune(
    old: DataFrame | None, exactly_once: bool, batch_id: int, store_dir: str
) -> DataFrame | None:
    """Enforce the store's fixed delivery mode (module docstring) and,
    in exactly-once mode, prune the CURRENT batch's partition out of
    the cross probe — a half-finished earlier attempt of this batch may
    have registered its rows, and they must not echo within-batch pairs
    back as cross-pairs. Shared by the MinHash and media processors."""
    if old is None:
        return None
    if exactly_once:
        if "batch_id" not in old.columns:
            # a store created with exactly_once=False has no batch_id
            # partition column — the cross-probe filter below would
            # raise an opaque AnalysisException inside foreachBatch;
            # fail with the actual problem
            raise ValueError(
                f"signature store at {store_dir} was created with "
                "exactly_once=False (no batch_id partition); a "
                "store's delivery mode is fixed at creation — "
                "rebuild the store or run with exactly_once=False"
            )
        return old.filter(F.col("batch_id") != F.lit(int(batch_id)))
    if "batch_id" in old.columns:
        # the reverse mix would silently append unpartitioned rows
        # into a batch_id-partitioned layout
        raise ValueError(
            f"signature store at {store_dir} is batch_id-partitioned "
            "(created with exactly_once=True); a store's delivery "
            "mode is fixed at creation — run with exactly_once=True "
            "or rebuild the store"
        )
    return old


def make_media_batch_processor(
    store_dir: str,
    pairs_dir: str,
    max_hamming: int = 3,
    bits: int = 32,
    gram_bytes: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
    exactly_once: bool = False,
    max_bucket: int | None = None,
):
    """The MEDIA twin of make_batch_processor: a media stream
    (id, binary payload) drains per trigger; each micro-batch computes
    byte-gram SimHash fingerprints once, emits within-batch pairs
    (simhash_near_pairs) plus batch-vs-index pairs (simhash_cross_pairs
    — the batch side broadcasts, the index never shuffles), and appends
    its fingerprints to the store. Same delivery-mode contract and
    batch_id-partition machinery as the MinHash loop; SimHash's
    seed-free md5 fold makes fingerprints appended today comparable
    with fingerprints appended last month. Completes the streaming
    dedup surface across modalities alongside the batch twin
    (llmdata.dedup.incremental_media_dedup)."""
    from ..caching import release_tracked, tracked_persist
    from ..llmdata.dedup import (
        media_byte_fingerprints,
        simhash_cross_pairs,
        simhash_near_pairs,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # the fingerprint relation feeds three branches (within-pairs,
        # cross probe, index append); persist so the gram explode +
        # SimHash agg runs once per micro-batch
        new_fp = tracked_persist(
            media_byte_fingerprints(
                batch_df,
                bits=bits,
                gram_bytes=gram_bytes,
                id_col=id_col,
                content_col=content_col,
            )
        )
        try:
            pairs = simhash_near_pairs(
                new_fp, max_hamming=max_hamming, bits=bits, max_bucket=max_bucket
            )
            old = _check_mode_and_prune(
                _read_store(spark, store_dir), exactly_once, batch_id, store_dir
            )
            if old is not None:
                old = old.drop("batch_id")
                pairs = pairs.unionByName(
                    simhash_cross_pairs(
                        new_fp,
                        old,
                        max_hamming=max_hamming,
                        bits=bits,
                        max_bucket=max_bucket,
                    )
                )
            if exactly_once:
                _overwrite_batch_partition(pairs, batch_id, pairs_dir)
                _overwrite_batch_partition(new_fp, batch_id, store_dir)
            else:
                pairs.write.mode("append").parquet(pairs_dir)
                # store append LAST, same ordering rationale as the
                # MinHash processor
                new_fp.write.mode("append").parquet(store_dir)
        finally:
            release_tracked()

    return _process


def incremental_media_stream(
    media_stream: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bits: int = 32,
    gram_bytes: int = 4,
    id_col: str = "media_id",
    content_col: str = "content",
    exactly_once: bool = False,
    max_bucket: int | None = None,
):
    """media stream (id, content) → foreachBatch writer appending
    near-dup pairs to ``pairs_dir`` and fingerprints to ``store_dir``;
    caller picks the trigger and starts it, as with
    incremental_minhash_stream."""
    _process = make_media_batch_processor(
        store_dir,
        pairs_dir,
        max_hamming,
        bits,
        gram_bytes,
        id_col,
        content_col,
        exactly_once,
        max_bucket,
    )
    return media_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def make_winnowing_batch_processor(
    store_dir: str,
    pairs_dir: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    exactly_once: bool = False,
):
    """The WINNOWING (MOSS passage-level) twin of make_batch_processor:
    a document stream drains per trigger; each micro-batch extracts its
    winnowing fingerprint rows once (llmdata.text.winnowing_fingerprint_
    store — distinct (doc, fp) with n_fp denormalized), emits
    within-batch pairs (winnowing_pairs_from_store) plus batch-vs-index
    pairs (winnowing_cross_pairs — the batch side broadcasts, the index
    never shuffles and is never aggregated per-doc), and appends its
    fingerprint rows to the store. Same delivery-mode contract and
    batch_id-partition machinery as the MinHash loop; md5-derived
    fingerprints make rows appended today comparable with rows appended
    last month. Completes the streaming dedup surface for the MOSS
    family alongside the batch twin (llmdata.text.incremental_
    winnowing_dedup).

    Parity: with max_df=None the union of pairs across micro-batches
    equals winnowing_pairs over the full corpus (each pair found once,
    in the batch where its LATER document arrives — pair orientation is
    (new, existing) for cross pairs, so consumers normalize to the
    unordered pair). With max_df set the drained set is a SUPERSET of
    the one-shot df-bounded run with exact scores (df only grows —
    see winnowing_cross_pairs)."""
    from ..caching import release_tracked, tracked_persist
    from ..llmdata.text import (
        winnowing_cross_pairs,
        winnowing_fingerprint_store,
        winnowing_pairs_from_store,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # the fingerprint relation feeds three branches (within-pairs,
        # cross probe, index append); persist so normalization + k-gram
        # hashing + window selection run once per micro-batch
        new_fp = tracked_persist(
            winnowing_fingerprint_store(
                batch_df, k=k, window=window, text_col=text_col, id_col=id_col
            )
        )
        try:
            pairs = winnowing_pairs_from_store(
                new_fp.select("doc", "fp"),
                min_shared=min_shared,
                threshold=threshold,
                max_df=max_df,
            )
            old = _check_mode_and_prune(
                _read_store(spark, store_dir), exactly_once, batch_id, store_dir
            )
            if old is not None:
                old = old.drop("batch_id")
                pairs = pairs.unionByName(
                    winnowing_cross_pairs(
                        new_fp,
                        old,
                        min_shared=min_shared,
                        threshold=threshold,
                        max_df=max_df,
                    )
                )
            if exactly_once:
                _overwrite_batch_partition(pairs, batch_id, pairs_dir)
                _overwrite_batch_partition(new_fp, batch_id, store_dir)
            else:
                pairs.write.mode("append").parquet(pairs_dir)
                # store append LAST, same ordering rationale as the
                # MinHash processor
                new_fp.write.mode("append").parquet(store_dir)
        finally:
            release_tracked()

    return _process


def incremental_winnowing_stream(
    docs_stream: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    exactly_once: bool = False,
):
    """document stream (id, text) → foreachBatch writer appending
    passage-level near-dup pairs to ``pairs_dir`` and winnowing
    fingerprint rows to ``store_dir``; caller picks the trigger and
    starts it, as with incremental_minhash_stream."""
    _process = make_winnowing_batch_processor(
        store_dir,
        pairs_dir,
        k,
        window,
        min_shared,
        threshold,
        max_df,
        text_col,
        id_col,
        exactly_once,
    )
    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def _overwrite_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-batch write: dynamic partition overwrite replaces
    only the batch_id=<id> partition, leaving every other batch's
    output untouched — a replay rewrites its own partition byte-for-
    byte instead of appending a duplicate."""
    (
        df.withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def incremental_minhash_stream(
    docs_stream: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    exactly_once: bool = False,
):
    """docs stream (id, text) → foreachBatch writer that appends
    near-dup pairs to ``pairs_dir`` and signatures to ``store_dir``.

    Returns the un-started DataStreamWriter so the caller picks the
    trigger (``.trigger(availableNow=True)`` for the daily loop) and
    starts it. With ``exactly_once=True`` both sinks are batch_id-
    partitioned and replay-idempotent (module docstring).
    """
    _process = make_batch_processor(
        store_dir,
        pairs_dir,
        num_hashes,
        band_size,
        threshold,
        text_col,
        id_col,
        shingle_n,
        exactly_once,
    )
    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def _read_store(spark, path: str):
    """The store parquet, or None before the first batch has written it.

    A guarded read instead of a filesystem listing so the store can
    live on any Hadoop-compatible FS (object stores included), not
    just a local directory. AnalysisException here means PATH_NOT_FOUND
    or an empty directory ("unable to infer schema") — both only occur
    before the first append; later batches always find yesterday's
    files (appends are atomic per file)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def make_joint_batch_processor(
    text_store_dir: str,
    media_store_dir: str,
    pairs_dir: str,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_hamming: int = 3,
    width: int = 4,
    height: int = 8,
    decoder: str = "bytegrid",
    media_view=None,
    exactly_once: bool = False,
):
    """The CROSS-MODAL joint foreachBatch body (r11 verdict #6): each
    micro-batch carries both modality views of an arriving corpus
    slice; per trigger it emits the union of within-batch and
    batch-vs-index duplicate edges across BOTH modalities (text MinHash
    bands; pixel aHash pigeonhole blocks — the joint cluster rule spans
    modalities, so within-batch pairs are emitted here, unlike the
    single-modality loops where they're the one-shot operator's job)
    and maintains BOTH stores. Downstream, the accumulated pairs table
    IS the joint edge set: dedup.survivors_from_edges over it
    reproduces the batch composition's survivors (the same
    cumulative-parity contract as dedup.incremental_joint_dedup, which
    this loop is the streaming form of).

    ``media_view``: callable batch_df → (media_id, content, width,
    height, kind) building the pixel-side frame from the batch; None
    selects those columns verbatim with ``id_col`` as media_id (the
    shape a multimodal corpus table already has). width·height derives
    the fingerprint bits — the same can't-mismatch guard as the batch
    composition.

    Delivery semantics are the module's standard matrix, with THREE
    sinks instead of two: default at-least-once appends (pairs first,
    then both stores — a replay re-emits pairs but never registers
    signatures before its pairs are durable); ``exactly_once=True``
    partitions all three sinks by batch_id with dynamic overwrite and
    prunes the current batch_id out of BOTH cross probes
    (_check_mode_and_prune ×2), so a replay at any failure point —
    including between the two store writes — rewrites exactly its own
    partitions."""
    from ..caching import release_tracked, tracked_persist
    from ..llmdata import multimodal as _mm
    from ..llmdata.dedup import joint_edge_set, minhash_band_store

    bits = width * height

    def _media(batch_df: DataFrame) -> DataFrame:
        if media_view is not None:
            return media_view(batch_df)
        return batch_df.select(
            F.col(id_col).alias("media_id"), "content", "width", "height", "kind"
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        new_text = tracked_persist(
            minhash_band_store(
                batch_df, num_hashes, band_size, text_col, id_col, shingle_n
            )
        )
        new_fp = tracked_persist(
            _mm.ahash_fingerprints(
                _mm.resize_images(
                    _media(batch_df), width=width, height=height, decoder=decoder
                )
            )
        )
        try:
            old_text = _check_mode_and_prune(
                _read_store(spark, text_store_dir),
                exactly_once,
                batch_id,
                text_store_dir,
            )
            old_media = _check_mode_and_prune(
                _read_store(spark, media_store_dir),
                exactly_once,
                batch_id,
                media_store_dir,
            )
            # the edge rule is the SHARED body (dedup.joint_edge_set) —
            # within-batch ∪ cross-store across both modalities,
            # distinct per batch; cross-batch the accumulated table may
            # repeat an unordered pair only on at-least-once replay —
            # the documented consumer contract (dedup on the pair)
            edges = joint_edge_set(
                new_text,
                new_fp,
                old_text.drop("batch_id") if old_text is not None else None,
                old_media.drop("batch_id") if old_media is not None else None,
                num_hashes=num_hashes,
                threshold=threshold,
                max_hamming=max_hamming,
                bits=bits,
            )
            if exactly_once:
                _overwrite_batch_partition(edges, batch_id, pairs_dir)
                _overwrite_batch_partition(new_text, batch_id, text_store_dir)
                _overwrite_batch_partition(new_fp, batch_id, media_store_dir)
            else:
                edges.write.mode("append").parquet(pairs_dir)
                # stores LAST (same ordering rationale as the
                # single-modality loops); text before media is
                # arbitrary but fixed — a failure between the two store
                # writes replays into a rewrite of both in exactly-once
                # mode and a harmless re-append pair echo otherwise
                new_text.write.mode("append").parquet(text_store_dir)
                new_fp.write.mode("append").parquet(media_store_dir)
        finally:
            release_tracked()

    return _process


def incremental_joint_stream(
    docs_stream: DataFrame,
    text_store_dir: str,
    media_store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 16,
    band_size: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    max_hamming: int = 3,
    width: int = 4,
    height: int = 8,
    decoder: str = "bytegrid",
    media_view=None,
    exactly_once: bool = False,
):
    """multimodal corpus stream → foreachBatch writer maintaining the
    joint duplicate-edge table and BOTH modality stores; caller picks
    the trigger and starts it, as with incremental_minhash_stream."""
    _process = make_joint_batch_processor(
        text_store_dir,
        media_store_dir,
        pairs_dir,
        num_hashes,
        band_size,
        threshold,
        text_col,
        id_col,
        shingle_n,
        max_hamming,
        width,
        height,
        decoder,
        media_view,
        exactly_once,
    )
    return docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def make_cluster_assignment_updater(
    store_dir: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    **cc_kwargs,
):
    """foreachBatch body maintaining the duplicate-cluster ASSIGNMENT
    store over a stream of near-dup pairs — the natural downstream of
    the pair-emitting dedup loops in this module (point a pairs stream
    at their ``pairs_dir``): per trigger, fold the batch's edges into
    the persisted (doc, cluster_id) relation via
    clusters.incremental_connected_clusters (star-edge certificate —
    the pair history is never revisited) and atomically swap the store
    (temp-dir rename, the stream_cms_maintain pattern: assignments are
    a full-rewrite relation, cluster ids can change on merges, so
    batch_id partition overwrite does not fit).

    Replay safety, three layers: a crash between the swap's renames is
    recovered on the next trigger (io.sinks.recover_swapped_store — the
    previous generation is restored before anything reads); the store
    carries ``__last_batch`` and a replayed exact-last batch is SKIPPED
    (one cheap driver read); and even without the skip the update is a
    FIXED POINT — replayed edges are already inside the assignment's
    closure, so recomputing writes the identical relation. A store
    seeded by a BATCH job (plain (doc, cluster_id), no watermark
    column) is accepted as watermark-less. A batch_id BELOW the
    watermark means the checkpoint was reset while the store was kept;
    that raises, as in the CMS updater.

    Cache hygiene: connected_clusters registers its edge/mapping
    persists in the global tracked registry for the batch harness to
    release; this loop releases them per trigger in a finally — the
    same convention as every pair-emitting processor in this module.
    (Co-running loops may release each other's IN-FLIGHT persists:
    recompute cost only, never correctness — the destructive-release
    hazard is confined to checkpoint-backed encode entries, which
    nothing here registers.)"""
    from ..caching import release_tracked
    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..llmdata.clusters import incremental_connected_clusters

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        import os

        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        recover_swapped_store(store_dir)
        prior = None
        if os.path.exists(store_dir):
            prior = spark.read.parquet(store_dir)
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                if last is not None and int(last) == int(batch_id):
                    return  # replayed batch: already folded in
                if last is not None and int(last) > int(batch_id):
                    raise RuntimeError(
                        f"cluster assignment store at {store_dir} has "
                        f"__last_batch={last} but the stream delivered "
                        f"batch_id={batch_id}: checkpoint/store mismatch "
                        "(checkpoint reset while the store was kept?). "
                        "Reset the store with the checkpoint or use a "
                        "fresh store_dir."
                    )
                prior = prior.drop("__last_batch")
        try:
            updated = incremental_connected_clusters(
                prior, batch_df.select(id_a, id_b), id_a, id_b, **cc_kwargs
            ).withColumn("__last_batch", F.lit(int(batch_id)).cast("bigint"))
            atomic_swap_store(updated, store_dir)
        finally:
            release_tracked()

    return _update


def cluster_assignment_stream(
    pairs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    **cc_kwargs,
):
    """near-dup pairs stream → continuously maintained (doc, cluster_id)
    assignment store; caller picks the trigger and starts it. Composes
    the streaming dedup story end-to-end: signature loops emit pairs,
    this loop resolves survivors' transitive closure — neither ever
    rescans history."""
    _update = make_cluster_assignment_updater(store_dir, id_a, id_b, **cc_kwargs)
    return pairs_stream.writeStream.foreachBatch(_update).option(
        "checkpointLocation", checkpoint_dir
    )
