"""Incremental ingestion: the daily-batch contract, plus its Structured
Streaming upgrade.

The reference's incremental axis is batch-daily (SURVEY.md §2.10): one
file per (coin, type, day), downloaded for yesterday
(`download_blockchair_data.py:305-311`), idempotent re-load
(`--skip-existing`), 3-day retention. Two Spark-native expressions:

1. `incremental_batch_load` — the faithful mapping: per-day overwrite of
   a `date=YYYYMMDD` partition + retention sweep. Deterministic,
   replayable, no streaming state.
2. `stream_daily_files` / `windowed_event_counts` — the idiomatic
   upgrade: a file-source stream with `Trigger.AvailableNow` drains new
   arrivals per run (same cadence, but exactly-once file tracking via
   checkpoint instead of filename bookkeeping), and watermarked
   event-time windows handle late data — capabilities the reference's
   shell loop approximates manually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..io.sinks import retention_sweep, write_daily_partition
from ..io.sources import parse_dump_filename, read_tsv


def incremental_batch_load(
    spark: SparkSession,
    files: list[str],
    schemas: dict[str, StructType],
    base_path: str,
    retention_days_cutoff: str | None = None,
) -> dict[str, list[str]]:
    """Route daily dump files into date partitions (one overwrite per
    (table, day) — idempotent), then sweep expired partitions."""
    loaded: dict[str, list[str]] = {}
    for f in files:
        parsed = parse_dump_filename(f)
        if not parsed:
            continue
        _, data_type, yyyymmdd = parsed
        if data_type not in schemas:
            continue
        df = read_tsv(spark, f, schema=schemas[data_type])
        write_daily_partition(df, base_path, data_type, yyyymmdd)
        loaded.setdefault(data_type, []).append(yyyymmdd)
    if retention_days_cutoff:
        for table in loaded:
            retention_sweep(base_path, table, retention_days_cutoff)
    return loaded


def stream_daily_files(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    out_dir: str,
) -> StreamingQuery:
    """File-source stream draining available files once per invocation
    (Trigger.AvailableNow): exactly-once per-file processing with the
    checkpoint as the source of truth — replaces `--skip-existing`
    filename bookkeeping. Appends to a date-partitioned parquet sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("sep", "\t")
        .option("header", "true")
        .option("maxFilesPerTrigger", 16)
        .csv(landing_dir)
    )
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Watermarked event-time window aggregation — the streaming form
    of queryset.tumbling_hourly_events (default) or, with ``slide``,
    of queryset.hopping_window_events (each row lands in
    window/slide overlapping windows). Late rows within the watermark
    still land in their event-time window; older ones are dropped and
    the state store stays bounded (the 100 TB/day state-size guard)."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> StreamingQuery:
    """End-to-end streaming pipeline: parquet file source → watermarked
    windowed aggregate → parquet sink, drained with AvailableNow."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window, watermark, slide=slide)
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def stream_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_secs: int = 600,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the streaming twin of
    `operators.range_join.interval_join` (same pair semantics: equal key,
    |left_ts - right_ts| <= tolerance).

    Both sides carry a watermark and the join condition bounds right_ts
    to a window around left_ts, so Spark can evict state once the
    watermark passes ts + tolerance: state is O(key-rate x (watermark +
    tolerance)) regardless of total stream length — the unbounded-join
    formulation that survives an always-on 100 TB/day feed.

    `how='left_outer'` additionally emits every unmatched left row
    (right columns null) — but only once the watermark passes its
    match window, because until then a matching right row could still
    arrive; late-data completeness and result latency trade off via
    the watermark delay. Same state bound as inner.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            "stream-stream interval join supports how='inner'/'left_outer' "
            f"(got {how!r}); right_outer is the mirrored call"
        )
    lw = left_stream.withWatermark(left_ts, watermark).alias("l")
    rw = right_stream.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{on} = r.{on} AND "
        f"r.{right_ts} >= l.{left_ts} - INTERVAL {tolerance_secs} SECONDS AND "
        f"r.{right_ts} <= l.{left_ts} + INTERVAL {tolerance_secs} SECONDS"
    )
    return lw.join(rw, cond, how).drop(F.col(f"r.{on}"))


def stream_upsert_daily(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    out_dir: str,
    ts_col: str = "ts",
) -> StreamingQuery:
    """foreachBatch incremental upsert: each micro-batch is rewritten
    into `date=YYYYMMDD` partitions with dynamic partition overwrite —
    the streaming form of `incremental_batch_load`'s idempotent per-day
    contract. A replayed micro-batch (restart after a sink failure)
    overwrites the same partitions instead of appending duplicates."""
    stream = spark.readStream.schema(schema).parquet(events_dir)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("date", F.date_format(F.col(ts_col), "yyyyMMdd"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session windows (F.session_window): the built-in form of
    the gap-based sessionizer. Three interchangeable expressions of the
    same semantics exist in this engine — batch lag+cumsum
    (queryset.sessionize_events), custom state (streaming/sessionize.py),
    and this built-in — tested against each other."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_events(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact deduplication — the streaming twin of
    `llmdata.dedup.exact_dedup` for an append-only event feed.

    dropDuplicatesWithinWatermark keeps one row per key and evicts each
    key's state once the watermark passes its event time, so state is
    O(key-rate x watermark window) instead of O(all keys ever seen) —
    the only formulation that survives an unbounded feed. Duplicates
    arriving later than the watermark window are NOT caught (the
    standard at-least-once ingestion contract: upstream retries land
    within seconds, so a watermark of hours bounds state with no
    practical recall loss)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)


def stream_cms_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    key_col: str = "user_id",
    width: int = 256,
) -> "StreamingQuery":
    """Continuously maintained count-min sketch — the streaming form of
    `operators/approx.cms_build` for always-on heavy-hitter tracking.

    Each micro-batch is sketched with the same portable hash family and
    CELL-WISE MERGED into the persisted sketch store (read → cms_merge →
    atomic overwrite via a temp-dir rename), so the store after any
    prefix of the stream equals `cms_build` over exactly the events seen
    so far — the mergeability contract tested batch-vs-stream. State is
    the fixed O(depth×width) cell relation regardless of stream length;
    the per-batch cost is one map-side explode + two tiny hash-aggs.

    foreachBatch (not a stateful agg) on purpose: the sketch must
    outlive the query and be readable by any engine mid-stream, which a
    parquet relation gives for free.

    Replay-idempotent: the store carries the last applied batch_id
    (``__last_batch``, one constant column), and a micro-batch replayed
    after a failure between the store swap and the checkpoint commit is
    SKIPPED instead of cell-merged a second time — without this, a
    replay double-counts the batch's events and the store no longer
    equals cms_build over the events seen (verified by a simulated
    replay test). Only the exact-last-batch case is skipped: a batch_id
    BELOW the stored watermark means the checkpoint was reset while the
    store was kept (re-numbered batches may carry new events), and that
    raises instead of silently dropping data."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_cms_updater(store_dir, key_col, width)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_cms_updater(store_dir: str, key_col: str = "user_id", width: int = 256):
    """The stream_cms_maintain foreachBatch body, exposed so tests can
    replay a (batch_df, batch_id) directly to exercise the idempotence
    contract."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import cms_build, cms_merge

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_sketch = cms_build(
            batch_df.select(F.col(key_col).cast("bigint").alias("k")), "k", width
        )
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                if last is not None and int(last) == int(batch_id):
                    return  # replayed batch: already folded into the store
                if last is not None and int(last) > int(batch_id):
                    # A genuine foreachBatch replay always re-delivers the
                    # LAST batch (batch_id == last). last > batch_id can
                    # only mean the checkpoint was reset/recreated while
                    # the store was kept — re-numbered batches may carry
                    # NEW events, so silently skipping them would leave
                    # the store stale. Fail loudly: the operator must
                    # either reset the store with the checkpoint or point
                    # the stream at a fresh store_dir.
                    raise RuntimeError(
                        f"CMS store at {store_dir} has __last_batch={last} "
                        f"but the stream delivered batch_id={batch_id}: "
                        "checkpoint/store mismatch (checkpoint reset while "
                        "the store was kept?). Reset the store with the "
                        "checkpoint or use a fresh store_dir."
                    )
                prior = prior.drop("__last_batch")
            merged = cms_merge(prior, batch_sketch)
        else:
            merged = batch_sketch
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        # swap with no unrecoverable window (r13 review: the old
        # rmtree-then-rename order could crash with NEITHER store
        # present, and the replay would rebuild from one batch alone)
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def make_cms_grouped_updater(
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    width: int = 256,
):
    """foreachBatch body maintaining the per-GROUP CMS store — the
    grouped sibling of make_cms_updater and the frequency half of the
    per-dimension dashboard pair (make_kmv_grouped_updater is the
    cardinality half): per micro-batch, the batch's grouped sketch
    (approx.cms_build_grouped) cell-wise merges through the ONE grouped
    merge definition (cms_merge_grouped) and the store swaps
    atomically. State is O(groups × depth × width) rows forever; the
    merged-store prefix equals cms_build_grouped over exactly the rows
    seen (cell-wise sum is associative and commutative per (g, row,
    col)). Same watermark/recovery/idempotence contract as the flat
    updater — the exact-last-batch skip plus the loud
    checkpoint-mismatch failure."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import cms_build_grouped, cms_merge_grouped

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_sketch = cms_build_grouped(
            batch_df.select(
                F.col(group_col).alias("g"),
                F.col(key_col).cast("bigint").alias("k"),
            ).filter(F.col("g").isNotNull()),
            "g",
            "k",
            width,
        )
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                if last is not None and int(last) == int(batch_id):
                    return  # replayed batch: already folded in
                if last is not None and int(last) > int(batch_id):
                    raise RuntimeError(
                        f"grouped CMS store at {store_dir} has "
                        f"__last_batch={last} but the stream delivered "
                        f"batch_id={batch_id}: checkpoint/store mismatch "
                        "(checkpoint reset while the store was kept?). "
                        "Reset the store with the checkpoint or use a "
                        "fresh store_dir."
                    )
                prior = prior.drop("__last_batch")
            merged = cms_merge_grouped(prior, batch_sketch)
        else:
            merged = batch_sketch
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_cms_grouped_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    width: int = 256,
) -> "StreamingQuery":
    """Continuously maintained per-group CMS sketches — always-on
    per-dimension heavy-hitter tracking with O(groups × depth × width)
    state."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_cms_grouped_updater(store_dir, group_col, key_col, width)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the streaming twin of the J1
    broadcast dim join. The static side is re-resolved per micro-batch
    (so a refreshed dim table picks up on the next trigger) and Spark
    plans it as a broadcast hash join against each micro-batch: no
    streaming state at all, unlike a stream-stream join. This is the
    right shape for enriching a 100 TB/day feed with dimension tables —
    state cost zero, dim freshness = trigger interval."""
    return stream.join(F.broadcast(dim), on, how)


def make_kmv_updater(store_dir: str, key_col: str = "user_id", k: int = 64):
    """foreachBatch body maintaining a KMV distinct-count sketch store —
    the KMV sibling of make_cms_updater, completing the continuously-
    maintained sketch-store family: per micro-batch, the batch's k
    smallest distinct 60-bit hashes (operators.approx.kmv_mins) merge
    into the persisted `mins` relation (union, re-take the k smallest —
    the lossless KMV merge), and the store swaps atomically. The store
    after any stream prefix equals kmv_mins over exactly the rows seen,
    so kmv_union-style estimation over it matches the batch sketch —
    state is O(k) rows forever, the 100 TB always-on cardinality shape.

    Same replay contract as the CMS updater: __last_batch watermark
    (exact-last replay skipped, below-watermark raises), crash-window
    recovery via recover_swapped_store. Unlike CMS cell merges, a
    re-merged batch is ALSO a semantic no-op (min-k union is
    idempotent), so even a lost watermark cannot corrupt the sketch —
    the skip only saves work."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import kmv_merge_mins, kmv_mins

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_mins = kmv_mins(batch_df, key_col, k=k)
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            # a store seeded by a BATCH job (plain kmv_mins relation,
            # no watermark column) is accepted as watermark-less —
            # the CMS sibling's legacy-store contract
            last = None
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                prior = prior.drop("__last_batch")
            if last is not None and int(last) == int(batch_id):
                return
            if last is not None and int(last) > int(batch_id):
                raise RuntimeError(
                    f"KMV store at {store_dir} has __last_batch={last} "
                    f"but the stream delivered batch_id={batch_id}: "
                    "checkpoint/store mismatch (checkpoint reset while "
                    "the store was kept?). Reset the store with the "
                    "checkpoint or use a fresh store_dir."
                )
            merged = kmv_merge_mins([prior, batch_mins], k=k)
        else:
            merged = batch_mins
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_kmv_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    key_col: str = "user_id",
    k: int = 64,
) -> "StreamingQuery":
    """Continuously maintained KMV sketch — always-on distinct-count
    tracking with O(k) state; the streaming form of
    operators.approx.kmv_distinct via the mergeability contract."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_kmv_updater(store_dir, key_col, k)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_hll_updater(store_dir: str, key_col: str = "user_id", p: int = 10):
    """foreachBatch body maintaining a HyperLogLog register store — the
    fourth continuously-maintained sketch beside CMS/KMV/histograms:
    per micro-batch, the batch's (bucket, r) registers
    (operators.approx.hll_registers) merge into the persisted relation
    by register-wise MAX (the HLL union law) and the store swaps
    atomically. State is ≤ 2^p rows FOREVER — the fixed-memory
    always-on cardinality shape; the store after any stream prefix
    equals hll_registers over exactly the rows seen, so hll_estimate
    over it matches the batch sketch bit-exactly.

    Same replay contract as the KMV updater (__last_batch watermark,
    crash-window recovery), and like KMV — unlike CMS cell sums — the
    max-merge is IDEMPOTENT, so even a lost watermark cannot corrupt
    the sketch; the skip only saves work."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import hll_merge, hll_registers

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_regs = hll_registers(batch_df, key_col, p=p)
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            last = None
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                prior = prior.drop("__last_batch")
            if last is not None and int(last) == int(batch_id):
                return
            if last is not None and int(last) > int(batch_id):
                raise RuntimeError(
                    f"HLL store at {store_dir} has __last_batch={last} "
                    f"but the stream delivered batch_id={batch_id}: "
                    "checkpoint/store mismatch (checkpoint reset while "
                    "the store was kept?). Reset the store with the "
                    "checkpoint or use a fresh store_dir."
                )
            merged = hll_merge([prior, batch_regs])
        else:
            merged = batch_regs
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_hll_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    key_col: str = "user_id",
    p: int = 10,
) -> "StreamingQuery":
    """Continuously maintained HLL register store — always-on distinct
    counting at fixed 2^p-row state; the streaming form of
    operators.approx.hll_distinct via the register-max union law."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_hll_updater(store_dir, key_col, p)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_kmv_grouped_updater(
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 64,
):
    """foreachBatch body maintaining the per-GROUP KMV store — the
    grouped sibling of make_kmv_updater: per micro-batch, the batch's
    per-group k smallest distinct hashes (approx.kmv_mins_grouped)
    merge through the ONE grouped merge definition
    (kmv_merge_mins_grouped), and the store swaps atomically. State is
    O(groups x k) rows forever; per-group estimation off the live
    store (approx.kmv_estimate_grouped) equals the batch sketch over
    exactly the rows seen. Same watermark/recovery/idempotence
    contract as the flat updater (min-k union per group is idempotent,
    so the skip only saves work)."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import kmv_merge_mins_grouped, kmv_mins_grouped

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_mins = kmv_mins_grouped(batch_df, group_col, key_col, k=k)
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            last = None
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                prior = prior.drop("__last_batch")
            if last is not None and int(last) == int(batch_id):
                return
            if last is not None and int(last) > int(batch_id):
                raise RuntimeError(
                    f"grouped KMV store at {store_dir} has "
                    f"__last_batch={last} but the stream delivered "
                    f"batch_id={batch_id}: checkpoint/store mismatch "
                    "(checkpoint reset while the store was kept?). "
                    "Reset the store with the checkpoint or use a "
                    "fresh store_dir."
                )
            merged = kmv_merge_mins_grouped([prior, batch_mins], k=k)
        else:
            merged = batch_mins
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_kmv_grouped_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 64,
) -> "StreamingQuery":
    """Continuously maintained per-group KMV sketches — always-on
    per-dimension distinct-count tracking with O(groups x k) state."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_kmv_grouped_updater(store_dir, group_col, key_col, k)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_histogram_updater(
    store_dir: str,
    value_col: str = "value",
    group_col: str = "event_type",
    bin_scale: int = 8,
    value_range: "tuple[float, float] | None" = None,
):
    """foreachBatch body maintaining a fixed-bin histogram-quantile
    sketch store — the third continuously-maintained sketch beside CMS
    and KMV: per micro-batch, the batch's (g, bin, cnt) cells
    (operators.approx.histogram_bins) cell-merge into the persisted
    relation through the shared histogram_merge definition, and the
    store swaps atomically. Quantiles read off the live store at any
    time via histogram_quantiles_from_bins — state is O(groups × value
    range × scale) regardless of stream length. External concurrent
    readers load the store through io.sinks.read_live_store (the swap
    has a transient not-exists window; readers retry, they never run
    recover_swapped_store — that recovery is writer-only, r13 review).

    Same replay contract as the CMS/KMV updaters: __last_batch
    watermark (exact-last replay skipped, below-watermark raises,
    batch-seeded watermark-less stores accepted), crash-window recovery
    via recover_swapped_store. Like CMS (and unlike KMV), a re-merge
    DOUBLE-COUNTS, so the watermark is load-bearing here.

    ``value_range`` forwards to histogram_bins' range contract: a
    drifting production value fails the micro-batch loudly in-plan
    instead of silently inflating the cell store past the state bound
    the scale was sized for (r16 verdict stretch #7)."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import histogram_bins, histogram_merge

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_bins = histogram_bins(
            batch_df, value_col, group_col, bin_scale, value_range
        )
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            last = None
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                prior = prior.drop("__last_batch")
            if last is not None and int(last) == int(batch_id):
                return
            if last is not None and int(last) > int(batch_id):
                raise RuntimeError(
                    f"histogram store at {store_dir} has __last_batch="
                    f"{last} but the stream delivered batch_id="
                    f"{batch_id}: checkpoint/store mismatch (checkpoint "
                    "reset while the store was kept?). Reset the store "
                    "with the checkpoint or use a fresh store_dir."
                )
            merged = histogram_merge(prior, batch_bins)
        else:
            merged = batch_bins
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_histogram_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    value_col: str = "value",
    group_col: str = "event_type",
    bin_scale: int = 8,
    value_range: "tuple[float, float] | None" = None,
) -> "StreamingQuery":
    """Continuously maintained histogram-quantile sketch — always-on
    per-group quantile tracking with bounded state; the streaming form
    of operators.approx.histogram_quantiles via the cell-merge
    contract."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_histogram_updater(
        store_dir, value_col, group_col, bin_scale, value_range
    )
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_hll_grouped_updater(
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    p: int = 10,
):
    """foreachBatch body maintaining the per-GROUP HLL register store —
    the grouped sibling of make_hll_updater: per micro-batch, the
    batch's (g, bucket, r) registers (approx.hll_registers_grouped)
    merge through the ONE grouped union law (hll_merge_grouped:
    register-wise max within each group), and the store swaps
    atomically. State is ≤ groups × 2^p rows forever; per-group
    estimation off the live store (approx.hll_estimate_grouped) equals
    the batch sketch over exactly the rows seen. Same
    watermark/recovery contract as the flat updater, and the max-merge
    is idempotent, so the replay skip only saves work."""
    import os

    from ..io.sinks import atomic_swap_store, recover_swapped_store
    from ..operators.approx import hll_merge_grouped, hll_registers_grouped

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        recover_swapped_store(store_dir)
        batch_regs = hll_registers_grouped(batch_df, group_col, key_col, p=p)
        if os.path.exists(store_dir):
            prior = batch_df.sparkSession.read.parquet(store_dir)
            last = None
            if "__last_batch" in prior.columns:
                last = prior.agg(F.max("__last_batch")).first()[0]
                prior = prior.drop("__last_batch")
            if last is not None and int(last) == int(batch_id):
                return
            if last is not None and int(last) > int(batch_id):
                raise RuntimeError(
                    f"grouped HLL store at {store_dir} has "
                    f"__last_batch={last} but the stream delivered "
                    f"batch_id={batch_id}: checkpoint/store mismatch "
                    "(checkpoint reset while the store was kept?). "
                    "Reset the store with the checkpoint or use a "
                    "fresh store_dir."
                )
            merged = hll_merge_grouped([prior, batch_regs])
        else:
            merged = batch_regs
        merged = merged.withColumn(
            "__last_batch", F.lit(int(batch_id)).cast("bigint")
        )
        atomic_swap_store(merged, store_dir, partitions=1)

    return _update


def stream_hll_grouped_maintain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    store_dir: str,
    group_col: str = "event_type",
    key_col: str = "user_id",
    p: int = 10,
) -> "StreamingQuery":
    """Continuously maintained per-group HLL registers — always-on
    per-dimension distinct counting at fixed per-group state."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    _update = make_hll_grouped_updater(store_dir, group_col, key_col, p)
    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
