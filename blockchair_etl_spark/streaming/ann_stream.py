"""Streaming IVF-PQ index maintenance: the daily ANN-index append loop
as a Structured Streaming operator.

The batch form (llmdata.pq.ivfpq_index_append) documents the deployment
contract: arriving vectors are encoded against FROZEN trained
centroids/codebooks and landed in the index with one row per id, so the
appended index is bit-identical to re-encoding the full corpus with the
same artifacts (probe results never depend on arrival order). This
module IS that loop, run by the engine: a vector stream drains per
trigger (Trigger.AvailableNow for the daily cadence), and each
micro-batch

  1. encodes its vectors against the frozen artifacts
     (llmdata.pq.ivfpq_encode — coarse cluster + PQ residual codes),
  2. drops ids the index already holds (first-wins; see below), via a
     store-side LEFT SEMI probe with the broadcast batch key set — the
     index-sized store NEVER shuffles, same posture as every
     incremental dedup store probe,
  3. appends the novel rows to the parquet index — tomorrow's queries
     (llmdata.pq.ivfpq_adc_topk_from_index) see them with no rebuild.

The artifacts follow the same write-once/read-forever contract as the
BPE merge list (tokenizer.merges_to_frame): train once, persist with
centroids_to_frame / codebooks_to_frame (llmdata.ivf / llmdata.pq),
and every later stream loads them ONCE per stream lifetime with the
frame_to_* inverses before building the processor — never per trigger.
Retraining the artifacts is the full-rebuild cadence, not the append;
the recall instrumentation entry (ann_ivfpq_recall) is the drift
monitor that schedules it.

First-wins vs batch-wins: the batch twin's _dedup_store_union rewrites
the whole index relation, so a re-ingested id can take the batch's
version. A streaming store is append-only parquet — the old row cannot
be retracted per trigger — so a re-arriving id is DROPPED instead.
Under the frozen-artifact contract the two policies are bit-identical
(same vector, same artifacts, same codes); they diverge only if a
caller re-ingests a MUTATED embedding under an existing id, which the
daily-ingest contract forbids (that's an index rebuild).

Delivery semantics — the standard two modes (dedup_stream docstring):

- Default (``exactly_once=False``): plain appends. The first-wins
  anti-join doubles as replay insurance — a micro-batch replayed after
  a failure between the store append and the checkpoint commit finds
  its own rows already registered and appends nothing, so the store
  holds one row per id even at-least-once (stronger than the dedup
  loops, whose pair sinks can re-emit; this loop has only the store).
- ``exactly_once=True``: the store is partitioned by ``batch_id`` and
  written with dynamic partition overwrite; the current batch's
  partition is pruned from the dedup probe (a half-finished earlier
  attempt must not anti-join its own replay down to an empty
  overwrite, which would leave the stale partition in place).

A store's mode is FIXED at creation, enforced by the shared
_check_mode_and_prune guard.

Scale notes: per-trigger cost is O(|batch|) encode arithmetic (the
fixed-point expression chain, no Python stage) plus ONE store scan for
the semi-probe — both join sides broadcast the batch-sized relation,
so the plan is two BroadcastHashJoins with the store streaming
(plan-gated in tests/test_ivf.py). The batch_id partition column adds
one directory level per trigger; flatten_batch_store / retention are
the maintenance round-trip, as for the dedup stores.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .dedup_stream import (
    _check_mode_and_prune,
    _overwrite_batch_partition,
    _read_store,
)


def novel_index_rows(
    encoded: DataFrame, store: DataFrame, batch_keys: DataFrame, id_col: str
) -> DataFrame:
    """The batch's not-yet-indexed rows: ids the store already holds are
    dropped (first-wins, module docstring). Exposed for the plan gate —
    the store side must stream through two BroadcastHashJoins (the
    batch key set broadcasts into the LEFT SEMI probe, the probe's
    store-sized-at-most-batch-sized result broadcasts into the LEFT
    ANTI), so the index never shuffles however large it grows."""
    present = store.join(F.broadcast(batch_keys), id_col, "left_semi").select(
        id_col
    )
    return encoded.join(F.broadcast(present), id_col, "left_anti")


def make_ivfpq_batch_processor(
    store_dir: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exactly_once: bool = False,
):
    """The foreachBatch body, exposed so tests can drive it directly
    (including replaying a (batch_df, batch_id) to simulate a retry
    after a partial failure — the delivery-contract tests)."""
    from ..llmdata.pq import ivfpq_encode

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        encoded = ivfpq_encode(batch_df, centroids, codebooks, id_col, vec_col)
        # collapse in-batch id collisions (a duplicated source file, or
        # one id twice in a trigger) BEFORE the store probe, or both
        # rows would pass the anti-join and break one-row-per-id. The
        # min-struct winner is deterministic even for conflicting
        # payloads — unlike dropDuplicates, whose pick is partition-
        # order-dependent
        encoded = (
            encoded.groupBy(id_col)
            .agg(F.min(F.struct("ivf_cluster", "codes")).alias("_e"))
            .select(
                id_col,
                F.col("_e.ivf_cluster").alias("ivf_cluster"),
                F.col("_e.codes").alias("codes"),
            )
        )
        old = _check_mode_and_prune(
            _read_store(spark, store_dir), exactly_once, batch_id, store_dir
        )
        if old is not None:
            # keys from the raw batch, not the encoded frame — column
            # pruning makes this an id-only scan, no second encode
            keys = batch_df.select(id_col).distinct()
            encoded = novel_index_rows(encoded, old.drop("batch_id"), keys, id_col)
        if exactly_once:
            _overwrite_batch_partition(encoded, batch_id, store_dir)
        else:
            encoded.write.mode("append").parquet(store_dir)

    return _process


def incremental_ivfpq_stream(
    vec_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exactly_once: bool = False,
):
    """vector stream (id, embedding) → foreachBatch writer appending
    frozen-artifact IVF-PQ rows to ``store_dir``; caller picks the
    trigger and starts it, as with incremental_minhash_stream. Load the
    artifacts once per stream lifetime (frame_to_centroids /
    frame_to_codebooks over their persisted relations) before calling."""
    _process = make_ivfpq_batch_processor(
        store_dir, centroids, codebooks, id_col, vec_col, exactly_once
    )
    return vec_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
