"""Sequence packing: assign documents to fixed-token-budget bins.

Pretraining pipelines concatenate documents into fixed-length training
sequences; the batch-side primitive is assigning each document a
(pack_id, offset) under a token budget. This is greedy CONTIGUOUS
packing by stable id order — the streaming-chunk formulation: documents
fill a bin until the cumulative count crosses the budget; a straddling
document belongs to the bin where it starts (token-level splitting of
the straddler happens downstream at tensorization). Deterministic,
windowed, and SQL-expressible — no first-fit-decreasing bin search,
which cannot be expressed as a bounded window and over-optimizes for a
few % packing efficiency at corpus scale.

Scale shape: a GLOBAL ordered window would serialize onto one task, so
packing runs per shard (hash of the id): Window.partitionBy(shard)
.orderBy(id). Shards pack independently — exactly how a multi-node
data loader shards anyway — and the window state per task is one
running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import tokens_col


def assign_packs(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, shard, n_tokens, pack_id, pack_offset).

    pack_id is per-shard (global pack key = (shard, pack_id));
    pack_offset is the document's starting token position within its
    pack's budget window.
    """
    toks = F.size(tokens_col(text_col)).cast("bigint")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint")
    t = docs.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    return t.withColumn("__cum", cum_before).select(
        id_col,
        "shard",
        "n_tokens",
        F.expr(f"__cum DIV {budget}").cast("bigint").alias("pack_id"),
        F.pmod(F.col("__cum"), F.lit(budget)).cast("bigint").alias("pack_offset"),
    )
