"""Bounded-depth iterative graph traversal (multi-hop fund tracing).

Re-expresses the reference's recursive-CTE trace
(`transaction_tracing/app.py:338-375`; worked example
`transaction_tracing/README.md:24-57`) on Spark, which has no recursive
CTE: a driver-side loop of frontier joins, exactly equivalent to the
bounded-depth recursion —

    seed:  rows with source_address = X               (hop 1)
    step:  frontier ⋈ edges ON frontier.dst = edges.src  (hop h+1)
    total: UNION ALL of all hops

Faithful semantic details:

- Hop-bounded, NOT visited-set-bounded: cycles within the bound are
  traversed again, and path multiplicity is preserved (UNION ALL, no
  dedup) — matching the reference CTE row-for-row.
- Degradation contract: the reference retries at max_hops=1 when the
  warehouse reports recursive-join OOM (`app.py:380-383`);
  :func:`trace_funds_with_fallback` reproduces that.

Scale design: each hop is one shuffle join keyed on src. The edge set is
re-used every hop, so we hash-partition it on `src` once and persist;
every subsequent hop's join co-locates on the same partitioning (no
re-shuffle of the big side). Frontiers get `localCheckpoint` to truncate
the growing lineage, and a per-hop row guard enforces the memory
envelope instead of discovering OOM mid-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import release_local_checkpoint


class TraceBudgetExceeded(RuntimeError):
    """Raised when a hop's frontier exceeds the configured row budget."""


def trace_funds(
    edges: DataFrame,
    source,
    max_hops: int = 1,
    max_frontier_rows: int | None = None,
    reuse_edge_partitioning: bool = True,
) -> DataFrame:
    """Trace flows outward from ``source`` for up to ``max_hops`` hops.

    ``edges`` must have columns (src, dst, tx_hash, tx_time); the result
    adds a leading ``hop`` column (1-based), like the reference CTE's
    hop counter.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    out_cols = ["hop", "src", "dst", "tx_hash", "tx_time"]

    step_edges = edges
    persisted = []
    frontier_ckpts: list[DataFrame] = []
    if reuse_edge_partitioning and max_hops > 1:
        # One shuffle up front; hops 2..N join on this partitioning.
        step_edges = edges.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(step_edges)

    frontier = (
        step_edges.filter(F.col("src") == F.lit(source))
        .withColumn("hop", F.lit(1))
        .select(*out_cols)
    )
    acc = frontier

    for hop in range(2, max_hops + 1):
        if max_frontier_rows is not None:
            n = frontier.count()
            if n > max_frontier_rows:
                for df in persisted:
                    df.unpersist()
                # nothing is returned on this path — any frontier
                # blocks the budget counts materialized go too
                for df in frontier_ckpts:
                    release_local_checkpoint(df)
                raise TraceBudgetExceeded(
                    f"hop {hop - 1} frontier has {n} rows > budget {max_frontier_rows}"
                )
        # Path multiplicity preserved: one output row per (path, edge) pair.
        parents = frontier.select(F.col("dst").alias("parent_dst"))
        frontier = (
            step_edges.join(parents, F.col("src") == F.col("parent_dst"))
            .withColumn("hop", F.lit(hop))
            .select(*out_cols)
        )
        # Truncate lineage so plan depth stays O(1) per hop, not O(hops).
        frontier = frontier.localCheckpoint(eager=False)
        frontier_ckpts.append(frontier)
        acc = acc.unionByName(frontier)

    if persisted:
        # Materialize the accumulated result, then release the cached
        # edge relation — otherwise every dashboard trace leaves a
        # MEMORY_AND_DISK copy of the full edge set resident in executor
        # storage. The eager checkpoint severs the result's lineage from
        # the cache, so unpersisting cannot trigger recomputation later.
        acc = acc.localCheckpoint(eager=True)
        for df in persisted:
            df.unpersist()
        # ...and the per-hop frontier checkpoints (lazy; they
        # materialized while acc's eager checkpoint computed) are now
        # dead weight behind acc's own blocks — release them explicitly
        # (DataFrame.unpersist never frees checkpoint blocks; r12,
        # caching.release_local_checkpoint). Only acc's checkpoint
        # remains, reclaimed when the caller drops the result.
        for df in frontier_ckpts:
            release_local_checkpoint(df)

    return acc


def trace_funds_with_fallback(
    edges: DataFrame,
    source,
    max_hops: int,
    max_frontier_rows: int = 5_000_000,
) -> tuple[DataFrame, int]:
    """Trace with the reference's OOM degradation contract
    (`app.py:380-383`): if the requested depth blows the per-hop budget,
    re-run at max_hops=1. Returns (result, effective_hops)."""
    try:
        return (
            trace_funds(edges, source, max_hops, max_frontier_rows=max_frontier_rows),
            max_hops,
        )
    except TraceBudgetExceeded:
        return trace_funds(edges, source, max_hops=1), 1
