"""Dashboard analytics queries over the mart tables.

Re-expresses the Streamlit dashboard's parameterized SQL
(`transaction_tracing/app.py:289-498`) as DataFrame builders. Each takes
mart DataFrames plus the dashboard's parameters (date window, address,
hop depth, caps) and returns a lazy DataFrame — filters push down
through the mart/staging lineage into the parquet scans.

The `/*+ NO_INDEX */` hints sprinkled in the reference SQL are no-ops on
Snowflake and are dropped; broadcast hints are applied where dims are
provably small (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .trace import trace_funds_with_fallback


def _window(col: str, start: str, end: str) -> Column:
    return F.col(col).between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp"))


def distinct_transaction_count(
    fct_traces: DataFrame, start: str, end: str
) -> DataFrame:
    """app.py:289-293 — COUNT(DISTINCT transaction_hash) in window (A2)."""
    return (
        fct_traces.filter(_window("tx_time", start, end))
        .agg(F.countDistinct("transaction_hash").alias("total_transactions"))
    )


def avg_nonzero_fee(fct_traces: DataFrame, start: str, end: str) -> DataFrame:
    """app.py:304-308 — COALESCE(AVG(NULLIF(fee_btc,0)),0) (A3/P7)."""
    nz = F.nullif(F.col("fee_btc"), F.lit(0.0))
    return (
        fct_traces.filter(_window("tx_time", start, end))
        .agg(F.coalesce(F.avg(nz), F.lit(0.0)).alias("avg_fee_btc"))
    )


def most_active_address(fct_traces: DataFrame, start: str, end: str) -> DataFrame:
    """app.py:239-246 — top source address by flow count (A4/O1)."""
    return (
        fct_traces.filter(_window("tx_time", start, end))
        .groupBy("source_address")
        .agg(F.count(F.lit(1)).alias("flow_count"))
        .orderBy(F.desc("flow_count"), F.asc("source_address"))
        .limit(1)
    )


def richest_address(dim_addresses: DataFrame) -> DataFrame:
    """app.py:319-324 — ORDER BY current_balance_btc DESC LIMIT 1 (O1)."""
    return (
        dim_addresses.orderBy(F.desc("current_balance_btc"), F.asc("address"))
        .limit(1)
        .select("address", "current_balance_sats", "current_balance_btc")
    )


def balance_trend(
    balances_history: DataFrame, address: str, start: str, end: str, limit: int = 1000
) -> DataFrame:
    """app.py:451-460 — running balance time series for one address (W1/O2)."""
    return (
        balances_history.filter(
            (F.col("address") == address) & _window("time", start, end)
        )
        .select("time", "running_balance_btc", "value_change_btc", "transaction_hash")
        .orderBy("time", "transaction_hash")
        .limit(limit)
    )


def block_metrics(
    dim_blocks: DataFrame, start: str, end: str, limit: int = 1000
) -> DataFrame:
    """app.py:488-498 — per-block metric trend in window (O2/P8)."""
    return (
        dim_blocks.filter(_window("block_time", start, end))
        .select(
            "block_id",
            "block_time",
            "transaction_count",
            "fee_total_btc",
            "reward_btc",
            "cdd_total_days",
        )
        .orderBy("block_time", "block_id")
        .limit(limit)
    )


def trace_from_address(
    fct_traces: DataFrame,
    dim_blocks: DataFrame,
    address: str,
    start: str,
    end: str,
    max_hops: int = 1,
    limit: int | None = 1000,
) -> DataFrame:
    """app.py:338-375 — the multi-hop fund trace (J5) joined to block
    context (J4), ORDER BY hop, tx_time LIMIT 1000, with the OOM→1-hop
    degradation contract (app.py:380-383).

    ``limit=None`` returns the full unordered result. Do NOT emulate
    that with a huge limit: Spark plans orderBy+limit as
    TakeOrderedAndProject, which allocates an O(limit) top-k buffer per
    partition — a multi-GB allocation for a sentinel-sized k.
    """
    edges = fct_traces.filter(_window("tx_time", start, end)).select(
        F.col("source_address").alias("src"),
        F.col("destination_address").alias("dst"),
        F.col("transaction_hash").alias("tx_hash"),
        "tx_time",
        "block_id",
        F.col("transferred_value_btc").alias("value_btc"),
    )
    traced, effective_hops = trace_funds_with_fallback(
        edges.select("src", "dst", "tx_hash", "tx_time"), address, max_hops
    )
    # Per-tx context: block_id is functionally determined by tx_hash;
    # value_btc varies per flow row, so take MIN for a deterministic
    # representative (dropDuplicates would pick an arbitrary row).
    tx_context = edges.groupBy("tx_hash").agg(
        F.min("block_id").alias("block_id"), F.min("value_btc").alias("value_btc")
    )
    enriched = (
        traced.join(tx_context, "tx_hash", "inner")
        .join(
            F.broadcast(dim_blocks.select("block_id", "block_time", "guessed_miner")),
            "block_id",
            "inner",
        )
        .select(
            "hop",
            F.col("src").alias("source_address"),
            F.col("dst").alias("destination_address"),
            F.col("tx_hash").alias("transaction_hash"),
            "tx_time",
            "value_btc",
            "block_time",
            "guessed_miner",
        )
    )
    if limit is not None:
        enriched = enriched.orderBy(
            "hop", "tx_time", "transaction_hash", "destination_address"
        ).limit(limit)
    return enriched
