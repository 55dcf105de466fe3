"""Mart layer: serving fact/dim tables.

Re-expresses `models/marts/fct_transaction_traces.sql`,
`dim_addresses.sql`, `dim_blocks.sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fct_transaction_traces(int_transaction_flows: DataFrame) -> DataFrame:
    """fct_transaction_traces.sql:8-25 — flow edges renamed to
    source/destination plus a ROW_NUMBER trace_sequence per transaction
    (W2). The reference orders only by tx_time (constant within a
    transaction), so sequence assignment among ties is arbitrary but the
    set of sequence numbers per tx is deterministic: 1..n."""
    w = Window.partitionBy("transaction_hash").orderBy("tx_time")
    return int_transaction_flows.select(
        F.col("input_address").alias("source_address"),
        F.col("output_address").alias("destination_address"),
        "transaction_hash",
        "block_id",
        "tx_time",
        F.col("input_value_sats").alias("transferred_value_sats"),
        F.col("input_value_btc").alias("transferred_value_btc"),
        F.col("input_value_usd").alias("transferred_value_usd"),
        "fee_sats",
        "fee_btc",
        "fee_usd",
        "tx_type",
        "input_cdd_days",
        "block_cdd_days",
        "block_reward_btc",
    ).withColumn("trace_sequence", F.row_number().over(w))


def dim_addresses(int_address_balances_with_history: DataFrame) -> DataFrame:
    """dim_addresses.sql:8-16 — per-address lifetime rollup
    (GROUP BY 1,2,3 ordinals → the three address/balance columns)."""
    return int_address_balances_with_history.groupBy(
        "address", "current_balance_sats", "current_balance_btc"
    ).agg(
        F.sum("value_change_sats").alias("lifetime_value_change_sats"),
        F.sum("value_change_btc").alias("lifetime_value_change_btc"),
        F.countDistinct("transaction_hash").alias("tx_count"),
    )


def dim_blocks(stg_blocks: DataFrame) -> DataFrame:
    """dim_blocks.sql:8-22 — block serving dim (13-column projection)."""
    return stg_blocks.select(
        "block_id",
        "block_hash",
        "block_time",
        "difficulty",
        "transaction_count",
        "fee_total_sats",
        "fee_total_btc",
        "fee_total_usd",
        "reward_sats",
        "reward_btc",
        "reward_usd",
        "cdd_total_days",
        "guessed_miner",
    )
