"""Intermediate layer: the two materialized transform tables.

Re-expresses `models/intermediate/int_transaction_flows.sql` and
`int_address_balances_with_history.sql` as DataFrame functions.

Scale notes (100 TB design):

- int_transaction_flows is the engine's row-explosion hotspot: joining
  tx→inputs→outputs on the tx key yields the |inputs|×|outputs| cross
  product per transaction by design (candidate flow edges). High-fan-out
  transactions make the composite join key heavily skewed — AQE skew-join
  splitting (enabled in session.py) handles the physical side; the blocks
  dim join is an explicit broadcast (blocks ≈ 144 rows/day vs millions of
  tx rows).
- int_address_balances_with_history shuffles once on `address` and the
  window reuses that partitioning (Catalyst plans the left join and
  the three running sums over a single address-hash exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def int_transaction_flows(
    stg_blocks: DataFrame,
    stg_transactions: DataFrame,
    stg_inputs: DataFrame,
    stg_outputs: DataFrame,
) -> DataFrame:
    """int_transaction_flows.sql:8-46 — denormalized per-tx flow fan-out.

    Row-count invariant (oracle check): for each transaction,
    |rows| = max(|inputs|,1) × max(|outputs|,1) (left joins keep
    tx rows with no inputs/outputs as single null rows).
    """
    blocks = F.broadcast(
        stg_blocks.select(
            F.col("block_id").alias("b_block_id"),
            "block_time",
            F.col("cdd_total_days").alias("b_cdd_total_days"),
            F.col("reward_btc").alias("b_reward_btc"),
        )
    )
    tx = stg_transactions
    inputs = stg_inputs.select(
        F.col("transaction_hash").alias("in_transaction_hash"),
        F.col("block_id").alias("in_block_id"),
        F.col("recipient").alias("input_address"),
        F.col("value_sats").alias("input_value_sats"),
        F.col("value_btc").alias("input_value_btc"),
        F.col("value_usd").alias("input_value_usd"),
        F.col("cdd_days").alias("input_cdd_days"),
        "lifespan_days",
        "is_from_coinbase",
    )
    outputs = stg_outputs.select(
        F.col("transaction_hash").alias("out_transaction_hash"),
        F.col("block_id").alias("out_block_id"),
        F.col("recipient").alias("output_address"),
        F.col("value_sats").alias("output_value_sats"),
        F.col("value_btc").alias("output_value_btc"),
        F.col("value_usd").alias("output_value_usd"),
    )
    return (
        tx.join(blocks, tx.block_id == blocks.b_block_id, "left")
        .drop("b_block_id")
        .join(
            inputs,
            (tx.transaction_hash == inputs.in_transaction_hash)
            & (tx.block_id == inputs.in_block_id),
            "left",
        )
        .join(
            outputs,
            (tx.transaction_hash == outputs.out_transaction_hash)
            & (tx.block_id == outputs.out_block_id),
            "left",
        )
        .select(
            "transaction_hash",
            "block_id",
            F.col("block_time").alias("tx_time"),
            "input_address",
            "output_address",
            "input_value_sats",
            "input_value_btc",
            "output_value_sats",
            "output_value_btc",
            "input_value_usd",
            "output_value_usd",
            "fee_sats",
            "fee_btc",
            "fee_usd",
            "input_cdd_days",
            F.col("b_cdd_total_days").alias("block_cdd_days"),
            "lifespan_days",
            F.when(F.col("is_from_coinbase") == 1, "coinbase")
            .otherwise("standard")
            .alias("tx_type"),
            F.col("b_reward_btc").alias("block_reward_btc"),
        )
    )


def int_address_balances_with_history(
    stg_addresses: DataFrame,
    stg_inputs: DataFrame,
    stg_outputs: DataFrame,
) -> DataFrame:
    """int_address_balances_with_history.sql:8-50 — spend/receive event
    union, left-joined to the address dim (zero-activity addresses kept
    with null history), with RANGE-frame running balances in all three
    units. Default window frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW):
    ties on (address, time) share the running value, matching Snowflake.
    """
    spends = stg_inputs.select(
        F.col("recipient").alias("address"),
        "time",
        (-F.col("value_sats")).alias("value_change_sats"),
        (-F.col("value_btc")).alias("value_change_btc"),
        (-F.col("value_usd")).alias("value_change_usd"),
        "transaction_hash",
    )
    receives = stg_outputs.select(
        F.col("recipient").alias("address"),
        "time",
        F.col("value_sats").alias("value_change_sats"),
        F.col("value_btc").alias("value_change_btc"),
        F.col("value_usd").alias("value_change_usd"),
        "transaction_hash",
    )
    changes = spends.unionByName(receives)

    a = stg_addresses.alias("a")
    c = changes.alias("c")
    joined = a.join(c, F.col("a.address") == F.col("c.address"), "left")

    w = Window.partitionBy(F.col("a.address")).orderBy(F.col("c.time"))
    return joined.select(
        F.col("a.address").alias("address"),
        F.col("c.time").alias("time"),
        F.col("c.transaction_hash").alias("transaction_hash"),
        F.col("c.value_change_sats").alias("value_change_sats"),
        F.col("c.value_change_btc").alias("value_change_btc"),
        F.col("c.value_change_usd").alias("value_change_usd"),
        F.sum(F.col("c.value_change_sats")).over(w).alias("running_balance_sats"),
        F.sum(F.col("c.value_change_btc")).over(w).alias("running_balance_btc"),
        F.sum(F.col("c.value_change_usd")).over(w).alias("running_balance_usd"),
        F.col("a.balance_sats").alias("current_balance_sats"),
        F.col("a.balance_btc").alias("current_balance_btc"),
    )
