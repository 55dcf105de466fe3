"""Staging layer: rename, unit-convert, key-filter the raw tables.

Re-expresses the reference's staged dbt views
(`transaction_tracing/models/staged/stg_blocks.sql:9-52`,
`stg_transactions.sql:9-36`, `stg_inputs.sql:9-35`,
`stg_outputs.sql:9-23`, `stg_addresses.sql:9-14`) as lazy DataFrame
functions. Staying lazy (no materialization) matches dbt
`materialized='view'` AND lets Catalyst push dashboard predicates all
the way into the raw parquet scans — the staged layer costs nothing at
plan time.

Column conventions (reference README policy): `_sats` integer satoshis,
`_btc` float BTC (sats/1e8), `_usd` float, `_bytes`/`_wu`/`_days`/
`_secs` for sizes and durations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..macros import calculate_cdd, convert_to_btc, seconds_to_days


def stg_blocks(blocks_raw: DataFrame) -> DataFrame:
    """stg_blocks.sql:9-52 — 42 columns incl. three unit systems."""
    return blocks_raw.select(
        F.col("id").alias("block_id"),
        F.col("hash").alias("block_hash"),
        F.col("time").alias("block_time"),
        F.col("median_time").alias("median_block_time"),
        F.col("size").alias("size_bytes"),
        F.col("stripped_size").alias("stripped_size_bytes"),
        F.col("weight").alias("weight_wu"),
        "version",
        "version_hex",
        "version_bits",
        "merkle_root",
        "nonce",
        "bits",
        "difficulty",
        "chainwork",
        "coinbase_data_hex",
        "transaction_count",
        "witness_count",
        "input_count",
        "output_count",
        F.col("input_total").alias("input_total_sats"),
        convert_to_btc("input_total").alias("input_total_btc"),
        F.col("input_total_usd").alias("input_total_usd"),
        F.col("output_total").alias("output_total_sats"),
        convert_to_btc("output_total").alias("output_total_btc"),
        F.col("output_total_usd").alias("output_total_usd"),
        F.col("fee_total").alias("fee_total_sats"),
        convert_to_btc("fee_total").alias("fee_total_btc"),
        F.col("fee_total_usd").alias("fee_total_usd"),
        F.col("fee_per_kb").alias("fee_per_kb_sats"),
        F.col("fee_per_kb_usd").alias("fee_per_kb_usd"),
        F.col("fee_per_kwu").alias("fee_per_kwu_sats"),
        F.col("fee_per_kwu_usd").alias("fee_per_kwu_usd"),
        F.col("cdd_total").alias("cdd_total_days"),
        F.col("generation").alias("generation_sats"),
        convert_to_btc("generation").alias("generation_btc"),
        F.col("generation_usd").alias("generation_usd"),
        F.col("reward").alias("reward_sats"),
        convert_to_btc("reward").alias("reward_btc"),
        F.col("reward_usd").alias("reward_usd"),
        "guessed_miner",
    ).filter(F.col("block_id").isNotNull())


def stg_transactions(transactions_raw: DataFrame) -> DataFrame:
    """stg_transactions.sql:9-36."""
    return transactions_raw.select(
        "block_id",
        F.col("hash").alias("transaction_hash"),
        F.col("time").alias("tx_time"),
        F.col("size").alias("size_bytes"),
        F.col("weight").alias("weight_wu"),
        "version",
        "lock_time",
        "is_coinbase",
        "has_witness",
        "input_count",
        "output_count",
        F.col("input_total").alias("input_total_sats"),
        convert_to_btc("input_total").alias("input_total_btc"),
        F.col("input_total_usd").alias("input_total_usd"),
        F.col("output_total").alias("output_total_sats"),
        convert_to_btc("output_total").alias("output_total_btc"),
        F.col("output_total_usd").alias("output_total_usd"),
        F.col("fee").alias("fee_sats"),
        convert_to_btc("fee").alias("fee_btc"),
        F.col("fee_usd").alias("fee_usd"),
        F.col("fee_per_kb").alias("fee_per_kb_sats"),
        F.col("fee_per_kb_usd").alias("fee_per_kb_usd"),
        F.col("fee_per_kwu").alias("fee_per_kwu_sats"),
        F.col("fee_per_kwu_usd").alias("fee_per_kwu_usd"),
        F.col("cdd_total").alias("cdd_total_days"),
    ).filter(F.col("transaction_hash").isNotNull())


def stg_inputs(inputs_raw: DataFrame) -> DataFrame:
    """stg_inputs.sql:9-35 — includes the calculated_cdd_days
    reconciliation column (calculate_cdd macro vs source cdd)."""
    return inputs_raw.select(
        "block_id",
        "transaction_hash",
        "index",
        "time",
        F.col("value").alias("value_sats"),
        convert_to_btc("value").alias("value_btc"),
        F.col("value_usd").alias("value_usd"),
        "recipient",
        "type",
        "script_hex",
        "is_from_coinbase",
        "is_spendable",
        "spending_block_id",
        "spending_transaction_hash",
        "spending_index",
        "spending_time",
        F.col("spending_value_usd").alias("spending_value_usd"),
        "spending_sequence",
        "spending_signature_hex",
        "spending_witness",
        F.col("lifespan").alias("lifespan_secs"),
        seconds_to_days("lifespan").alias("lifespan_days"),
        F.col("cdd").alias("cdd_days"),
        calculate_cdd("lifespan", "value").alias("calculated_cdd_days"),
    ).filter(F.col("transaction_hash").isNotNull())


def stg_outputs(outputs_raw: DataFrame) -> DataFrame:
    """stg_outputs.sql:9-23."""
    return outputs_raw.select(
        "block_id",
        "transaction_hash",
        "index",
        "time",
        F.col("value").alias("value_sats"),
        convert_to_btc("value").alias("value_btc"),
        F.col("value_usd").alias("value_usd"),
        "recipient",
        "type",
        "script_hex",
        "is_from_coinbase",
        "is_spendable",
    ).filter(F.col("transaction_hash").isNotNull())


def stg_addresses(address_raw: DataFrame) -> DataFrame:
    """stg_addresses.sql:9-14."""
    return address_raw.select(
        "address",
        F.col("balance").alias("balance_sats"),
        convert_to_btc("balance").alias("balance_btc"),
    ).filter(F.col("address").isNotNull())
