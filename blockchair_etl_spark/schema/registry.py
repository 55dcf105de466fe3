"""Schema registry for the five raw blockchain tables.

Declared StructTypes equivalent to the reference DDLs
(`sql/ddl/create_blocks_raw.sql:1-38`, `create_transactions_raw.sql:1-24`,
`create_inputs_raw.sql:1-23`, `create_outputs_raw.sql:1-13`,
`create_addresses.sql:1-4`), mapped per SURVEY.md §1.2:
Snowflake INTEGER → LongType (satoshi amounts exceed 2^32), FLOAT →
DoubleType, VARCHAR(n) → StringType with the length tier kept as field
metadata (validation-only — Spark strings are unbounded), TIMESTAMP →
TimestampType. Column names are lowercase; the reference uppercases on
load but Snowflake identifier semantics are case-insensitive.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPES = {
    "int": LongType(),
    "float": DoubleType(),
    "ts": TimestampType(),
}


def _fields(spec: list[tuple[str, str]]) -> StructType:
    fields = []
    for name, t in spec:
        if t.startswith("str"):
            maxlen = int(t[3:]) if len(t) > 3 else None
            md = {"max_length": maxlen} if maxlen else {}
            fields.append(StructField(name, StringType(), True, metadata=md))
        else:
            fields.append(StructField(name, _TYPES[t], True))
    return StructType(fields)


BLOCKS_RAW = _fields(
    [
        ("id", "int"),
        ("hash", "str64"),
        ("time", "ts"),
        ("median_time", "ts"),
        ("size", "int"),
        ("stripped_size", "int"),
        ("weight", "int"),
        ("version", "int"),
        ("version_hex", "str16"),
        ("version_bits", "str32"),
        ("merkle_root", "str64"),
        ("nonce", "int"),
        ("bits", "int"),
        ("difficulty", "int"),
        ("chainwork", "str64"),
        ("coinbase_data_hex", "str256"),
        ("transaction_count", "int"),
        ("witness_count", "int"),
        ("input_count", "int"),
        ("output_count", "int"),
        ("input_total", "int"),
        ("input_total_usd", "float"),
        ("output_total", "int"),
        ("output_total_usd", "float"),
        ("fee_total", "int"),
        ("fee_total_usd", "float"),
        ("fee_per_kb", "float"),
        ("fee_per_kb_usd", "float"),
        ("fee_per_kwu", "float"),
        ("fee_per_kwu_usd", "float"),
        ("cdd_total", "float"),
        ("generation", "int"),
        ("generation_usd", "float"),
        ("reward", "int"),
        ("reward_usd", "float"),
        ("guessed_miner", "str16"),
    ]
)

TRANSACTIONS_RAW = _fields(
    [
        ("block_id", "int"),
        ("hash", "str64"),
        ("time", "ts"),
        ("size", "int"),
        ("weight", "int"),
        ("version", "int"),
        ("lock_time", "int"),
        ("is_coinbase", "int"),
        ("has_witness", "int"),
        ("input_count", "int"),
        ("output_count", "int"),
        ("input_total", "int"),
        ("input_total_usd", "float"),
        ("output_total", "int"),
        ("output_total_usd", "float"),
        ("fee", "int"),
        ("fee_usd", "float"),
        ("fee_per_kb", "float"),
        ("fee_per_kb_usd", "float"),
        ("fee_per_kwu", "float"),
        ("fee_per_kwu_usd", "float"),
        ("cdd_total", "float"),
    ]
)

INPUTS_RAW = _fields(
    [
        ("block_id", "int"),
        ("transaction_hash", "str64"),
        ("index", "int"),
        ("time", "ts"),
        ("value", "int"),
        ("value_usd", "float"),
        ("recipient", "str64"),
        ("type", "str32"),
        ("script_hex", "str256"),
        ("is_from_coinbase", "int"),
        ("is_spendable", "int"),
        ("spending_block_id", "int"),
        ("spending_transaction_hash", "str64"),
        ("spending_index", "int"),
        ("spending_time", "ts"),
        ("spending_value_usd", "float"),
        ("spending_sequence", "int"),
        ("spending_signature_hex", "str2048"),
        ("spending_witness", "str262144"),
        ("lifespan", "int"),
        ("cdd", "float"),
    ]
)

OUTPUTS_RAW = _fields(
    [
        ("block_id", "int"),
        ("transaction_hash", "str64"),
        ("index", "int"),
        ("time", "ts"),
        ("value", "int"),
        ("value_usd", "float"),
        ("recipient", "str64"),
        ("type", "str32"),
        ("script_hex", "str1024"),
        ("is_from_coinbase", "int"),
        ("is_spendable", "int"),
    ]
)

ADDRESS_RAW = _fields([("address", "str64"), ("balance", "int")])

RAW_SCHEMAS: dict[str, StructType] = {
    "blocks": BLOCKS_RAW,
    "transactions": TRANSACTIONS_RAW,
    "inputs": INPUTS_RAW,
    "outputs": OUTPUTS_RAW,
    "addresses": ADDRESS_RAW,
}

# COPY INTO pattern routing (load_data_to_snowflake.sh:109-134): filename
# substring → target table.
TABLE_FILE_PATTERNS: dict[str, str] = {
    "blocks": r".*blocks.*",
    "transactions": r".*transactions.*",
    "inputs": r".*inputs.*",
    "outputs": r".*outputs.*",
    "addresses": r".*addresses.*",
}
