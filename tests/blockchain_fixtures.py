"""Deterministic synthetic blockchain tables per FIXTURES.md.

Generates the five raw tables (blocks, transactions, inputs, outputs,
addresses) with the cross-table invariants the reference DAG exercises:
referential integrity, child-count columns, fee conservation, the CDD
identity (with a few deliberately-off rows), ≥3-hop address chains plus
a cycle inside the query window, (recipient, time) ties for the W1
RANGE-frame check, fee=0 rows, and a handful of null recipients.
Seed fixed → byte-identical parquet across runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
N_BLOCKS = 30
TX_PER_BLOCK = 20
N_ADDRESSES = 80
T0 = pd.Timestamp("2024-03-01 00:00:00")
BTC_PRICE = 60000.0


def _hash(prefix: str, i: int) -> str:
    return hashlib.sha256(f"{prefix}:{i}".encode()).hexdigest()


def generate() -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(SEED)
    addresses = [f"addr{i:04d}" for i in range(N_ADDRESSES)]

    blocks_rows, tx_rows, input_rows, output_rows = [], [], [], []
    tx_counter = 0
    for b in range(N_BLOCKS):
        block_id = 800000 + b
        btime = T0 + pd.Timedelta(seconds=600 * b)
        block_tx = []
        for t in range(TX_PER_BLOCK):
            txh = _hash("tx", tx_counter)
            is_coinbase = 1 if t == 0 else 0
            n_in = 1 if is_coinbase else int(rng.integers(1, 5))
            n_out = int(rng.integers(1, 5))
            fee = 0 if (is_coinbase or rng.random() < 0.1) else int(rng.integers(1000, 50000))
            out_values = rng.integers(10_000, 10_000_000_000, size=n_out)
            output_total = int(out_values.sum())
            input_total = 0 if is_coinbase else output_total + fee
            in_values = None
            if not is_coinbase:
                in_values = np.full(n_in, input_total // n_in, dtype=np.int64)
                in_values[0] += input_total - int(in_values.sum())
            tx_cdd = 0.0
            for i in range(n_in):
                value = int(in_values[i]) if in_values is not None else 0
                lifespan = int(rng.integers(0, 86400 * 200))
                cdd = (lifespan / 86400.0) * (value / 1e8)
                # a few deliberately-off rows: validation-column use case
                if rng.random() < 0.03:
                    cdd = cdd + 1.5
                tx_cdd += cdd
                recipient = (
                    None
                    if rng.random() < 0.01
                    else addresses[int(rng.integers(0, N_ADDRESSES))]
                )
                input_rows.append(
                    dict(
                        block_id=block_id,
                        transaction_hash=txh,
                        index=i,
                        time=btime,
                        value=value,
                        value_usd=value / 1e8 * BTC_PRICE,
                        recipient=recipient,
                        type="pubkeyhash",
                        script_hex=_hash("script", tx_counter * 10 + i)[:64],
                        is_from_coinbase=is_coinbase,
                        is_spendable=1,
                        spending_block_id=block_id,
                        spending_transaction_hash=txh,
                        spending_index=i,
                        spending_time=btime + pd.Timedelta(seconds=lifespan),
                        spending_value_usd=value / 1e8 * BTC_PRICE,
                        spending_sequence=4294967295,
                        spending_signature_hex=_hash("sig", tx_counter * 10 + i),
                        spending_witness="w" * int(rng.integers(0, 64)),
                        lifespan=lifespan,
                        cdd=cdd,
                    )
                )
            for o in range(n_out):
                recipient = (
                    None
                    if rng.random() < 0.01
                    else addresses[int(rng.integers(0, N_ADDRESSES))]
                )
                output_rows.append(
                    dict(
                        block_id=block_id,
                        transaction_hash=txh,
                        index=o,
                        time=btime,
                        value=int(out_values[o]),
                        value_usd=int(out_values[o]) / 1e8 * BTC_PRICE,
                        recipient=recipient,
                        type="pubkeyhash",
                        script_hex=_hash("oscript", tx_counter * 10 + o)[:64],
                        is_from_coinbase=is_coinbase,
                        is_spendable=1,
                    )
                )
            tx_rows.append(
                dict(
                    block_id=block_id,
                    hash=txh,
                    time=btime,
                    size=int(rng.integers(200, 100_000)),
                    weight=0,
                    version=2,
                    lock_time=0,
                    is_coinbase=is_coinbase,
                    has_witness=int(rng.integers(0, 2)),
                    input_count=n_in,
                    output_count=n_out,
                    input_total=input_total,
                    input_total_usd=input_total / 1e8 * BTC_PRICE,
                    output_total=output_total,
                    output_total_usd=output_total / 1e8 * BTC_PRICE,
                    fee=fee,
                    fee_usd=fee / 1e8 * BTC_PRICE,
                    fee_per_kb=0.0,
                    fee_per_kb_usd=0.0,
                    fee_per_kwu=0.0,
                    fee_per_kwu_usd=0.0,
                    cdd_total=tx_cdd,
                )
            )
            block_tx.append(tx_rows[-1])
            tx_counter += 1
        blk_in = [r for r in input_rows if r["block_id"] == block_id]
        blk_out = [r for r in output_rows if r["block_id"] == block_id]
        fee_total = sum(t["fee"] for t in block_tx)
        blocks_rows.append(
            dict(
                id=block_id,
                hash=_hash("blk", b),
                time=btime,
                median_time=btime - pd.Timedelta(hours=1),
                size=int(rng.integers(100_000, 2_000_000)),
                stripped_size=90_000,
                weight=int(rng.integers(400_000, 4_000_000)),
                version=536870912,
                version_hex="20000000",
                version_bits="0" * 32,
                merkle_root=_hash("mr", b),
                nonce=int(rng.integers(0, 2**32)),
                bits=386089497,
                difficulty=88104191118793,
                chainwork=_hash("cw", b),
                coinbase_data_hex=_hash("cb", b)[:32],
                transaction_count=len(block_tx),
                witness_count=sum(t["has_witness"] for t in block_tx),
                input_count=len(blk_in),
                output_count=len(blk_out),
                input_total=sum(r["value"] for r in blk_in),
                input_total_usd=sum(r["value_usd"] for r in blk_in),
                output_total=sum(r["value"] for r in blk_out),
                output_total_usd=sum(r["value_usd"] for r in blk_out),
                fee_total=fee_total,
                fee_total_usd=fee_total / 1e8 * BTC_PRICE,
                fee_per_kb=0.0,
                fee_per_kb_usd=0.0,
                fee_per_kwu=0.0,
                fee_per_kwu_usd=0.0,
                cdd_total=sum(t["cdd_total"] for t in block_tx),
                generation=312_500_000,
                generation_usd=312_500_000 / 1e8 * BTC_PRICE,
                reward=312_500_000 + fee_total,
                reward_usd=(312_500_000 + fee_total) / 1e8 * BTC_PRICE,
                guessed_miner=f"miner{int(rng.integers(0, 10))}",
            )
        )

    # Deliberate ≥3-hop chain + cycle, inside the first week's window:
    # addr0000 → addr0001 → addr0002 → addr0003 → addr0000 (cycle), one
    # hop per consecutive block so tx_time ordering is stable.
    chain = [0, 1, 2, 3, 0]
    for hop in range(4):
        blk = blocks_rows[hop + 1]
        txh = _hash("chain", hop)
        btime = blk["time"]
        value = 5_000_000_000
        input_rows.append(
            dict(
                block_id=blk["id"],
                transaction_hash=txh,
                index=0,
                time=btime,
                value=value,
                value_usd=value / 1e8 * BTC_PRICE,
                recipient=addresses[chain[hop]],
                type="pubkeyhash",
                script_hex="00",
                is_from_coinbase=0,
                is_spendable=1,
                spending_block_id=blk["id"],
                spending_transaction_hash=txh,
                spending_index=0,
                spending_time=btime,
                spending_value_usd=value / 1e8 * BTC_PRICE,
                spending_sequence=4294967295,
                spending_signature_hex="00",
                spending_witness="",
                lifespan=3600,
                cdd=(3600 / 86400.0) * (value / 1e8),
            )
        )
        output_rows.append(
            dict(
                block_id=blk["id"],
                transaction_hash=txh,
                index=0,
                time=btime,
                value=value - 10_000,
                value_usd=(value - 10_000) / 1e8 * BTC_PRICE,
                recipient=addresses[chain[hop + 1]],
                type="pubkeyhash",
                script_hex="00",
                is_from_coinbase=0,
                is_spendable=1,
            )
        )
        tx_rows.append(
            dict(
                block_id=blk["id"],
                hash=txh,
                time=btime,
                size=250,
                weight=1000,
                version=2,
                lock_time=0,
                is_coinbase=0,
                has_witness=0,
                input_count=1,
                output_count=1,
                input_total=value,
                input_total_usd=value / 1e8 * BTC_PRICE,
                output_total=value - 10_000,
                output_total_usd=(value - 10_000) / 1e8 * BTC_PRICE,
                fee=10_000,
                fee_usd=10_000 / 1e8 * BTC_PRICE,
                fee_per_kb=0.0,
                fee_per_kb_usd=0.0,
                fee_per_kwu=0.0,
                fee_per_kwu_usd=0.0,
                cdd_total=(3600 / 86400.0) * (value / 1e8),
            )
        )

    addr_df = pd.DataFrame(
        dict(
            # superset of recipients plus zero-activity addresses
            # (J3 left-join retention), one clear top balance (O1)
            address=addresses + [f"cold{i:02d}" for i in range(10)],
            balance=list(rng.integers(0, 10_000_000_000, size=N_ADDRESSES))
            + [0] * 9
            + [10**12],
        )
    )
    return {
        "blocks": pd.DataFrame(blocks_rows),
        "transactions": pd.DataFrame(tx_rows),
        "inputs": pd.DataFrame(input_rows),
        "outputs": pd.DataFrame(output_rows),
        "addresses": addr_df,
    }


def write_parquet(tables: dict[str, pd.DataFrame], outdir: str) -> dict[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = {}
    for name, df in tables.items():
        p = f"{outdir}/{name}.parquet"
        # µs timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            p,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        paths[name] = p
    return paths
