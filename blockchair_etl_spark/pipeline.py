"""Pipeline orchestration: the transform DAG runner and the serving
layer's cache/retry contract.

§3.2: dbt's Jinja-rendered DAG becomes plain function composition —
Catalyst sees the whole lineage, so cross-"model" optimization
(predicate pushdown through staged views into raw scans) is automatic.
`run_transform_dag` materializes per the reference's per-layer policy
and runs the declared quality suite after build, like `dbt build`.

§3.3/§4: the dashboard's `run_query` wraps every query in a TTL result
cache (st.cache_data ttl=600, app.py:181) and tenacity retry ×3 with
exponential backoff (app.py:180). Spark has no cross-query result
cache, so `QueryCache` memoizes collected results keyed on
(name, params) with a TTL — same contract, engine-side.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from .io.sinks import REFERENCE_MATERIALIZATIONS, Materialization, materialize
from .quality.checks import CheckResult, run_checks
from .transform.intermediate import (
    int_address_balances_with_history,
    int_transaction_flows,
)
from .transform.marts import dim_addresses, dim_blocks, fct_transaction_traces
from .transform.staging import (
    stg_addresses,
    stg_blocks,
    stg_inputs,
    stg_outputs,
    stg_transactions,
)


def run_transform_dag(
    raw: dict[str, DataFrame],
    base_path: str | None = None,
    materializations: dict[str, Materialization] | None = None,
    with_checks: bool = True,
) -> tuple[dict[str, DataFrame], list[CheckResult]]:
    """Build the full staged → intermediate → mart DAG.

    `raw` maps {blocks, transactions, inputs, outputs, addresses} to
    their raw DataFrames. With `base_path`, table-materialized models
    are written (clustered parquet) and read back; otherwise everything
    stays lazy — useful for pushdown-preserving ad-hoc analysis.
    """
    mats = materializations or REFERENCE_MATERIALIZATIONS

    def mat(name: str, df: DataFrame) -> DataFrame:
        cfg = mats.get(name, Materialization("view"))
        return materialize(df, name, cfg, base_path=base_path)

    out: dict[str, DataFrame] = {}
    out["stg_blocks"] = mat("stg_blocks", stg_blocks(raw["blocks"]))
    out["stg_transactions"] = mat("stg_transactions", stg_transactions(raw["transactions"]))
    out["stg_inputs"] = mat("stg_inputs", stg_inputs(raw["inputs"]))
    out["stg_outputs"] = mat("stg_outputs", stg_outputs(raw["outputs"]))
    out["stg_addresses"] = mat("stg_addresses", stg_addresses(raw["addresses"]))
    out["int_transaction_flows"] = mat(
        "int_transaction_flows",
        int_transaction_flows(
            out["stg_blocks"], out["stg_transactions"], out["stg_inputs"], out["stg_outputs"]
        ),
    )
    out["int_address_balances_with_history"] = mat(
        "int_address_balances_with_history",
        int_address_balances_with_history(
            out["stg_addresses"], out["stg_inputs"], out["stg_outputs"]
        ),
    )
    out["fct_transaction_traces"] = mat(
        "fct_transaction_traces", fct_transaction_traces(out["int_transaction_flows"])
    )
    out["dim_addresses"] = mat(
        "dim_addresses", dim_addresses(out["int_address_balances_with_history"])
    )
    out["dim_blocks"] = mat("dim_blocks", dim_blocks(out["stg_blocks"]))

    checks = run_checks(out) if with_checks else []
    return out, checks


@dataclass
class QueryCache:
    """TTL result cache + bounded retry for serving queries
    (app.py:180-202 contract)."""

    ttl_secs: float = 600.0
    retries: int = 3
    backoff_min: float = 4.0
    backoff_max: float = 10.0
    _store: dict[tuple, tuple[float, Any]] = field(default_factory=dict)
    _clock: Callable[[], float] = time.monotonic
    _sleep: Callable[[float], None] = time.sleep

    def run(self, name: str, params: tuple, build: Callable[[], DataFrame]) -> list:
        """Collected result for (name, params), cached for ttl_secs;
        query execution retried ×3 with exponential backoff."""
        key = (name, params)
        now = self._clock()
        hit = self._store.get(key)
        if hit and now - hit[0] < self.ttl_secs:
            return hit[1]
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                rows = build().collect()
                self._store[key] = (self._clock(), rows)
                return rows
            except Exception as e:  # noqa: BLE001 — retry any execution error
                last = e
                if attempt < self.retries - 1:
                    self._sleep(min(self.backoff_min * (2**attempt), self.backoff_max))
        raise RuntimeError(f"query {name} failed after {self.retries} attempts") from last

    def invalidate(self) -> None:
        self._store.clear()
