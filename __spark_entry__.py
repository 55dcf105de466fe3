"""Driver contract for the spark-graft builder (PySpark target).

Backed by the blockchair_etl_spark package: `queryset.QUERIES` is the
single registry mapping SURVEY.md §2 operator ids to (Spark DataFrame
implementation, DuckDB oracle SQL) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Self-locating: the driver may load this file by path without the repo
# root on sys.path; the package import must still resolve.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from blockchair_etl_spark.queryset import QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Entries registered with driver=False (the pytest-only
    instrumentation twins — window-budget decision note in queryset.py)
    are excluded: they are still hash-checked against their oracles by
    tests/test_oracle_parity.py, just not through the driver window."""
    return {name: spec.fn for name, spec in QUERIES.items() if spec.driver}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.oracle is not None and spec.driver
    }
