"""Skew-mitigation operators: salted joins and salted aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by subdividing oversized partitions. These explicit variants
cover the cases AQE cannot: skewed *broadcast-ineligible* joins where
one hot key (the reference's J2 hazard — a transaction with thousands
of inputs×outputs, int_transaction_flows.sql:45-46) would pin a single
task, and high-cardinality-key aggregations whose partial aggregation
doesn't reduce (e.g. COUNT DISTINCT under one hot group).

Both are pure DataFrame rewrites — semantics identical to the unsalted
form, verified in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over `salt` buckets.

    left gets a salt ∈ [0, salt) derived deterministically from row
    content (xxhash64 over all columns); right is replicated `salt`
    times (explode of a literal range) so every (key, salt) pair still
    meets. Use when the LEFT side is skewed and the right side is too
    large to broadcast but small enough to replicate `salt`×.

    The salt is content-derived, not F.rand(): a nondeterministic salt
    re-routes recomputed rows to different shuffle partitions on stage
    retry (SPARK-23207-class duplicate/loss hazard) and makes output
    partitioning irreproducible across runs. Hashing the whole row keeps
    hot-key rows spread even when the join keys themselves are constant.

    Supported joins: inner / left (semantics preserved because right
    replication never invents left rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves semantics for inner/left only")
    salt_col = "__salt"
    lsalted = left.withColumn(
        salt_col, F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    rsalted = right.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rsalted, on + [salt_col], how)
    return out.drop(salt_col)


def salted_count_distinct(
    df: DataFrame, group_col: str, distinct_col: str, salt: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per group in two stages: partial distinct over
    (group, salt(x)) buckets, then sum of bucket counts. The hot group's
    distinct set spreads across `salt` reducers instead of one.

    Exact (not approximate): bucketing by hash(x) partitions the
    distinct set, and distinct-within-bucket sums to the true count.
    Returns (group_col, n_distinct).
    """
    bucketed = df.select(
        group_col, F.col(distinct_col), (F.abs(F.hash(distinct_col)) % salt).alias("__b")
    )
    partial = (
        bucketed.groupBy(group_col, "__b")
        .agg(F.countDistinct(distinct_col).alias("__n"))
    )
    return partial.groupBy(group_col).agg(F.sum("__n").alias("n_distinct"))
