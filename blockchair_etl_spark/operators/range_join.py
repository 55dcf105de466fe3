"""Bucketized range (interval) join — proximity matching at scale.

`l JOIN r ON key AND |l.ts - r.ts| <= tol` expressed as an equi-join:
bucket both sides by floor(ts / tol); a qualifying pair's buckets can
differ by at most 1, so replicating the right side into its three
neighbor buckets turns the range predicate into an exact equi-join on
(key, bucket) followed by the precise interval filter.

Why not a plain theta-join: Spark plans non-equi conditions as
BroadcastNestedLoopJoin (O(|L|·|R|) and broadcast-bound). The bucket
form shuffles on (key, bucket) like any equi-join, scales with the
number of true near pairs, and AQE handles bucket skew. This is the
guide's "bucketize the range key + equi-join + filter" pattern for an
operator Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_secs: int,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs sharing `on` with |left_ts - right_ts| ≤
    tolerance. Column name collisions must be resolved upstream."""
    if how != "inner":
        raise ValueError("interval_join supports inner joins")
    tol_us = tolerance_secs * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l = left.withColumn("__us", l_us).withColumn(
        "__bucket", F.floor(F.col("__us") / tol_us)
    )
    r = (
        right.withColumn("__us_r", r_us)
        .withColumn(
            "__bucket",
            F.explode(
                F.array(
                    F.floor(F.col("__us_r") / tol_us) - 1,
                    F.floor(F.col("__us_r") / tol_us),
                    F.floor(F.col("__us_r") / tol_us) + 1,
                )
            ),
        )
    )
    return (
        l.join(r, [on, "__bucket"])
        .filter(F.abs(F.col("__us") - F.col("__us_r")) <= tol_us)
        .drop("__us", "__us_r", "__bucket")
    )
