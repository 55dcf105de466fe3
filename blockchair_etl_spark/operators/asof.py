"""As-of (backward) join — an operator Spark lacks natively.

For each left row, attach the latest right row with the same key and
right_ts ≤ left_ts. Expressed as a pure DataFrame composition (the
SURVEY's "custom operators" option (a)): tag both sides, union, and run
one `last(payload, ignorenulls=True)` window over (key, ts, side) —
right rows sort before left rows at equal timestamps so ties respect
the ≤ bound. One shuffle on the key, no UDF, no per-group pandas.

Scale: equivalent to a merge join after the single (key, ts) sort —
the union trick means the sort amortizes both sides at once. Skewed
keys behave like any window partition (AQE handles the shuffle; a hot
key serializes its own partition, as in every engine's as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    payload_prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every left row, plus `payload_cols` from the
    latest right row with right[right_ts] <= left[left_ts] (nulls when
    no prior right row exists). Right side should be unique per
    (key, ts) for deterministic results — dedupe upstream if not.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols
    ]
    return matched.select(*out_cols)
