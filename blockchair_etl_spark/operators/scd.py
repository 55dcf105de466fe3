"""SCD Type-2 merge emulation — CDC upserts without a MERGE-capable
table format.

Given the current dimension (one open row per key, `valid_to` null) and
a batch of updates, produce the new dimension state:

- changed keys: the open row is closed (`valid_to` = batch time) and a
  new open row is appended;
- new keys: appended open;
- unchanged keys (same tracked attributes): left untouched — no
  spurious versions;
- historical (closed) rows: passed through.

Pure DataFrame composition (anti-join + union + change comparison) —
the v1 emulation of `MERGE INTO` from transactional table formats. One
shuffle on the business key; at scale, partition the dimension by key
hash and the merge co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """→ new dimension state. `dim` columns: key, *tracked, valid_from,
    valid_to (null = open). `updates` columns: key, *tracked, and must
    be unique per key (last-writer-wins reduction is the caller's
    policy — apply it upstream, e.g. a row_number window over the CDC
    ordering column).

    The batch timestamp is cast to the dimension's own valid_from
    type, so ntz and ltz dimensions both merge without union type
    mismatches."""
    ts_type = dim.schema[valid_from].dataType
    ts = F.lit(batch_ts).cast(ts_type)
    closed_history = dim.filter(F.col(valid_to).isNotNull())
    open_rows = dim.filter(F.col(valid_to).isNull())

    upd = updates.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in tracked]
    )
    joined = open_rows.join(upd, open_rows[key] == F.col("__k"), "left")
    change = F.lit(False)
    for c in tracked:
        change = change | ~(
            F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        )
    has_update = F.col("__k").isNotNull()

    untouched = joined.filter(~has_update | ~change).select(*dim.columns)
    closed_now = (
        joined.filter(has_update & change)
        .select(*dim.columns)
        .withColumn(valid_to, ts)
    )
    replaced_keys = joined.filter(has_update & change).select(
        F.col(key).alias("__rk")
    )
    new_keys = upd.join(
        open_rows.select(F.col(key).alias("__ek")),
        F.col("__k") == F.col("__ek"),
        "left_anti",
    ).select("__k", *[f"__u_{c}" for c in tracked])
    fresh_src = new_keys.unionByName(
        upd.join(replaced_keys, F.col("__k") == F.col("__rk"), "left_semi")
    )
    fresh = fresh_src.select(
        F.col("__k").alias(key),
        *[F.col(f"__u_{c}").alias(c) for c in tracked],
    ).withColumn(valid_from, ts).withColumn(valid_to, F.lit(None).cast(ts_type))

    return closed_history.unionByName(untouched).unionByName(closed_now).unionByName(
        fresh.select(*dim.columns)
    )
