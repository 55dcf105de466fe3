"""SCD2 merge emulation: versioning semantics."""

import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.operators.scd import scd2_merge


@pytest.fixture()
def dim(spark):
    rows = [
        # key, segment, balance, valid_from, valid_to
        (1, "GOLD", 100.0, "2024-01-01 00:00:00", None),
        (2, "SILVER", 50.0, "2024-01-01 00:00:00", None),
        (3, "GOLD", 70.0, "2024-01-01 00:00:00", None),
        # key 2 already has history
        (2, "BRONZE", 40.0, "2023-01-01 00:00:00", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "k int, segment string, balance double, valid_from string, valid_to string"
    )
    return df.select(
        "k", "segment", "balance",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )


def test_scd2_merge_semantics(spark, dim):
    updates = spark.createDataFrame(
        [
            (1, "PLATINUM", 200.0),  # changed → close + new version
            (2, "SILVER", 50.0),     # unchanged → untouched
            (9, "GOLD", 10.0),       # new key → appended open
        ],
        "k int, segment string, balance double",
    )
    out = scd2_merge(
        dim, updates, key="k", tracked=["segment", "balance"],
        batch_ts="2024-06-01 00:00:00",
    )
    rows = {(r.k, str(r.valid_from), str(r.valid_to), r.segment) for r in out.collect()}

    # key 1: old row closed at batch ts, new open PLATINUM row
    assert (1, "2024-01-01 00:00:00", "2024-06-01 00:00:00", "GOLD") in rows
    assert (1, "2024-06-01 00:00:00", "None", "PLATINUM") in rows
    # key 2: open row untouched (no spurious version), history preserved
    assert (2, "2024-01-01 00:00:00", "None", "SILVER") in rows
    assert (2, "2023-01-01 00:00:00", "2024-01-01 00:00:00", "BRONZE") in rows
    # key 3: no update → untouched
    assert (3, "2024-01-01 00:00:00", "None", "GOLD") in rows
    # key 9: new open row
    assert (9, "2024-06-01 00:00:00", "None", "GOLD") in rows
    # 4 original rows (one now closed) + key-1 new version + key-9 new
    assert out.count() == 6

    # exactly one open row per key
    open_counts = (
        out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_merge_idempotent_on_no_change(spark, dim):
    updates = spark.createDataFrame(
        [(1, "GOLD", 100.0), (2, "SILVER", 50.0)],
        "k int, segment string, balance double",
    )
    out = scd2_merge(
        dim, updates, key="k", tracked=["segment", "balance"],
        batch_ts="2024-06-01 00:00:00",
    )
    assert out.count() == dim.count()
