"""Salted join / salted aggregation equivalence to the unsalted forms."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of left rows share one hot key
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    return left.cache(), right.cache()


def test_salted_inner_join_matches_plain(spark, skewed):
    from blockchair_etl_spark.operators.skew import salted_join

    left, right = skewed
    plain = left.join(right, ["k"]).groupBy("k").count()
    salted = salted_join(left, right, ["k"], salt=8).groupBy("k").count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_left_join_matches_plain(spark, skewed):
    from blockchair_etl_spark.operators.skew import salted_join

    left, right = skewed
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], salt=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("rv").isNull()).count()
        == salted.filter(F.col("rv").isNull()).count()
    )


def test_salted_join_rejects_right_outer(spark, skewed):
    from blockchair_etl_spark.operators.skew import salted_join

    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")


def test_salted_count_distinct_exact(spark):
    from blockchair_etl_spark.operators.skew import salted_count_distinct

    df = spark.range(50_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 1234).alias("x")
    )
    plain = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("x").alias("n")).collect()
    }
    salted = {
        r["g"]: r["n_distinct"] for r in salted_count_distinct(df, "g", "x").collect()
    }
    assert plain == salted
