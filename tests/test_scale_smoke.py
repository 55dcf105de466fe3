"""Scale smoke: run core shapes on multi-million-row GENERATED relations
(spark.range — no parquet, no driver data) to catch anything that only
breaks past toy size: per-row Python sneaking into a hot path, quadratic
expression expansion, partition-count collapse. Kept to seconds by using
pure-JVM generators."""

import time

from pyspark.sql import Window, functions as F


def test_hash_agg_5m_rows_partial_combine(spark):
    df = spark.range(0, 5_000_000).select(
        (F.col("id") % 1000).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    t0 = time.time()
    out = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
    )
    rows = out.collect()
    assert len(rows) == 1000
    assert all(r.n == 5000 for r in rows)
    assert time.time() - t0 < 30


def test_window_2m_rows_per_key_sort(spark):
    df = spark.range(0, 2_000_000).select(
        (F.col("id") % 5000).alias("k"), F.col("id").alias("seq")
    )
    w = Window.partitionBy("k").orderBy("seq")
    out = df.withColumn("rn", F.row_number().over(w))
    assert out.filter(F.col("rn") == 1).count() == 5000
    assert out.filter(F.col("rn") > 400).count() == 0


def test_deterministic_hash_sample_2m_rows_exact_reproducibility(spark):
    from blockchair_etl_spark.llmdata.sampling import hash_sample

    df = spark.range(0, 2_000_000).withColumnRenamed("id", "doc_id")
    n1 = hash_sample(df, "doc_id", prefix_lt="1a").count()
    n2 = hash_sample(df.repartition(7), "doc_id", prefix_lt="1a").count()
    assert n1 == n2  # selection independent of partitioning
    assert 0.09 < n1 / 2_000_000 < 0.115  # ~10.2% expected


def test_exact_dedup_3m_rows(spark):
    from blockchair_etl_spark.llmdata.dedup import exact_duplicate_groups

    df = spark.range(0, 3_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body-"), (F.col("id") % 1_000_000).cast("string")).alias("text"),
    )
    groups = exact_duplicate_groups(df)
    assert groups.count() == 1_000_000
    # every group has exactly 3 copies and the canonical id is the minimum
    assert groups.filter(F.col("n_docs") != 3).count() == 0
    assert groups.filter(F.col("canonical_id") >= 1_000_000).count() == 0
