"""Bloom join pruning: no false negatives, bounded bitset, fp behavior."""

from pyspark.sql import functions as F

from blockchair_etl_spark.io.sources import load_table
from blockchair_etl_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_pruned_join,
)


def test_bloom_no_false_negatives_and_bounded_state(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    words = bloom_build(supp, "s_suppkey")
    assert len(words) == 8192 // 64  # dense fixed-size bitset, ~1 KiB
    li = load_table(spark, sf_dir, "lineitem")
    passed = li.filter(bloom_might_contain("l_suppkey", words))
    true_match = li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
    # every true match passes the filter (no false negatives)
    assert true_match.join(
        passed.select("l_suppkey").distinct(), "l_suppkey", "left_anti"
    ).count() == 0
    # and the filter actually prunes
    assert passed.count() < li.count()


def test_bloom_pruned_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") > 9000
    ).select("s_suppkey")
    got = bloom_pruned_join(li, supp, "l_suppkey", "s_suppkey")
    want = li.join(supp, li.l_suppkey == supp.s_suppkey)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_negative_keys_no_false_negatives(spark):
    # plain % would put negative keys at negative bit positions: the
    # build then writes end-relative words (Python dense[-k]) while the
    # probe's element_at reads a different word (or errors at index 0)
    # — silent false negatives. pmod keeps positions in [0, m_bits).
    # 100 keys in 8192 bits, k=4 → fp ≈ 5e-6 (same budget as the
    # non-negative fp test below)
    dim = spark.range(-200, -100).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k")
    assert all(isinstance(w, int) for w in words)
    # every inserted (negative) key must pass its own filter
    missed = dim.filter(~bloom_might_contain("k", words)).count()
    assert missed == 0
    # and the filter still discriminates: disjoint negative probes pass rarely
    probes = spark.range(-1_020_000, -1_000_000).select(F.col("id").alias("k"))
    assert probes.filter(bloom_might_contain("k", words)).count() <= 5


def test_bloom_pruned_join_rejects_unsafe_how(spark):
    import pytest

    dim = spark.range(10).select(F.col("id").alias("k"))
    fact = spark.range(100).select(F.col("id").alias("fk"))
    for how in ("left", "left_outer", "left_anti", "full", "right"):
        with pytest.raises(ValueError, match="semantics-preserving"):
            bloom_pruned_join(fact, dim, "fk", "k", how=how)
    # the safe types still work and agree with the plain join
    semi = bloom_pruned_join(fact, dim, "fk", "k", how="left_semi")
    assert semi.count() == fact.join(dim, fact.fk == dim.k, "left_semi").count()


def test_bloom_fp_rate_small_dim(spark):
    # 100 keys in 8192 bits, k=4 → fp ~ (1-e^{-400/8192})^4 ≈ 5e-6;
    # probe 20k foreign keys, none present → expect ~0 passes (allow a
    # tiny budget so the test isn't flaky-by-construction)
    dim = spark.range(100).select(F.col("id").alias("k"))
    words = bloom_build(dim, "k")
    probes = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom_might_contain("k", words)).count()
    assert fp <= 5
