"""Deferred-release cache registry: no persisted blocks may outlive a
parity-harness query (the round-5 advice: registry pipelines persisted
but never unpersisted, accumulating MEMORY_AND_DISK blocks across
invocations in a long-lived session)."""

from blockchair_etl_spark.caching import release_tracked, tracked_count, tracked_persist
from blockchair_etl_spark.testing import check_query


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_tracked_persist_released_on_release(spark):
    release_tracked()
    base = _n_cached_rdds(spark)
    df = tracked_persist(spark.range(100).selectExpr("id", "id * 2 AS y"))
    assert df.count() == 100
    assert tracked_count() == 1
    assert _n_cached_rdds(spark) == base + 1
    assert release_tracked(blocking=True) == 1
    assert tracked_count() == 0
    assert _n_cached_rdds(spark) == base


def test_parity_run_leaves_no_cached_blocks(spark, sf_dir):
    """Every persisting registry entry, run through the parity path,
    must leave the session's cache empty afterwards."""
    release_tracked(blocking=True)
    # delta-based: other test files may hold their own (untracked,
    # properly scoped) caches when the suite runs in one session
    base = _n_cached_rdds(spark)
    for name in (
        "corpus_prep_v2_pipeline",
        "dedup_incremental_minhash",
        "dedup_incremental_embedding",
        "dedup_minhash_lsh",
        "graph_pagerank",
    ):
        res = check_query(spark, sf_dir, name)
        assert res.ok, (name, res.mismatches)
        assert tracked_count() == 0, name
    # one-sided: the async ContextCleaner may concurrently collect
    # OTHER suites' out-of-scope cached RDDs (count can only go down
    # from that); what must not happen is our queries ADDING blocks
    assert _n_cached_rdds(spark) <= base


def test_registry_invocation_releases_previous_caches(spark, sf_dir):
    """The register() wrapper is the backstop for harnesses that never
    call release_tracked (the verification driver): building the NEXT
    query must free the previous one's tracked caches."""
    from blockchair_etl_spark.queryset import QUERIES

    release_tracked(blocking=True)
    df = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    assert tracked_count() >= 1  # signature relation still cached
    QUERIES["dedup_exact"].fn(spark, sf_dir)  # plan build alone releases
    assert tracked_count() == 0
