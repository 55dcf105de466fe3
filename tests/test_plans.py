"""Physical-plan quality gates: pushdown, pruning, broadcast, codegen.

Correctness says the answer is right; these tests say the PLAN is the
one that survives a 100 TB scale-up — filters reach the parquet scan,
projections prune columns, small dims broadcast, core queries stay
JVM-side (no Python in the hot path)."""

import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.io.sources import events_between, load_table
from blockchair_etl_spark.queryset import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"].fn(spark, sf_dir)
    plan = full_explain(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # only the 7 referenced columns are read, not the full 11-column row
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    for needed in ["l_quantity", "l_extendedprice", "l_returnflag"]:
        assert needed in read_schema
    for pruned in ["l_partkey", "l_suppkey", "l_orderkey"]:
        assert pruned not in read_schema


def test_events_range_pushdown(spark, sf_dir):
    df = events_between(spark, sf_dir, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    plan = full_explain(df)
    pushed = plan.split("PushedFilters")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed
    naive = load_table(spark, sf_dir, "events").filter(
        F.col("ts").between(
            F.lit("2024-01-10 00:00:00").cast("timestamp_ntz"),
            F.lit("2024-01-20 00:00:00").cast("timestamp_ntz"),
        )
    )
    # Negative control only applies to the nanosecond-encoded layout:
    # there, filtering the CONVERTED ts (timestamp_micros(ts DIV 1000))
    # can't push through the expression, which is exactly why
    # events_between filters the raw long. When the driver writes
    # microsecond timestamps natively, the naive filter pushes down too
    # and events_between degenerates to it by design.
    import pyspark.sql.types as T

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        naive_plan = full_explain(naive)
        assert "GreaterThanOrEqual(ts" not in naive_plan.split("PushedFilters")[1][:300]
    # and the rows agree
    assert df.count() == naive.count()


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["j4_region_rollup"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_staged_views_stay_transparent_to_pushdown(spark, tmp_path):
    # dashboard date filter reaches the RAW parquet scan through
    # stg_blocks → dim_blocks (two "view" layers)
    import sys

    sys.path.insert(0, str(tmp_path))  # noqa — only for fixture import isolation
    from blockchain_fixtures import generate, write_parquet

    d = tmp_path / "fix"
    d.mkdir()
    write_parquet({"blocks": generate()["blocks"]}, str(d))
    from blockchair_etl_spark.query.analytics import block_metrics
    from blockchair_etl_spark.transform.marts import dim_blocks
    from blockchair_etl_spark.transform.staging import stg_blocks

    raw = spark.read.parquet(f"{d}/blocks.parquet")
    q = block_metrics(dim_blocks(stg_blocks(raw)), "2024-03-01", "2024-03-02")
    plan = full_explain(q)
    pushed = plan.split("PushedFilters")[1][:300]
    assert "IsNotNull(id)" in pushed  # staged not-null filter pushed
    assert "GreaterThanOrEqual(time" in pushed  # dashboard window pushed
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "merkle_root" not in read_schema  # 13 of 37 columns read


# Entries allowed to carry an ARROW-batched (vectorized) Python stage —
# each is a deliberate batch-linear-algebra strategy, never row-level:
_ARROW_BATCH_OK = {
    "multimodal_features",  # mapInPandas decode/featurize plumbing
    "dedup_semdedup_vectorized",  # numpy assignment + BLAS gram pairs
    # connected_clusters' local finish: edge sets <= 2M resolve in ONE
    # mapInPandas union-find task (Kiveris-style "finish small graphs
    # locally") instead of ~7 shuffle rounds — a size-gated batch
    # strategy, never row-level; the >2M path is pure DataFrame ops
    "dedup_connected_clusters",
    "dedup_incremental_clusters",  # same CC local finish, two-day fold
    "dedup_corpus_survivors",
    "dedup_best_quality_survivors",
    "media_dedup_survivors",
    # pixel-space twin: resize_images' decode stub is the mapInPandas
    # boundary (codec work can't be SQL); the aHash fold itself is JVM
    "media_pixel_dedup_survivors",
    # cross-modal composition: carries the pixel pipeline's decode stub
    # (same boundary as media_pixel_dedup_survivors) plus CC local finish
    "multimodal_joint_dedup_survivors",
    # forward-pass DP over DISTINCT words only (Arrow-batched; the DP
    # is not SQL) — everything downstream of the (word, q_logp) join
    # is JVM integer arithmetic
    "quality_unigram_ppl_gate",
    # v6 composes that same DP branch as its third gate
    "corpus_prep_v6_pipeline",
}


def test_core_queries_have_no_python_in_hot_path(spark, sf_dir):
    for name, spec in QUERIES.items():
        plan = plan_of(spec.fn(spark, sf_dir))
        # row-at-a-time Python is forbidden EVERYWHERE (pickled per-row
        # eval — the 10-100x-slower path)
        assert "BatchEvalPython" not in plan, f"{name} runs row-level Python"
        if name not in _ARROW_BATCH_OK:
            assert "EvalPython" not in plan and "InPandas" not in plan, (
                f"{name} runs a Python stage outside the vectorized allowlist"
            )


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side partial agg (HashAggregate before the exchange) for the
    # flagship group-by — halves shuffle volume at scale
    plan = plan_of(QUERIES["q1_pricing_summary"].fn(spark, sf_dir))
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:], "no exchange after partial agg?"
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_active(spark, sf_dir):
    plan = plan_of(QUERIES["p1_stg_projection"].fn(spark, sf_dir))
    # codegen'd operators carry the "*(stage)" prefix in toString
    assert "*(1)" in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    # S8/bucketing scale path: two tables bucketed+sorted on the join key
    # sort-merge join with NO Exchange on either side
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/bucketdb'")
    left = spark.range(50_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(20_000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") * 3).alias("rv")
    )
    for name, df in [("bl", left), ("br", right)]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(f"bucketdb.{name}")
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bucketdb.bl").join(spark.table("bucketdb.br"), "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        # sanity: co-located join returns the right answer
        plain = left.join(right, "k").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE bucketdb CASCADE")


def test_semi_anti_join_shapes(spark, sf_dir):
    # EXISTS/NOT EXISTS compile to semi/anti joins: the build side's
    # payload columns never enter the shuffle
    semi = plan_of(QUERIES["j6_exists_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in semi
    anti = plan_of(QUERIES["j7_anti_inactive_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in anti


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = full_explain(QUERIES["q6_selective_revenue"].fn(spark, sf_dir))
    pushed = plan.split("PushedFilters")[1][:400]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in pushed, f"{col} not pushed to scan"
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # only the 4 used columns read


def test_correlated_shapes_broadcast_the_aggregate(spark, sf_dir):
    # q17: per-part avg joins back via broadcast on BOTH joins (brand
    # dim and the agg); a SortMergeJoin here would reshuffle the fact
    plan = plan_of(QUERIES["q17_small_quantity_revenue"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # q11: the global-total scalar is a 1-row broadcast nested-loop,
    # and the fact table is aggregated exactly once (one partial+final
    # pair on l_partkey — not re-aggregated after the filter)
    plan11 = plan_of(QUERIES["q11_important_parts"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan11 or "BroadcastHashJoin" in plan11
    # q22: anti join against order keys stays broadcast
    plan22 = plan_of(QUERIES["q22_wealthy_inactive"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan22 and "LeftAnti" in plan22


def test_rolling_active_users_single_wide_shuffle(spark, sf_dir):
    # contribution-explode shape: the only exchanges are the distinct
    # and the final day aggregate — the 7x fan-out itself is map-side
    # (explode), and the days dim joins broadcast
    df = QUERIES["rolling_active_users"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan or "Explode" in plan


def test_corr_is_one_hash_agg_with_partial(spark, sf_dir):
    plan = plan_of(QUERIES["corr_value_by_type"].fn(spark, sf_dir))
    # exactly one exchange: partial moment sums combine map-side, the
    # closed-form math runs on the 5 grouped rows
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()


def test_tfidf_vocab_joins_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["text_tfidf_topk"].fn(spark, sf_dir))
    # df (vocab-sized) and N (1 row) both broadcast back onto tf
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_winsorize_and_contamination_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["winsorize_values"].fn(spark, sf_dir))
    # the percentile-bounds relation (5 rows) joins broadcast: one fact scan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    plan_c = plan_of(QUERIES["text_contamination"].fn(spark, sf_dir))
    # the benchmark shingle set joins broadcast onto training shingles
    assert "BroadcastHashJoin" in plan_c


def test_late_tpch_shapes_stay_broadcast(spark, sf_dir):
    # q4: non-equi EXISTS plans as a semi join (key equi + date residual)
    plan4 = plan_of(QUERIES["q4_late_shipment_orders"].fn(spark, sf_dir))
    assert "LeftSemi" in plan4
    # q9: all three dim hops broadcast; the only wide exchange is the
    # final (nation, year) aggregate
    plan9 = plan_of(QUERIES["q9_profit_by_nation_year"].fn(spark, sf_dir))
    assert plan9.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan9
    # q2: the argmin window partitions on partkey — one shuffle, the
    # dims ride along broadcast
    plan2 = plan_of(QUERIES["q2_min_balance_supplier"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan2
    assert "SortMergeJoin" not in plan2


def test_bloom_filter_sits_under_the_join(spark, sf_dir):
    plan = plan_of(QUERIES["bloom_pruned_join_revenue"].fn(spark, sf_dir))
    # the bitwise probe runs as a scan-side Filter (shiftleft visible),
    # the small dim broadcasts, and no sort-merge shuffle join appears
    assert "shiftleft" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    join_at = plan.index("BroadcastHashJoin")
    assert "shiftleft" in plan[join_at:], "bloom probe must be below the join"


def test_cms_estimate_broadcasts_sketch_rows(spark, sf_dir):
    plan = plan_of(QUERIES["sketch_cms_heavy_hitters"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # 4 tiny sketch-row joins broadcast
    assert "SortMergeJoin" not in plan


def test_bucket_centroids_single_exchange(spark, sf_dir):
    # the LSH bucket id must be materialized behind the repartition
    # (one Exchange total): re-evaluating the decimal fold per exploded
    # (dim, value) row is a measured 10x regression, and the agg must
    # reuse the bucket partitioning instead of re-shuffling
    plan = plan_of(QUERIES["centroid_by_bucket"].fn(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan


def test_embedding_dup_pairs_one_bucket_exchange_no_cartesian(spark, sf_dir):
    # the blocked self-join must never degenerate to a cross join, and
    # both sides must come off ONE repartition-by-bucket exchange (the
    # plane-fold bucket + norm are computed once per row, with the
    # second side served by exchange reuse, not a recompute)
    for name in ("dedup_embedding_lsh_blocked", "dedup_embedding_multiprobe"):
        plan = plan_of(QUERIES[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan, name
        n_root_exchanges = plan.count("+- Exchange hashpartitioning")
        assert n_root_exchanges >= 1, f"{name}: bucket exchange missing"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path, sf_dir):
    # 100 TB posture: a date-partitioned fact joined to a filtered dim
    # must prune fact partitions at RUNTIME from the dim's build side
    # (DPP), not scan every partition. Gate: the fact scan carries a
    # dynamicpruning subquery filter.
    ev = load_table(spark, sf_dir, "events")
    fact_dir = str(tmp_path / "fact_part")
    (
        ev.withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # a GENUINE dim with a data-dependent filter: a constant-foldable
    # predicate (e.g. lit('keep') == 'keep') is simplified away and DPP's
    # selective-predicate heuristic never fires
    days = [r.day for r in fact.select("day").distinct().orderBy("day").collect()]
    dim = spark.createDataFrame(
        [(d, "EU" if i % 7 == 0 else "US") for i, d in enumerate(days)],
        "day date, region string",
    )
    joined = fact.join(dim.filter(F.col("region") == "EU"), "day")
    phys = plan_of(joined)
    assert "dynamicpruning" in phys.lower(), phys


def test_token_budget_no_global_doc_window(spark, sf_dir):
    """corpus_token_budget's doc-level window must be PARTITIONED (by
    score); the only unpartitioned window may run over the tiny
    per-score relation. A global window over the doc relation is the
    single-reducer sort the two-phase shape exists to avoid."""
    df = QUERIES["corpus_token_budget"].fn(spark, sf_dir)
    plan = plan_of(df)
    # every Window over the docs relation carries a partition spec;
    # 'Window [...], [score...]' lines: one per phase. Count windows
    # missing a partition list that ALSO order by the doc id — that is
    # the global doc-level form.
    bad = [
        ln
        for ln in plan.splitlines()
        if "Window" in ln and "doc_id" in ln and "score" not in ln
    ]
    assert not bad, bad
    # and the budget scalar broadcasts (no shuffle of docs against it)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_shingle_generate_does_not_inline_tokenizer(spark, sf_dir):
    """exploded_shingles builds shingles from a tokens ARRAY column via
    transform+slice. If CollapseProject ever inlined the tokenizer
    (split/regexp) into the Generate's per-position lambda, every
    shingle position would re-tokenize the document — quadratic. Gate:
    the Generate operator's expression must not contain the tokenizer;
    it stays in the child Project, evaluated once per document."""
    from blockchair_etl_spark.llmdata.dedup import exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    plan = plan_of(exploded_shingles(docs, "text", "doc_id", 3, distinct=False))
    gen_lines = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gen_lines, plan
    assert not any("split(" in ln for ln in gen_lines), gen_lines


def test_corpus_prep_plan_construction_runs_no_jobs(spark, sf_dir):
    """r6 verdict #2: corpus_prep_pipeline used to run a driver-side
    docs.count() on every invocation just to derive the 5% line-DF
    threshold — one extra full corpus scan per run. The threshold is
    now a broadcast scalar relation inside the plan, so CONSTRUCTING
    the query must launch zero Spark jobs (one invocation = one pass,
    paid at action time)."""
    sc = spark.sparkContext
    sc.setJobGroup("prep-build", "plan construction only")
    try:
        df = QUERIES["corpus_prep_pipeline"].fn(spark, sf_dir)
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("prep-build")
        sc.setJobGroup("", "")
    # the only permissible job is spark.read.parquet's footer/schema
    # probe (1 job per reader, independent of data size); the old shape
    # ran that PLUS a full count() scan = 2 jobs
    assert len(jobs) <= 1, f"plan construction ran {len(jobs)} job(s)"
    assert df.schema is not None


def test_cluster_balanced_single_bucket_exchange(spark, sf_dir):
    """One shuffle keyed on the LSH bucket; the rank filter sits above
    a partitioned window, never a global sort."""
    df = QUERIES["sample_cluster_balanced"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("Exchange") <= 2  # bucket hash + (AQE) coalesce
    assert "Sort" in plan  # within-partition sort for row_number
    bad = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "bucket" not in ln
    ]
    assert not bad, bad


def test_dsir_ratio_relation_broadcasts(spark, sf_dir):
    """The 256-bucket ratio relation must broadcast back onto the token
    stream — shuffling the exploded tokens against 256 rows is wrong."""
    df = QUERIES["sample_dsir_scores"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # the doc-level sum keeps a partial (map-side) aggregation
    assert "partial" in plan.lower()


def test_recursive_cte_no_cartesian(spark, sf_dir):
    """The recursive step must join edges to the working frontier with
    an equi-join (never a cartesian) and preserve UNION ALL."""
    df = QUERIES["trace_recursive_cte"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_composed_embedding_pipeline_single_stats_job(spark, sf_dir):
    """r7 verdict #3: a COMPOSED embedding pipeline used to pay one
    adaptivity job per operator (embedding_dup_pairs ran count()+head(),
    cluster_balanced_sample another count()+head(), knn_join_lsh the
    same). One shared stats.corpus_stats pass now feeds all of them via
    stats=, so the composed shape pays ONE corpus scan for its scalars
    and constructing the downstream operators launches ZERO jobs."""
    from blockchair_etl_spark.llmdata.dedup import embedding_dup_pairs
    from blockchair_etl_spark.llmdata.sampling import cluster_balanced_sample
    from blockchair_etl_spark.llmdata.similarity import knn_join_lsh
    from blockchair_etl_spark.llmdata.stats import corpus_stats

    emb = load_table(spark, sf_dir, "embeddings")
    emb.schema  # reader footer probe happens here, outside the groups
    sc = spark.sparkContext

    sc.setJobGroup("stats-pass", "the one shared corpus scan")
    try:
        st = corpus_stats(emb, vec_col="embedding")
    finally:
        stats_jobs = sc.statusTracker().getJobIdsForGroup("stats-pass")
        sc.setJobGroup("", "")
    assert st.n_rows > 0 and st.dim == 64
    # one aggregation action; AQE may stage it as at most 2 jobs
    assert 1 <= len(stats_jobs) <= 2, f"stats pass ran {len(stats_jobs)} jobs"

    sc.setJobGroup("op-construct", "plan construction only")
    try:
        pairs = embedding_dup_pairs(emb, threshold=0.3, stats=st)
        sample = cluster_balanced_sample(emb, per_bucket=5, stats=st)
        knn = knn_join_lsh(emb, k=2, stats=st)
    finally:
        op_jobs = sc.statusTracker().getJobIdsForGroup("op-construct")
        sc.setJobGroup("", "")
    assert not op_jobs, f"operator construction ran {len(op_jobs)} job(s)"
    assert pairs.schema and sample.schema and knn.schema


def test_classifier_weights_broadcast_and_partial_agg(spark, sf_dir):
    """The O(n_features) weight relation must broadcast onto the token
    stream (shuffling exploded occurrences against 4096 rows is wrong),
    and the per-doc logit sum must keep a map-side partial aggregate."""
    df = QUERIES["quality_classifier_scores"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "partial" in plan.lower()
