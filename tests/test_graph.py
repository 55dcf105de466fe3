"""PageRank fixed-point: structure, determinism, mass bounds; trace
budget degradation."""

import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.query.graph import SCALE, pagerank_fixed_point
from blockchair_etl_spark.query.trace import (
    TraceBudgetExceeded,
    trace_funds,
    trace_funds_with_fallback,
)


def test_pagerank_star_center_wins(spark):
    # star: everyone points at 0 → 0 collects all damped mass
    edges = spark.createDataFrame([(i, 0) for i in range(1, 9)], ["src", "dst"])
    pr = {r.vertex: r.rank_s for r in pagerank_fixed_point(edges, iterations=3).collect()}
    assert pr[0] == max(pr.values())
    leaves = [pr[i] for i in range(1, 9)]
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    # leaves keep only the base (0.15) mass: nothing points at them
    assert leaves[0] == SCALE * 15 // 100


def test_pagerank_vertex_persist_gate(spark, tmp_path):
    """r18: the vertex-set persist is size-gated — local-scale inputs
    stay on the no-persist fast path (no extra InMemoryTableScan for
    the vertex relation), forcing the threshold down flips the persist
    on, and the ranks are bit-identical either way (a persist must
    never change results). Parquet-backed edges so the optimizer has a
    REAL size estimate (an unknown-stats relation — the Long.MaxValue
    sentinel — deliberately stays on the no-persist path)."""
    from blockchair_etl_spark.caching import release_tracked

    spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(40)], ["src", "dst"]
    ).write.mode("overwrite").parquet(str(tmp_path / "edges"))
    edges = spark.read.parquet(str(tmp_path / "edges"))
    key = "spark.blockchair.graph.vertexPersistMinBytes"

    def run():
        df = pagerank_fixed_point(edges, iterations=3)
        rows = {r.vertex: r.rank_s for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        release_tracked()
        return rows, plan.count("InMemoryTableScan")

    default_rows, default_inmem = run()
    spark.conf.set(key, "1")
    try:
        gated_rows, gated_inmem = run()
    finally:
        spark.conf.unset(key)
    # default path: only the edd persist caches (per-iteration joins);
    # gated path adds the vertex-relation cache on top
    assert gated_inmem > default_inmem
    assert gated_rows == default_rows


def test_pagerank_deterministic_and_bounded(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(40)] + [(i % 20, (i * 3) % 20) for i in range(40)],
        ["src", "dst"],
    )
    a = {r.vertex: r.rank_s for r in pagerank_fixed_point(edges, iterations=4).collect()}
    b = {r.vertex: r.rank_s for r in pagerank_fixed_point(edges, iterations=4).collect()}
    assert a == b  # bit-identical across runs
    n = len(a)
    # total mass never exceeds n * SCALE (integer division only leaks)
    assert sum(a.values()) <= n * SCALE
    assert all(v >= SCALE * 15 // 100 for v in a.values())


def _fanout_edges(spark, fan: int = 40):
    """source 0 fans out to `fan` nodes; each of those fans out again —
    hop-2 frontier is fan² rows, a deterministic budget blower."""
    rows = [(0, i, f"t0_{i}", i) for i in range(1, fan + 1)]
    for i in range(1, fan + 1):
        rows += [
            (i, fan * i + j, f"t{i}_{j}", fan * i + j) for j in range(1, fan + 1)
        ]
    return spark.createDataFrame(rows, ["src", "dst", "tx_hash", "tx_time"])


def test_trace_budget_raises_at_documented_limit(spark):
    edges = _fanout_edges(spark)
    # hop-1 frontier is 40 rows; a 39-row budget must refuse hop 2
    with pytest.raises(TraceBudgetExceeded, match="budget"):
        trace_funds(edges, source=0, max_hops=2, max_frontier_rows=39)
    # a budget >= the frontier lets the same trace through
    out = trace_funds(edges, source=0, max_hops=2, max_frontier_rows=40)
    assert out.filter(F.col("hop") == 2).count() == 40 * 40


def test_trace_releases_frontier_checkpoints(spark):
    """r12: on the reuse-edge-partitioning path, the per-hop frontier
    checkpoints materialize while the result's eager checkpoint
    computes and must then be released explicitly (DataFrame.unpersist
    never frees checkpoint blocks) — a 3-hop dashboard trace may leave
    only the ONE result checkpoint behind, not one block set per hop."""
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    edges = _fanout_edges(spark, fan=6)
    out = trace_funds(edges, source=0, max_hops=3)
    assert out.count() > 0
    leaked = [
        k
        for k in spark.sparkContext._jsc.getPersistentRDDs().keys()
        if k not in before
    ]
    assert len(leaked) <= 1, leaked  # only the result's own checkpoint


def test_trace_fallback_degrades_to_one_hop(spark):
    """The reference dashboard's OOM contract: a too-deep trace re-runs
    at depth 1 instead of failing (app.py:380-383 analog)."""
    edges = _fanout_edges(spark)
    df, hops = trace_funds_with_fallback(
        edges, source=0, max_hops=2, max_frontier_rows=39
    )
    assert hops == 1
    assert df.count() == 40 and df.agg(F.max("hop")).first()[0] == 1
    # within budget → the requested depth is honored
    df2, hops2 = trace_funds_with_fallback(
        edges, source=0, max_hops=2, max_frontier_rows=1000
    )
    assert hops2 == 2 and df2.count() == 40 + 40 * 40


def test_personalized_pagerank_mass_follows_seeds(spark):
    from blockchair_etl_spark.query.graph import SCALE, pagerank_fixed_point

    # two disconnected components: seeds live in the first
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)], "src bigint, dst bigint"
    )
    pr = {r.vertex: r.rank_s for r in pagerank_fixed_point(
        edges, iterations=3, personalization=[1]
    ).collect()}
    # the other component receives NO mass (teleport never lands there)
    assert pr[10] == 0 and pr[11] == 0
    # seed keeps restart mass; its cycle accumulates propagated mass
    assert pr[1] > 0 and pr[2] > 0 and pr[3] > 0
    # uniform variant ranks the second component non-zero
    uni = {r.vertex: r.rank_s for r in pagerank_fixed_point(
        edges, iterations=3
    ).collect()}
    assert uni[10] > 0 and uni[11] > 0
    # determinism: identical reruns bit-match
    again = {r.vertex: r.rank_s for r in pagerank_fixed_point(
        edges, iterations=3, personalization=[1]
    ).collect()}
    assert again == pr
