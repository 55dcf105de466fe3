"""PageRank fixed-point: structure, determinism, mass bounds."""

from pyspark.sql import functions as F

from blockchair_etl_spark.query.graph import SCALE, pagerank_fixed_point


def test_pagerank_star_center_wins(spark):
    # star: everyone points at 0 → 0 collects all damped mass
    edges = spark.createDataFrame([(i, 0) for i in range(1, 9)], ["src", "dst"])
    pr = {r.vertex: r.rank_s for r in pagerank_fixed_point(edges, iterations=3).collect()}
    assert pr[0] == max(pr.values())
    leaves = [pr[i] for i in range(1, 9)]
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly
    # leaves keep only the base (0.15) mass: nothing points at them
    assert leaves[0] == SCALE * 15 // 100


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
