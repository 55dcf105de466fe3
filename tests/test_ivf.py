"""IVF ANN: training convergence, index partitioning, probe correctness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from blockchair_etl_spark.io.sources import load_table
from blockchair_etl_spark.llmdata.ivf import (
    build_ivf_index,
    ivf_ann_topk,
    train_ivf_centroids,
)
from blockchair_etl_spark.llmdata.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def index(spark, emb):
    centroids = train_ivf_centroids(emb, n_centroids=8, iterations=3)
    return centroids, build_ivf_index(emb, centroids).cache()


def test_ivf_training_shapes_and_determinism(emb):
    c1 = train_ivf_centroids(emb, n_centroids=8, iterations=2)
    c2 = train_ivf_centroids(emb, n_centroids=8, iterations=2)
    assert c1.shape == (8, 64)
    assert np.allclose(c1, c2)  # same data + same init → identical


def test_ivf_training_guards_centroid_matrix_size(emb):
    # 10M-cell codebooks must not flow through driver-collected Lloyd
    # rounds (the guard fires before any seed collect happens)
    with pytest.raises(ValueError, match="centroid matrix"):
        train_ivf_centroids(emb, n_centroids=200_000)


def test_ivf_index_covers_corpus(index, emb):
    centroids, idx = index
    counts = {r["ivf_cluster"]: r["count"] for r in idx.groupBy("ivf_cluster").count().collect()}
    assert sum(counts.values()) == emb.count()
    assert set(counts) <= set(range(8))
    assert len(counts) >= 4  # clustering didn't collapse


def test_ivf_probe_correct_within_lists(spark, index, emb):
    centroids, idx = index
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    approx = ivf_ann_topk(idx, centroids, qv, k=10, n_probe=2).collect()
    got = [r.vec_id for r in approx]
    assert 0 in got  # query's own vector lands in a probed list
    # result == exact ranking restricted to the probed lists
    order = np.argsort(((centroids - np.asarray(qv)) ** 2).sum(axis=1))
    probes = [int(c) for c in order[:2]]
    cand = idx.filter(F.col("ivf_cluster").isin(probes))
    exact_in = [r.vec_id for r in cosine_topk(cand, qv, k=10).collect()]
    assert got == exact_in
    # probing prunes the corpus
    assert cand.count() < emb.count()


def test_ivf_full_probe_equals_bruteforce(spark, index, emb):
    centroids, idx = index
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    all_probe = ivf_ann_topk(idx, centroids, qv, k=5, n_probe=8).collect()
    brute = cosine_topk(emb, qv, k=5).collect()
    assert [r.vec_id for r in all_probe] == [r.vec_id for r in brute]


def test_ivf_trained_centroids_oracle_hash_parity(spark, sf_dir, index):
    # The registry entry hash-checks the SEED codebook (expressible in
    # static oracle SQL); this closes the gap for the TRAINED path:
    # train -> inline centroids into generated SQL -> DuckDB -> the
    # same row/schema/value-hash comparison the driver runs.
    from blockchair_etl_spark.queryset import trained_ivf_oracle_sql
    from blockchair_etl_spark.testing import compare_frames, duckdb_connection

    centroids, idx = index
    qv = [float(v) for v in
          load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).head()["embedding"]]
    got = ivf_ann_topk(idx, centroids, qv, k=10, n_probe=2).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(trained_ivf_oracle_sql(centroids, k=10, n_probe=2)).fetchdf()
    r = compare_frames("ann_ivf_trained", got, want)
    assert r.ok, r.mismatches
