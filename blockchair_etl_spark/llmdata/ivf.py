"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The centroid-bucketed counterpart to similarity.lsh_ann_topk: k-means
centroids partition the corpus into inverted lists; a query scores only
the lists of its `n_probe` nearest centroids. Training is Lloyd's
algorithm expressed as DataFrame ops — assignment is a pure Column
expression against literal centroids (broadcast by value, no shuffle),
the update step is one posexplode + groupBy average per round, and only
the centroid matrix (n_centroids × dim floats) ever touches the driver.

Scale: the index build is O(rounds) shuffles over (cluster, dim); the
bucketed corpus is written `partitionBy(cluster)` so a probe reads
n_probe partitions — the IVF analog of partition pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .similarity import cosine_expr


def _sq_dist(vec_col: Column, centroid: np.ndarray) -> Column:
    c = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(vec_col, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(diffs, F.lit(0.0), lambda s, x: s + x)


def assign_cluster(vec_col: Column, centroids: np.ndarray) -> Column:
    """argmin centroid id as a Column expression (codegen'd, no UDF)."""
    dists = F.array(*[_sq_dist(vec_col, centroids[i]) for i in range(len(centroids))])
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means; deterministic init (every k-th vector by id
    rank), distributed assign/update, centroids collected per round."""
    n = emb.count()
    step = max(n // n_centroids, 1)
    init = (
        emb.filter((F.col(id_col) % step == 0))
        .orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([[float(v) for v in r[0]] for r in init])

    for _ in range(iterations):
        assigned = emb.select(
            F.col(vec_col).alias("v"), assign_cluster(F.col(vec_col), centroids).alias("c")
        )
        sums = (
            assigned.select("c", F.posexplode("v").alias("dim", "val"))
            .groupBy("c", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["c"], np.zeros(centroids.shape[1]))[r["dim"]] = r["s"]
            cnt[r["c"]] = r["n"]
        for c, vec in acc.items():
            new[c] = vec / cnt[c]
        if np.allclose(new, centroids, atol=1e-7):
            break
        centroids = new
    return centroids


def build_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus annotated with its inverted-list id. Persist this (ideally
    `partitionBy('ivf_cluster')`) so probes prune to their lists."""
    return emb.withColumn("ivf_cluster", assign_cluster(F.col(vec_col), centroids))


def ivf_ann_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score only the n_probe inverted lists nearest the query."""
    q = np.asarray(query_vec, dtype=float)
    order = np.argsort(((centroids - q) ** 2).sum(axis=1))
    probes = [int(c) for c in order[:n_probe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = indexed.filter(F.col("ivf_cluster").isin(probes))
    scored = cand.select(F.col(id_col), cosine_expr(F.col(vec_col), qcol).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
