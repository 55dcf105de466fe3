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

from .similarity import DEC, cosine_expr
from .stats import lit_double_array, lit_double_array2d


def _sq_dist_col(vec_col: Column, centroid: Column) -> Column:
    """Squared L2 distance to a centroid (array Column or literal),
    accumulated in exact DECIMAL: the argmin over centroids is then
    independent of summation order and engine (a double fold could
    flip near-equidistant assignments)."""
    diffs = F.zip_with(
        vec_col,
        centroid,
        lambda x, y: (
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ).cast(DEC),
    )
    return F.aggregate(diffs, F.lit(0).cast(DEC), lambda s, x: (s + x).cast(DEC))


def _sq_dist(vec_col: Column, centroid: np.ndarray) -> Column:
    return _sq_dist_col(vec_col, lit_double_array(centroid))


def exact_probe_order(centroids: np.ndarray, q) -> list[int]:
    """Coarse-list probe order by squared distance computed with the
    SAME arithmetic as `_sq_dist_col` and the SQL oracle mirror: each
    per-dimension (a-b)² IEEE-double product quantized to 18 decimal
    places, then summed EXACTLY (python Decimal); ties break by list
    id. The previous double-precision `np.argsort` could order a
    coarse near-tie differently from the oracle's exact-decimal
    ORDER BY, making Spark and the oracle probe different lists (r5
    advice) — deriving the order from the oracle's own arithmetic
    closes that."""
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal("0.000000000000000001")  # 18 frac digits = DEC(38,18)
    ranked = []
    for i, c in enumerate(centroids):
        total = Decimal(0)
        for a, b in zip(c, q):
            d = float(a) - float(b)
            total += Decimal(d * d).quantize(quantum, rounding=ROUND_HALF_UP)
        ranked.append((total, i))
    ranked.sort()
    return [i for _, i in ranked]


def assign_cluster(vec_col: Column, centroids: np.ndarray) -> Column:
    """argmin centroid id as a Column expression (codegen'd, no UDF);
    exact-decimal distances, first-minimum tiebreak.

    The centroid matrix enters the plan as ONE array<array<double>>
    literal probed by a single transform() lambda — k separate
    distance-expression copies made Catalyst analysis itself the
    bottleneck (~5 s per plan build at k=64, growing linearly in k),
    which caps the usable codebook size long before executor time does.
    Same distances, same assignment, ~k-fold smaller expression tree."""
    cents = lit_double_array2d(centroids)
    dists = F.transform(cents, lambda c: _sq_dist_col(vec_col, c))
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


# Driver-memory guard for the centroid matrix: training collects
# O(n_centroids × dim) floats per round; realistic IVF sizes (65k lists
# × 1k dims ≈ 0.5 GB) should train via sampled mini-batch k-means, not
# full Lloyd rounds through the driver.
MAX_CENTROID_CELLS = 10_000_000


def seed_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats=None,
) -> np.ndarray:
    """Deterministic codebook: every ⌊n/k⌋-th vector by id. This is the
    Lloyd init, exposed separately because a fixed data-derived codebook
    is itself a valid IVF index (and, unlike trained centroids, is
    expressible in the DuckDB oracle SQL). ``stats`` (stats.corpus_stats)
    supplies n from the shared pass in composed pipelines."""
    n = stats.n_rows if stats is not None else emb.count()
    step = max(n // n_centroids, 1)
    init = (
        emb.filter((F.col(id_col) % step == 0))
        .orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    return np.array([[float(v) for v in r[0]] for r in init])


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats=None,
) -> np.ndarray:
    """Lloyd's k-means; deterministic init (every k-th vector by id
    rank), distributed assign/update; each round collects exactly one
    row per non-empty cluster (its per-dimension sum array + count),
    never the per-(cluster, dim) exploded relation. ``stats`` supplies
    (n_rows, dim) from the shared corpus_stats pass."""
    dim = (
        stats.dim
        if stats is not None and stats.dim is not None
        else len(emb.select(vec_col).head()[0])
    )
    if n_centroids * dim > MAX_CENTROID_CELLS:
        raise ValueError(
            f"centroid matrix ({n_centroids}, {dim}) exceeds "
            f"{MAX_CENTROID_CELLS} cells; train with sampled mini-batch "
            "k-means instead of driver-collected Lloyd rounds"
        )
    centroids = seed_centroids(emb, n_centroids, id_col, vec_col, stats=stats)

    for _ in range(iterations):
        assigned = emb.select(
            F.col(vec_col).alias("v"), assign_cluster(F.col(vec_col), centroids).alias("c")
        )
        # Two-stage rollup: per-(cluster, dim) partial sums shuffle once,
        # then re-group to ONE array row per cluster so the driver
        # collect is O(n_centroids) rows, not O(n_centroids × dim).
        sums = (
            assigned.select("c", F.posexplode("v").alias("dim", "val"))
            .groupBy("c", "dim")
            .agg(F.sum("val").alias("s"))
            .groupBy("c")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "s"))).alias("dims"))
        )
        counts = assigned.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
        rows = sums.join(counts, "c").collect()
        new = centroids.copy()
        for r in rows:
            vec = np.zeros(centroids.shape[1])
            for d in r["dims"]:
                vec[d["dim"]] = d["s"]
            new[r["c"]] = vec / r["n"]
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
    # Exact-decimal probe ranking (ties by list id) — the same
    # arithmetic the oracle's ORDER BY dist, c evaluates.
    probes = exact_probe_order(centroids, q)[:n_probe]
    qcol = lit_double_array(query_vec)
    cand = indexed.filter(F.col("ivf_cluster").isin(probes))
    scored = cand.select(F.col(id_col), cosine_expr(F.col(vec_col), qcol).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def assign_cluster_pruned(
    vec_col: Column,
    centroids: np.ndarray,
    dim: int,
    n_planes: int | None = None,
    seed: int = 7,
    target_cands: int = 16,
) -> Column:
    """Hierarchical (LSH-pruned) cluster assignment — the piece that
    keeps big-codebook k-means usable at corpus scale.

    Flat assign_cluster is O(k·dim) per row; when the codebook grows
    with the corpus (SemDeDup-style k ∝ n to hold cluster occupancy
    flat) that makes assignment O(n·k) = O(n²) total — measured
    superlinear (alpha 1.08) in the scaling bench. Here both the
    centroids (driver-side numpy, once) and each vector (scan-side
    Column, the existing exact-decimal lsh_bucket_col) hash into the
    SAME hyperplane-LSH buckets, and the row's argmin runs only over
    its bucket's centroid subset: the codebook enters the plan as ONE
    map<bucket, array<struct(c, cv)>> literal probed by element_at, so
    per-row work is O(k/2^p · dim) ≈ O(target_cands · dim) = O(1) in
    corpus size. p defaults to log2(k/target_cands).

    A vector whose bucket contains no centroid falls back to the
    synthetic cluster id ``-1 - bucket`` (negative ids, disjoint from
    codeword ids): LSH-bucket blocking IS the fallback clustering, so
    downstream blocked operators keep working and the choice stays
    deterministic. A vector's true nearest centroid can land in a
    different bucket — pruned assignment trades that (bounded, seeded)
    approximation for linear total cost, exactly like the adaptive
    plane count in embedding_dup_pairs. (The measured per-row cost is
    dominated by interpreted expression evaluation over the candidate
    structs, not by the decimal math — for the vectorized hot path see
    dedup.assign_clusters_vectorized, which does the same pruning in
    numpy over Arrow batches.)
    """
    import math

    from .similarity import _planes, lsh_bucket_col

    k = len(centroids)
    if n_planes is None:
        n_planes = max(0, math.ceil(math.log2(max(k / target_cands, 1))))
    if n_planes == 0:
        return assign_cluster(vec_col, centroids)

    planes = _planes(dim, n_planes, seed)
    by_bucket: dict[int, list[int]] = {}
    for c in range(k):
        b = 0
        for p in range(n_planes):
            if float(np.dot(planes[p], centroids[c])) >= 0:
                b |= 1 << p
        by_bucket.setdefault(b, []).append(c)

    keys = sorted(by_bucket)
    entries = [
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("c"),
                    lit_double_array(centroids[c]).alias("cv"),
                )
                for c in by_bucket[b]
            ]
        )
        for b in keys
    ]
    cmap = F.map_from_arrays(
        F.array(*[F.lit(b) for b in keys]), F.array(*entries)
    )
    bucket = lsh_bucket_col(vec_col, dim, n_planes=n_planes, seed=seed)
    cands = F.element_at(cmap, bucket)
    dists = F.transform(cands, lambda e: _sq_dist_col(vec_col, e["cv"]))
    best = F.element_at(
        cands, F.array_position(dists, F.array_min(dists)).cast("int")
    )["c"]
    return F.when(cands.isNull(), -1 - bucket).otherwise(best).cast("int")


def centroids_to_frame(spark, centroids: np.ndarray) -> DataFrame:
    """The trained coarse centroids as a persistable relation
    (cluster_id, centroid array<double>) — the write-once/read-forever
    artifact contract of tokenizer.merges_to_frame: train once, write
    the frame to parquet, and every later query/append/stream loads it.
    cluster_id preserves row order (== the assignment argmin order)
    across the unordered parquet round-trip; float64 round-trips
    parquet DOUBLE bit-exactly, so a reloaded matrix assigns and probes
    identically."""
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(centroids)],
        "cluster_id bigint, centroid array<double>",
    )


def frame_to_centroids(
    df: DataFrame, expected_k: int | None = None
) -> np.ndarray:
    """Inverse of :func:`centroids_to_frame` (a driver-side artifact
    read — centroid matrices are bounded by MAX_CENTROID_CELLS, never
    data-scale). Raises if the relation is ragged — a partial write
    must not reload as a matrix whose row indices (== assignment ids)
    have silently shifted.

    Pass ``expected_k`` (the configured cluster count — known to every
    caller that trained the index) to also catch partial writes that
    drop TRAILING clusters, which keep cluster_id contiguous from 0 and
    so cannot be detected from the relation alone."""
    rows = df.select("cluster_id", "centroid").orderBy("cluster_id").collect()
    if not rows:
        raise ValueError("empty centroid relation")
    if expected_k is not None and len(rows) != expected_k:
        kind = "truncated" if len(rows) < expected_k else "over-full (duplicated write?)"
        raise ValueError(
            f"centroid relation is {kind}: {len(rows)} clusters "
            f"present, expected {expected_k}"
        )
    if len(rows) != int(rows[-1].cluster_id) + 1:
        raise ValueError(
            f"centroid relation is ragged: {len(rows)} rows but "
            f"cluster_id runs to {int(rows[-1].cluster_id)}"
        )
    return np.array([[float(v) for v in r.centroid] for r in rows])
