"""Product quantization (PQ) over embedding columns.

The vector-store compression path complementing ivf.py: split each
dim-vector into `m` subvectors, quantize every subvector against its
own `ksub`-codeword codebook, and answer queries with asymmetric
distance computation (ADC) — the query stays full-precision, each
database vector is scored as the sum of per-subspace squared distances
between the query subvector and the vector's assigned codeword
(Jégou et al., "Product Quantization for Nearest Neighbor Search").

Spark shape:

- encoding is a scan-side Column argmin per subspace against literal
  codebooks (broadcast by value, codegen'd, no UDF) — m small argmins
  instead of ivf's one big one;
- ADC is a per-subspace distance TABLE of m × ksub constant decimal
  expressions (Catalyst constant-folds them once per plan, the
  classic PQ lookup-table trick), probed with element_at by each
  row's code — O(m) decimal adds per row, never a dim-length fold;
- codes are m smallints (m·log2(ksub) bits/vector vs dim·32) — the
  memory story that makes 100 TB-scale rerank tiers fit in RAM.

Everything is exact-decimal (ivf._sq_dist / similarity.DEC), so
encoding and ADC ranking are bit-identical across engines and
partitionings, and the DuckDB oracle can replay them from the same
codebook values.

Reference parity: this extends the reference's similarity surface the
same way ivf.py does; there is no reference counterpart (the reference
has no vector ops) — cited baseline is the public PQ literature.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from .ivf import _sq_dist, seed_centroids, train_ivf_centroids


def _check_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    return dim // m


def seed_pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic (m, ksub, dim/m) codebooks: the ksub ivf seed
    vectors (every ⌊n/ksub⌋-th row by id), sliced per subspace. Like
    ivf.seed_centroids this is both the Lloyd init and a valid
    data-derived codebook that a SQL oracle can re-derive."""
    dsub = _check_geometry(dim, m)
    seeds = seed_centroids(emb, n_centroids=ksub, id_col=id_col, vec_col=vec_col)
    return np.stack([seeds[:, j * dsub : (j + 1) * dsub] for j in range(m)])


def train_pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace Lloyd k-means, reusing ivf.train_ivf_centroids on
    the sliced subvector relation — m independent small trainings, each
    with the ivf driver-traffic bound (O(ksub) rows per round)."""
    dsub = _check_geometry(dim, m)
    books = []
    for j in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias(vec_col),
        )
        books.append(
            train_ivf_centroids(
                sub, n_centroids=ksub, iterations=iterations,
                id_col=id_col, vec_col=vec_col,
            )
        )
    return np.stack(books)


def _sub_code(vec: Column, book: np.ndarray, j: int, dsub: int) -> Column:
    """argmin codeword id for subspace j — exact-decimal distances,
    first-minimum tiebreak (mirrors ivf.assign_cluster)."""
    sub = F.slice(vec, j * dsub + 1, dsub)
    dists = F.array(*[_sq_dist(sub, book[c]) for c in range(len(book))])
    return (F.array_position(dists, F.array_min(dists)).cast("int") - 1)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) with codes = array<int> of length m."""
    m, _, dsub = codebooks.shape
    vec = F.col(vec_col)
    codes = F.array(*[_sub_code(vec, codebooks[j], j, dsub) for j in range(m)])
    return emb.select(F.col(id_col), codes.alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by asymmetric PQ distance (ascending; id tiebreak).

    Builds the m × ksub ADC lookup table as constant decimal
    expressions from the literal query and codebooks; each row pays
    one encode (if not pre-encoded) + m element_at probes + m decimal
    adds. Returns (id, adc) with adc the round-9 exact-decimal→double
    finish (same convention as similarity.dot_expr)."""
    m, ksub, dsub = codebooks.shape
    q = [float(v) for v in query_vec]
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != {m * dsub}")
    vec = F.col(vec_col)

    total = F.lit(0).cast("decimal(38,18)")
    for j in range(m):
        qsub = F.array(*[F.lit(v) for v in q[j * dsub : (j + 1) * dsub]])
        table = F.array(*[_sq_dist(qsub, codebooks[j][c]) for c in range(ksub)])
        code = _sub_code(vec, codebooks[j], j, dsub)
        total = (total + F.element_at(table, code + 1)).cast("decimal(38,18)")
    adc = F.round(total, 9).cast("decimal(38,9)").cast("double")

    scored = emb.select(F.col(id_col), adc.alias("adc"))
    return scored.orderBy(F.asc("adc"), F.asc(id_col)).limit(k)
