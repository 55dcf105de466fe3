"""Shared corpus statistics for composed LLM-data pipelines.

Several adaptive operators need driver-side scalars before they can
CONSTRUCT their plan: the hyperplane-LSH blockers derive a plane count
from the corpus row count (similarity.adaptive_n_planes — the count
decides HOW MANY plane expressions exist, which no in-plan broadcast
can express), and the vector operators need the embedding dimension to
unroll per-component expressions. Individually each operator pays one
count()/head() job with an explicit-argument escape hatch — but a
COMPOSED pipeline (dedup -> balanced sample -> kNN mining over the
same corpus) silently pays one scan per operator (r7 verdict #3).

``corpus_stats`` is the shared pass: ONE aggregation job produces
(n_rows, dim), and every adaptive operator accepts the result via a
``stats=`` keyword so a composed pipeline derives its scalars from a
single corpus scan. The aggregation is a count + min/max of size(vec)
in one hash-agg — map-side partials, O(1) result row, no collect of
data rows — and the min/max pair doubles as a uniformity check: a
ragged corpus raises instead of silently unrolling an arbitrary row's
length.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CorpusStats(NamedTuple):
    """Driver-side scalars shared across a composed pipeline.

    n_rows: exact corpus row count (drives adaptive_n_planes).
    dim: embedding dimension (verified uniform across all non-null
         vectors), or None for text-only corpora with no vector column.
    """

    n_rows: int
    dim: Optional[int]


def corpus_stats(
    df: DataFrame, vec_col: Optional[str] = "embedding"
) -> CorpusStats:
    """Compute (n_rows, dim) in ONE Spark job.

    Pass ``vec_col=None`` for text corpora (dim comes back None).
    A missing/all-null vector column also yields dim=None rather than
    failing, so the same stats object can feed mixed pipelines.

    The consumers (embedding_dup_pairs, knn_join_lsh, IVF training)
    unroll per-component expressions from ``dim``, so they REQUIRE a
    uniform vector length. min(size) and max(size) ride the same
    single aggregation, and a ragged corpus raises here — loudly and
    deterministically — instead of silently unrolling to whichever
    row's length an order-nondeterministic first() happened to pick.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    if vec_col is not None and vec_col in df.columns:
        sz = F.size(F.col(vec_col))
        # size() is -1 for NULL vectors; keep nulls out of the
        # uniformity check the same way first(ignorenulls) did
        sz_nn = F.when(F.col(vec_col).isNotNull(), sz)
        aggs.append(F.min(sz_nn).alias("__dim_mn"))
        aggs.append(F.max(sz_nn).alias("__dim_mx"))
    row = df.agg(*aggs).first()
    dim = None
    if len(row) > 1 and row["__dim_mx"] is not None and row["__dim_mx"] >= 0:
        if row["__dim_mn"] != row["__dim_mx"]:
            raise ValueError(
                f"ragged vector lengths in column '{vec_col}': "
                f"min size {row['__dim_mn']} != max size {row['__dim_mx']} — "
                "per-component unrolling requires a uniform embedding "
                "dimension; filter or pad the corpus first"
            )
        dim = int(row["__dim_mx"])
    return CorpusStats(n_rows=int(row["__n"]), dim=dim)


def lit_double_array(vals) -> "Column":
    """A literal array<double> Column built from ONE parsed SQL
    expression instead of one py4j round trip per element (r17, guide
    §1.2: constructing a 64-element plane or a 16×64 centroid array
    via ``F.array(*[F.lit(float(v)) …])`` costs ~0.7 s of driver time
    PER ARRAY at any data scale; the expr-string form is ~3 ms and
    bit-identical — ``CAST('<repr>' AS DOUBLE)`` round-trips exactly
    because Python's repr is shortest-round-trip and Java parses it to
    the same IEEE double, verified by struct-level comparison).

    Falls back to the per-element form when any value is non-finite
    (repr 'nan'/'inf' spellings are not portable SQL literals)."""
    import math

    fvals = [float(v) for v in vals]
    if all(math.isfinite(v) for v in fvals):
        return F.expr(
            "array(" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in fvals) + ")"
        )
    return F.array(*[F.lit(v) for v in fvals])


def lit_double_array2d(rows) -> "Column":
    """Nested array<array<double>> literal — one expr parse for e.g. a
    whole centroid table (see :func:`lit_double_array`)."""
    import math

    frows = [[float(v) for v in r] for r in rows]
    if all(math.isfinite(v) for r in frows for v in r):
        return F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in r) + ")"
                for r in frows
            )
            + ")"
        )
    return F.array(*[F.array(*[F.lit(v) for v in r]) for r in frows])


def fanout_parallel(df: DataFrame) -> DataFrame:
    """Ensure a heavy PER-ROW-COMPUTE stage runs at cluster
    parallelism. A small corpus arriving in one or two parquet files
    otherwise runs the whole stage on file-count tasks (measured at
    sf0.1: 3 s of a 5.2 s media-fingerprint run, and a single-threaded
    4.2 s repetition-stats scan → 0.55 s widened). The repartition is
    SKIPPED when the scan already has enough partitions (the 100 TB
    case: thousands of files >> cores), so wide inputs never pay an
    unnecessary payload shuffle.

    Use ONLY where the scan stage's own compute dominates (O(tokens²)
    array transforms, byte-gram explodes feeding a doc-keyed agg). An
    A/B across the whole token-op family (r8) showed explode stages
    that feed an immediate groupBy/distinct/window get NO benefit —
    the following exchange already redistributes, so the extra payload
    shuffle only adds cost (quality_classifier_scores 0.76 → 1.34 s
    when wrongly widened; reverted). Second refinement (r9 A/B): the
    per-partition compute must exceed the PAYLOAD-SHUFFLE cost, not
    merely dominate the scan — gopher_quality_gate's whole
    single-threaded pass is ~0.5 s and widening it cost +32%
    (0.526 → 0.693 s isolated), while repetition_stats at 4.16 s
    single-threaded gained 7×. Rough bar on this box: widen when the
    unwidened stage takes ≳1 s per input split."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
