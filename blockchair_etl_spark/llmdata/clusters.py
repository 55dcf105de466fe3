"""Duplicate-cluster resolution: connected components over near-dup pairs.

Pairwise dedup (minhash/jaccard/cosine) yields edges; choosing one
canonical document per *group* requires the transitive closure — A~B,
B~C puts A,C in one cluster even if A,C never paired. This is iterative
min-label propagation, the same driver-loop shape as the trace executor
(query/trace.py): no recursive SQL, no GraphFrames dependency.

Scale notes: each round is one join + one aggregate, both shuffling on
the vertex key; rounds needed = graph diameter (dup clusters are
near-cliques, so 2-4 in practice). Labels are localCheckpointed per
round to keep lineage O(1). For corpus-scale graphs the same loop runs
unchanged — the join is the standard large-scale CC formulation
(label propagation to a fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """→ (doc, cluster_id) for every vertex in ≥1 pair; cluster_id is
    the minimum member id (deterministic canonical representative).

    Convergence is required: if min-label propagation has not reached a
    fixpoint within ``max_iterations`` (a component whose diameter
    exceeds the bound — e.g. a long chain of near-dup pairs), the labels
    would silently be wrong, so we raise instead of returning them."""
    fwd = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = fwd.union(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.distinct().persist()

    labels = edges.select(F.col("u").alias("vertex")).distinct().select(
        "vertex", F.col("vertex").alias("label")
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_clusters did not converge within {max_iterations} "
            "rounds; a component's diameter exceeds the bound — raise "
            "max_iterations (rounds needed = graph diameter)"
        )
    return labels.select(F.col("vertex").alias("doc"), F.col("label").alias("cluster_id"))
