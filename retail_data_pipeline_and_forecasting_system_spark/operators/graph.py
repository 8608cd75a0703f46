"""Connected components over near-duplicate pairs → dup clusters.

The principled completion of pairwise dedup: `d2/d3/d7` emit (doc_a,
doc_b) edges; transitive closure groups them into clusters so curation
keeps exactly one representative per cluster (the greedy "drop every
doc_b" rule over-drops chains and under-drops when the canonical member
itself was dropped).

Algorithm: iterative min-label propagation (the simple alternating
large-star variant). Each vertex starts labeled with itself; every
iteration each vertex takes the min label in its closed neighborhood;
stop when no label changes. Iterations = O(component diameter) — dup
clusters are short chains in practice, so this converges in a few
rounds; each round is two shuffles (join + groupBy) over the edge list,
fully distributed. The driver loop only carries a scalar changed-count
per round (no data ever collects).

At 100 TB: edges ≪ documents (only near-dup pairs), so the iteration
cost is proportional to the duplicate subgraph, not the corpus. For
pathological long-diameter graphs switch to the pointer-doubling
(log-diameter) variant; dup graphs do not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(a, b) edges → (doc_id, component) with component = min doc id
    reachable. Deterministic for any input order."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(
                labels.withColumnRenamed("doc_id", "v").withColumnRenamed(
                    "component", "v_comp"
                ),
                on="v",
            )
            .groupBy("u")
            .agg(F.min("v_comp").alias("neigh_comp"))
        )
        updated = (
            labels.join(
                neigh_min.withColumnRenamed("u", "doc_id"), on="doc_id", how="left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neigh_comp"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("neigh_comp"), F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint()  # truncate the O(iters) lineage
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    return labels


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, is_canonical).

    cluster_id = min doc id of the component; the canonical (kept) doc is
    that minimum. Docs not in any pair are absent — they are their own
    implicit cluster.
    """
    comp = connected_components(pairs, a_col, b_col)
    return comp.select(
        "doc_id",
        F.col("component").alias("cluster_id"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )
