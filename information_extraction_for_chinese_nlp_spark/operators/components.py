"""Connected components — canonicalization over the entity match graph.

Pure-DataFrame iterative min-label propagation (no GraphFrames):
each round every node adopts the minimum component id in its closed
neighborhood; convergence in O(graph diameter) rounds. Lineage is
truncated with ``localCheckpoint`` each round so the plan doesn't grow
unboundedly (SURVEY.md §4 item 3). Entity-match graphs are unions of
small cliques (diameter ≲ 2-3), so this beats the large-star/small-star
constant factor while having the same shuffle profile per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) undirected -> (node, component) with component =
    min node id of the component (lexicographic for strings)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # neighbor labels: for edge (a,b), b hears a's component
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
