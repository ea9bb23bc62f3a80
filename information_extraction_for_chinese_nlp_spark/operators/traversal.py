"""Seeded subgraph extraction: minimal-hop BFS over the canonical KG —
the review/debug primitive ("show me everything within 2 hops of these
entities") and the input cut for downstream per-case processing.

Scale shape per level: ONE join of the frontier onto the edge table
(the frontier is usually orders smaller than the graph and broadcasts;
past the threshold it is a shuffled join on the edge key — same layout
notes as ``centrality.pagerank``), one distinct, one anti-join against
the visited set. The visited set is lineage-cut per level (it is read
by every later level's anti-join), and an empty frontier short-circuits
— a k=6 request over a 2-hop component does 2 rounds of work. No
driver-side data loops; the only driver value is the per-level
emptiness probe (``take(1)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """edges(src, dst) + seeds(node_col) -> (node, hop) with hop = the
    MINIMAL number of edges from any seed (0 for the seeds themselves),
    restricted to hop <= k. ``directed=False`` (default) treats edges
    as undirected — the usual KG-neighborhood semantics.

    Seeds absent from the graph still appear at hop 0 (they are part
    of the requested subgraph); duplicate seed rows collapse.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    step = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    if not directed:
        step = step.unionByName(
            step.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )

    visited = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for h in range(1, k + 1):
        reached = (
            frontier.join(step, frontier["node"] == step["_u"])
            .select(F.col("_v").alias("node"))
            .distinct()
        )
        fresh = reached.join(visited.select("node"), on="node", how="left_anti")
        fresh = fresh.withColumn("hop", F.lit(h).cast("long"))
        # the visited set feeds every later level's anti-join: cut its
        # lineage so level h+1 reads blocks, not a h-level plan
        visited = visited.unionByName(fresh).localCheckpoint(eager=True)
        frontier = visited.filter(F.col("hop") == h).select("node")
        if not frontier.take(1):
            break
    return visited
