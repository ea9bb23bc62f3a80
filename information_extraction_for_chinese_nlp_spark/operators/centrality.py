"""Entity-importance ranking over the canonical KG: PageRank via
iterative DataFrame joins (Pregel-style message passing expressed
declaratively, like ``operators.components``'s CC iteration).

``entity_salience`` (operators.fusion) ranks by LOCAL structure
(weighted degree); PageRank propagates importance GLOBALLY — an entity
referenced by important cases outranks one with the same degree from
unimportant ones. This is the standard curation/linking-budget ranker
for web-scale graphs, built from the public random-surfer formulation
(Page et al. 1999; dangling mass redistributed uniformly).

Scale shape per iteration: the EDGE table is degree-annotated,
hash-partitioned on ``src`` and lineage-truncated ONCE up front — each
iteration then shuffles only the rank vector (|V| rows, orders smaller
than |E| for real graphs): one exchange to join ranks onto edges, one
for the contribution groupBy, one broadcast of the 1-row dangling
aggregate. Lineage is cut every ``checkpoint_every`` iterations
(localCheckpoint, same discipline as connected_components) so the plan
never grows superlinearly with iteration count. No driver-side loop
over data — the only driver values are the node count and the optional
convergence probe, both scalar aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float | None = None,
    checkpoint_every: int = 5,
    materialize_edges: bool = True,
    weight_col: str | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """edges(src, dst) directed (parallel edges count as repeated
    endorsements) -> (node, rank), ranks summing to ~1.

    rank_{t+1}(v) = reset(v) * (1-d + d*dangling_t)
                    + d * sum_{u->v} rank_t(u) * w(u,v) / outw(u)

    where ``reset`` is the teleport distribution (uniform 1/N by
    default), ``outw(u)`` the (weighted) out-degree, and ``dangling_t``
    the total rank mass on nodes with no out-edges, redistributed over
    the reset distribution (the standard fix — without it mass leaks
    and ranks no longer compare across components).

    ``weight_col``: optional positive edge weight — e.g. ``fused_prob``
    so a 0.99-confidence fact endorses harder than a 0.5 one; rows with
    NULL or non-positive weight are dropped (they carry no
    endorsement). ``None`` = every edge weighs 1 (parallel edges still
    count multiply).

    ``seeds``: optional (node) frame -> PERSONALIZED PageRank: the
    reset distribution concentrates uniformly on the seed nodes
    (intersected with the graph; must be non-empty), so rank measures
    proximity-weighted importance relative to the seeds — the curation
    query "what matters around these flagged entities", the global
    variant's local counterpart. Nodes unreachable from every seed get
    rank 0 (no uniform floor).

    ``tol``: when set, iteration stops early once the L1 delta between
    consecutive rank vectors falls below it; the probe is evaluated
    only at ``checkpoint_every`` boundaries (folded into the checkpoint
    action — no extra jobs on other iterations). When None the loop
    runs exactly ``max_iter`` iterations, which keeps the output
    reproducible for oracle comparison.

    ``materialize_edges``: True (default) degree-annotates the edges
    once and cuts their lineage — each round re-reads the materialized
    blocks instead of re-deriving the input plan. NOTE a measured
    limitation: ``localCheckpoint`` does NOT carry partitioning
    through the cut in this runtime, so past the rank vector's
    broadcast threshold the edge side re-exchanges per round. The
    at-scale answer is layout, not checkpointing: persist the edges
    bucketed by ``src`` (``sources.bucketing.write_bucketed``), read
    them back, and pass ``materialize_edges=False`` — the bucketed
    scan reports its hash partitioning, so the degree groupBy AND
    every round's rank join co-locate with no edge-side exchange
    (plan-asserted in test_centrality); each round re-scans the
    bucketed files, which is the cheap half of the trade at 10^9+
    edges where the shuffle is the bottleneck.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")

    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if weight_col is None:
        weighted = edges.select(src, dst, F.lit(1.0).alias("_w"))
    else:
        weighted = edges.select(
            src, dst, F.col(weight_col).cast("double").alias("_w")
        ).filter(F.col("_w") > 0)
    deg = weighted.groupBy(src).agg(F.sum("_w").alias("_deg"))
    # degree-annotated edges: built once; see the materialize_edges
    # docstring note for the cut-vs-layout trade
    linked = weighted.join(deg, on=src)
    if materialize_edges:
        linked = linked.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    if seeds is None:
        # uniform teleport: a literal, no join — the common case pays
        # nothing for the personalization machinery
        nodes = nodes.withColumn("_rv", F.lit(1.0 / n))
    else:
        seed_nodes = (
            seeds.select(F.col("node")).distinct().join(nodes, on="node")
        )
        n_seeds = seed_nodes.count()
        if n_seeds == 0:
            raise ValueError("seeds share no node with the graph")
        nodes = (
            nodes.join(
                F.broadcast(
                    seed_nodes.withColumn("_rv", F.lit(1.0 / n_seeds))
                ),
                on="node",
                how="left",
            )
            .na.fill({"_rv": 0.0})
            .localCheckpoint(eager=True)
        )

    ranks = nodes.select("node", F.col("_rv").alias("rank"))
    # nodes with no out-edges, fixed across iterations. When the graph
    # has none (bidirectional or cleaned graphs — the common KG case),
    # the loop below stays a PURE lazy chain, lineage-cut only every
    # checkpoint_every rounds. When danglers exist, each round needs
    # their total rank mass — a second consumer of the rank vector —
    # so ranks are materialized per round (eager localCheckpoint on a
    # |V|-row frame) and the mass arrives as a driver scalar (same
    # tiny-by-contract class as the CC convergence probe); a lazy
    # broadcast subplan here would re-execute the rank lineage from
    # the last cut, O(window²) recompute.
    dangling_nodes = nodes.join(
        deg.withColumnRenamed(src, "node"), on="node", how="left_anti"
    ).localCheckpoint(eager=True)
    has_dangling = bool(dangling_nodes.take(1))
    if has_dangling:
        ranks = ranks.localCheckpoint(eager=True)

    for it in range(max_iter):
        dm = 0.0
        if has_dangling:
            dm = (
                dangling_nodes.join(ranks, on="node")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        contribs = (
            linked.join(ranks.withColumnRenamed("node", src), on=src)
            .groupBy(dst)
            .agg(
                F.sum(F.col("rank") * F.col("_w") / F.col("_deg")).alias("_c")
            )
        )
        new_ranks = nodes.join(
            contribs.withColumnRenamed(dst, "node"), on="node", how="left"
        ).select(
            "node",
            (
                F.col("_rv") * F.lit(1.0 - damping + damping * dm)
                + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0))
            ).alias("rank"),
        )
        # the FINAL iteration is never cut: the caller's first action
        # executes the (bounded, <= checkpoint_every rounds) lazy tail
        # directly instead of paying a materialization pass it may not
        # need, and the returned plan stays inspectable
        at_cut = (it + 1) % checkpoint_every == 0 and it < max_iter - 1
        if tol is not None and at_cut:
            # fold the convergence probe into the same pass that
            # materializes the checkpoint: one action reads both
            probe = new_ranks.join(
                ranks.withColumnRenamed("rank", "_prev"), on="node"
            ).localCheckpoint(eager=True)
            delta = probe.agg(
                F.sum(F.abs(F.col("rank") - F.col("_prev")))
            ).collect()[0][0]
            new_ranks = probe.drop("_prev")
            if delta is not None and delta < tol:
                return new_ranks
        elif at_cut or (has_dangling and it < max_iter - 1):
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 5,
    directed: bool = False,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation ->
    (node, label): each round every node adopts the most frequent label
    among its neighbors, ties broken by the SMALLEST label — fully
    deterministic (unlike the classic asynchronous LPA), so reruns,
    retries, and the DuckDB oracle all agree. Labels start as the node
    ids; after ``max_iter`` rounds densely-connected groups share a
    label while bridges between them carry little voting weight —
    the density complement to ``connected_components`` (which merges
    ANY connectivity) for KG cluster review.

    Synchronous LPA on bipartite-ish structure can oscillate between
    two colorings; ``max_iter`` bounds that by construction and the
    fixed iteration count keeps the output reproducible.

    Scale shape per round: one join of the label vector onto the edge
    list (label vector broadcasts while small; bucketed edge layout
    co-locates it at scale — same notes as ``pagerank``), one
    (node, label) count aggregation, one per-node window over the
    label's candidate set (bounded by the node's distinct neighbor
    labels). Lineage cut every ``checkpoint_every`` rounds, final
    round never cut.
    """
    from pyspark.sql.window import Window

    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")

    step = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    if not directed:
        step = step.unionByName(
            step.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
    step = step.localCheckpoint(eager=True)
    nodes = step.select(F.col("_u").alias("node")).unionByName(
        step.select(F.col("_v").alias("node"))
    ).distinct().localCheckpoint(eager=True)

    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(
        F.col("_n").desc(), F.col("label").asc()
    )
    for it in range(max_iter):
        votes = (
            step.join(labels.withColumnRenamed("node", "_u"), on="_u")
            .groupBy(F.col("_v").alias("node"), "label")
            .agg(F.count("*").alias("_n"))
        )
        picked = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        # isolated-from-voting nodes cannot exist in the undirected
        # case (every node has >= 1 neighbor by construction); in the
        # directed case a source-only node keeps its current label
        new_labels = (
            labels.select("node").join(picked, on="node", how="left")
            .join(labels.withColumnRenamed("label", "_prev"), on="node")
            .select("node", F.coalesce("label", "_prev").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0 and it < max_iter - 1:
            new_labels = new_labels.localCheckpoint(eager=True)
        labels = new_labels
    return labels
