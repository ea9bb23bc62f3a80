"""PageRank: parity with a dense NumPy power iteration (same dangling
redistribution), mass conservation, multigraph semantics, early stop."""

import numpy as np
import pytest

from information_extraction_for_chinese_nlp_spark.operators.centrality import pagerank

# iterative multi-action tests: excluded from the fast inner-loop tier
# (gate-level coverage lives in the pagerank_entities oracle compare)
pytestmark = pytest.mark.slow

_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (4, 2)]  # node 3 dangles


def _ref(edge_list, n, d=0.85, iters=10):
    deg = np.zeros(n)
    for u, _ in edge_list:
        deg[u] += 1
    m = np.zeros((n, n))
    for u, v in edge_list:
        m[v, u] += 1.0 / deg[u]
    r = np.full(n, 1.0 / n)
    dangling = deg == 0
    for _ in range(iters):
        r = (1 - d) / n + d * (m @ r + r[dangling].sum() / n)
    return r


def _spark_ranks(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {r.node: r.rank for r in pagerank(edges, **kw).collect()}


def test_pagerank_matches_power_iteration(spark):
    got = _spark_ranks(spark, _EDGES, max_iter=10)
    want = _ref(_EDGES, 5)
    assert set(got) == set(range(5))
    for v in range(5):
        assert abs(got[v] - want[v]) < 1e-9, v
    # mass conserved (dangling redistribution): ranks sum to ~1
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # node 2 drains ALL its mass to 3 (outdeg 1), so the hub-fed
    # dangler tops the ranking; the 3-in-edge hub beats the sources
    assert got[3] == max(got.values())
    assert got[2] > got[0]


def test_pagerank_multigraph_counts_parallel_edges(spark):
    doubled = _EDGES + [(0, 1)]  # 0 endorses 1 twice (deg 0 becomes 3)
    got = _spark_ranks(spark, doubled, max_iter=10)
    want = _ref(doubled, 5)
    for v in range(5):
        assert abs(got[v] - want[v]) < 1e-9, v
    # the doubled endorsement must matter
    single = _spark_ranks(spark, _EDGES, max_iter=10)
    assert got[1] > single[1]


def test_pagerank_spans_checkpoint_boundaries(spark):
    # 10 iterations with cuts every 3: same result as uncut
    a = _spark_ranks(spark, _EDGES, max_iter=10, checkpoint_every=3)
    b = _spark_ranks(spark, _EDGES, max_iter=10, checkpoint_every=100)
    for v in range(5):
        assert abs(a[v] - b[v]) < 1e-12


def test_pagerank_tol_early_stop_close_to_converged(spark):
    far = _spark_ranks(spark, _EDGES, max_iter=50, checkpoint_every=5)
    early = _spark_ranks(
        spark, _EDGES, max_iter=50, tol=1e-10, checkpoint_every=5
    )
    for v in range(5):
        assert abs(far[v] - early[v]) < 1e-7


def test_pagerank_validates_args(spark):
    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=1.0)
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(edges, max_iter=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(edges, checkpoint_every=0)


def test_pagerank_bucketed_edges_colocate_no_edge_exchange(spark):
    """The at-scale layout path: edges persisted bucketed by src and
    passed with materialize_edges=False — the degree groupBy and the
    per-round rank join co-locate on the bucketed scan, so the plan
    carries strictly fewer exchanges than the materialized path (whose
    localCheckpoint drops partitioning), and ranks agree exactly."""
    from information_extraction_for_chinese_nlp_spark.sources.bucketing import (
        write_bucketed,
    )

    from pyspark.sql import functions as F

    edges = spark.createDataFrame(_EDGES * 4, "src long, dst long")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(edges, "t_pr_edges", "src", n_buckets=4)
        bucketed = spark.table("t_pr_edges")

        def exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.split("== Initial Plan ==")[0].count("Exchange")

        a = pagerank(bucketed, max_iter=1, materialize_edges=False)
        b = pagerank(edges, max_iter=1)
        assert exchanges(a) < exchanges(b), (exchanges(a), exchanges(b))

        ra = {r.node: r.rank for r in a.collect()}
        rb = {r.node: r.rank for r in b.collect()}
        assert set(ra) == set(rb)
        for k in ra:
            assert abs(ra[k] - rb[k]) < 1e-12
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS t_pr_edges")


def _ref_general(edge_list, n, d=0.85, iters=10, weights=None, seeds=None):
    """Reset-vector formulation: r = rv*(1-d + d*dangling) + d*M r."""
    w = weights or [1.0] * len(edge_list)
    outw = np.zeros(n)
    for (u, _), wi in zip(edge_list, w):
        outw[u] += wi
    m = np.zeros((n, n))
    for (u, v), wi in zip(edge_list, w):
        m[v, u] += wi / outw[u]
    rv = np.zeros(n)
    if seeds is None:
        rv[:] = 1.0 / n
    else:
        rv[list(seeds)] = 1.0 / len(seeds)
    r = rv.copy()
    dangling = outw == 0
    for _ in range(iters):
        r = rv * (1 - d + d * r[dangling].sum()) + d * (m @ r)
    return r


def test_pagerank_weighted_matches_reference(spark):
    w = [2.0, 1.0, 0.5, 3.0, 1.0]
    edges = spark.createDataFrame(
        [(u, v, wi) for (u, v), wi in zip(_EDGES, w)],
        "src long, dst long, w double",
    )
    got = {
        r.node: r.rank
        for r in pagerank(edges, max_iter=10, weight_col="w").collect()
    }
    want = _ref_general(_EDGES, 5, weights=w)
    for v in range(5):
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # weights matter: node 1 (in-edge weight 2 of src 0's total 3)
    # differs from the unweighted run
    unw = _ref_general(_EDGES, 5)
    assert abs(want[1] - unw[1]) > 1e-4


def test_pagerank_weighted_nonpositive_edges_dropped(spark):
    # a src whose only out-edge has weight 0 becomes DANGLING, not a
    # division by zero
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 0.0), (2, 0, None)],
        "src long, dst long, w double",
    )
    got = {
        r.node: r.rank
        for r in pagerank(edges, max_iter=10, weight_col="w").collect()
    }
    # only edge 0->1 survives; 1 and 2 dangle
    want = _ref_general([(0, 1)], 3, weights=[1.0])
    for v in range(3):
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_personalized_concentrates_on_seeds(spark):
    import pytest as _pytest

    edges = spark.createDataFrame(_EDGES, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (0,), (99,)], "node long")
    got = {
        r.node: r.rank
        for r in pagerank(edges, max_iter=10, seeds=seeds).collect()
    }
    want = _ref_general(_EDGES, 5, seeds=[0])
    for v in range(5):
        assert abs(got[v] - want[v]) < 1e-9, v
    # mass conserved and anchored: the seed outranks the global run's
    # uniform floor, and unreachable-from-seed nodes get ~0
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > 1.0 / 5
    assert got[4] < 1e-12  # nothing reaches 4 from 0

    with _pytest.raises(ValueError, match="seeds"):
        pagerank(
            edges,
            seeds=spark.createDataFrame([(42,)], "node long"),
        )


def test_label_propagation_two_dense_communities(spark):
    from information_extraction_for_chinese_nlp_spark.operators.centrality import (
        label_propagation,
    )

    # two triangles bridged by one edge: LPA should give each triangle
    # one label and not merge across the bridge (CC would merge all 6)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        "src long, dst long",
    )
    got = {r.node: r.label for r in label_propagation(edges, max_iter=5).collect()}
    assert len(got) == 6
    left = {got[v] for v in (0, 1)}
    right = {got[v] for v in (11, 12)}
    assert len(left) == 1 and len(right) == 1
    assert left != right  # the bridge did not merge the triangles

    # determinism: second run identical
    again = {r.node: r.label for r in label_propagation(edges, max_iter=5).collect()}
    assert again == got


def test_label_propagation_python_reference_parity(spark):
    """Synchronous min-tie LPA against a direct Python simulation on a
    seeded random graph — every node, every round semantics."""
    import random

    from information_extraction_for_chinese_nlp_spark.operators.centrality import (
        label_propagation,
    )

    rng = random.Random(7)
    n = 40
    edge_list = list({(rng.randrange(n), rng.randrange(n)) for _ in range(80)})
    edge_list = [(u, v) for u, v in edge_list if u != v]

    # python reference: synchronous, neighbors vote, max count then min
    adj: dict = {}
    for u, v in edge_list:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    labels = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v, nbrs in adj.items():
            counts: dict = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[v] = best
        labels = nxt

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r.label for r in label_propagation(edges, max_iter=4).collect()}
    assert got == labels
