"""Connected components: durable (reliable checkpoint) vs local-block
lineage truncation must be behavior-identical; incremental merge must
equal a full recompute."""

from information_extraction_for_chinese_nlp_spark.operators.components import (
    connected_components,
    merge_components,
)

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("d", "e"), ("e", "f"),
    ("g", "h"), ("h", "i"), ("i", "g"),
    ("x", "y"), ("y", "z"),
    ("lone1", "lone2"),
]


def test_durable_checkpoint_matches_local(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    local = sorted(map(tuple, connected_components(edges).collect()))
    durable = sorted(map(tuple, connected_components(edges, durable=True).collect()))
    assert durable == local
    comps = {}
    for node, comp in durable:
        comps.setdefault(comp, set()).add(node)
    assert set(map(frozenset, comps.values())) == {
        frozenset("abc"), frozenset("def"), frozenset("ghi"),
        frozenset("xyz"), frozenset({"lone1", "lone2"}),
    }


def test_durable_auto_checkpoint_cleaned_on_every_run(spark):
    """Run 2+ must also get a fresh auto-created checkpoint dir and clean
    it: getCheckpointDir() keeps returning run 1's (deleted) dir, so
    without ownership tracking later runs would checkpoint into a
    recreated dir nobody removes."""
    import os

    sc = spark.sparkContext
    current = sc.getCheckpointDir()
    owned = getattr(sc, "_cc_auto_checkpoint_resolved", None)
    if current is not None and current != owned:
        import pytest

        pytest.skip("session has a user-set checkpoint dir; auto branch off")

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    r1 = sorted(map(tuple, connected_components(edges, durable=True).collect()))
    d1 = sc._cc_auto_checkpoint_resolved
    r2 = sorted(map(tuple, connected_components(edges, durable=True).collect()))
    d2 = sc._cc_auto_checkpoint_resolved
    assert d1 != d2, "run 2 reused run 1's deleted checkpoint dir"
    for d in (d1, d2):
        path = d.split(":", 1)[1] if d.startswith("file:") else d
        # setCheckpointDir creates a UUID subdir under our tempdir; the
        # cleanup removes the whole tempdir
        assert not os.path.exists(os.path.dirname(path)), d
    assert r1 == r2


def test_merge_components_equals_full_recompute(spark):
    """Folding a batch of new edges into a converged labeling via the
    contraction graph must equal CC over the full union — on a random
    graph covering merges (old component ∪ old component), extensions
    (old ∪ new node), brand-new chains, and untouched components."""
    import random

    rnd = random.Random(42)
    nodes = [f"n{i:03d}" for i in range(60)]
    all_edges = [
        (rnd.choice(nodes), rnd.choice(nodes)) for _ in range(80)
    ]
    all_edges = [(a, b) for a, b in all_edges if a != b]
    old, new = all_edges[:50], all_edges[50:]
    old_df = spark.createDataFrame(old, "src string, dst string")
    new_df = spark.createDataFrame(new, "src string, dst string")

    prev = connected_components(old_df)
    merged = merge_components(prev, new_df)
    full = connected_components(old_df.union(new_df))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_components_cases(spark):
    """Deterministic micro-cases: merge two old components, extend one
    with a new node, add a disjoint new chain, leave one untouched."""
    old = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f"), ("x", "y")],
        "src string, dst string",
    )
    prev = connected_components(old)
    new = spark.createDataFrame(
        [
            ("b", "c"),      # merges {a,b} with {c,d} -> component 'a'
            ("f", "g"),      # extends {e,f} with new node g
            ("p", "q"),      # brand-new chain
            ("x", "x"),      # self-loop: must not disturb {x,y}
        ],
        "src string, dst string",
    )
    got = {r.node: r.component for r in merge_components(prev, new).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "e": "e", "f": "e", "g": "e",
        "p": "p", "q": "p",
        "x": "x", "y": "x",
    }

def test_merge_components_local_fold_parity(spark):
    """The driver-side union-find fast path (default: contraction graph
    under local_fold_threshold) must produce the IDENTICAL labeling as
    the distributed iterative path (threshold=None) and as a full
    recompute — same random graph as the recompute test, all three
    pairwise equal."""
    import random

    rnd = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(80)]
    all_edges = [(rnd.choice(nodes), rnd.choice(nodes)) for _ in range(110)]
    old, new = all_edges[:70], all_edges[70:]
    old_df = spark.createDataFrame(old, "src string, dst string")
    new_df = spark.createDataFrame(new, "src string, dst string")

    prev = connected_components(
        old_df.filter("src != dst")
    ).localCheckpoint()
    local = sorted(map(tuple, merge_components(prev, new_df).collect()))
    dist = sorted(map(tuple, merge_components(
        prev, new_df, local_fold_threshold=None
    ).collect()))
    full = sorted(map(tuple, connected_components(
        old_df.union(new_df)
    ).collect()))
    assert local == dist == full


def test_merge_components_probe_fallback(spark):
    """A threshold smaller than the contraction graph must fall back to
    the distributed path (the limit-probe comes back full) and still
    produce the same labeling."""
    old = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f"), ("x", "y")],
        "src string, dst string",
    )
    prev = connected_components(old)
    new = spark.createDataFrame(
        [("b", "c"), ("f", "g"), ("p", "q")], "src string, dst string"
    )
    tiny = sorted(map(tuple, merge_components(
        prev, new, local_fold_threshold=1
    ).collect()))
    default = sorted(map(tuple, merge_components(prev, new).collect()))
    assert tiny == default


def test_local_components_matches_distributed_semantics():
    """_local_components unit contract: min-member labeling, self-loop
    rows skipped, loop-only nodes never emitted."""
    from information_extraction_for_chinese_nlp_spark.operators.components import (
        _local_components,
    )

    got = dict(_local_components([
        ("b", "a"), ("c", "b"),       # chain -> min 'a'
        ("z", "z"),                   # loop-only node: not emitted
        ("m", "n"), ("n", "m"),       # duplicate/reversed edge
    ]))
    assert got == {"a": "a", "b": "a", "c": "a", "m": "m", "n": "m"}

    # long ids: numeric min, not lexicographic
    got2 = dict(_local_components([(10, 2), (2, 100)]))
    assert got2 == {2: 2, 10: 2, 100: 2}


# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
import pytest

pytestmark = pytest.mark.slow


def test_broadcast_label_hint_parity(spark):
    """r8: under broadcast_label_limit the per-round label join carries
    a broadcast hint (edge table never exchanged). Hinted and unhinted
    labelings must be identical, pointer_jump on and off."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.components import (
        connected_components,
    )

    edges = spark.range(3000).select(
        F.pmod(F.xxhash64("id"), 500).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(7)), 500).alias("dst"),
    )
    for pj in (False, True):
        hinted = sorted(map(tuple, connected_components(
            edges, pointer_jump=pj).collect()))
        plain = sorted(map(tuple, connected_components(
            edges, pointer_jump=pj, broadcast_label_limit=0).collect()))
        assert hinted == plain
