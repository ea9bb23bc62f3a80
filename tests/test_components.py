"""Connected components: durable (reliable checkpoint) vs local-block
lineage truncation must be behavior-identical."""

from information_extraction_for_chinese_nlp_spark.operators.components import (
    connected_components,
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
