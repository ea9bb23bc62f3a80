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
