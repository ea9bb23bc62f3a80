"""Smoke test for the KG-construction CLI (scripts/run_kg.py):
extract -> build_kg -> validate/resolve/topk/pagerank post-stages, one
JSON metrics line, all tables written and readable."""

import os
import sys

import pytest

# e2e CLI run: excluded from the fast inner-loop tier like its siblings
pytestmark = pytest.mark.slow

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def test_run_kg_cli_end_to_end(spark, tmp_path):
    sys.path.insert(0, SCRIPTS)
    try:
        import run_kg
    finally:
        sys.path.remove(SCRIPTS)

    constraints_path = str(tmp_path / "constraints.parquet")
    spark.createDataFrame(
        [
            # every extraction pred; anchored money-surface pattern for
            # 醫療費用, a support floor that some facts will fail
            ("醫療費用", ".*元", None, None),
            ("當事人", None, None, 1),
            ("法院", None, None, 1),
            ("日期", None, None, 1),
        ],
        "pred string, obj_pattern string, min_prob double, min_docs int",
    ).write.parquet(constraints_path)

    save_dir = str(tmp_path / "kg_out")
    m = run_kg.main([
        "--synth-convs", "40",
        "--save-dir", save_dir,
        "--constraints", constraints_path,
        "--resolve-functional",
        "--topk", "2",
        "--pagerank", "3",
    ])

    assert m["vertices"] > 0 and m["fused_edges"] > 0
    assert m["facts_valid"] + m["facts_quarantine"] == m["fused_edges"]
    assert m["resolved"] <= m["fused_edges"]
    assert m["topk"] >= m["resolved"]  # k=2 keeps at least the winner
    assert m["entity_ranks"] > 0

    fused = spark.read.parquet(f"{save_dir}/fused_edges")
    assert {"subj", "pred", "entity_id", "canonical_text", "fused_prob"} <= set(
        fused.columns
    )
    # fusion invariant holds through the composed CLI path
    assert fused.filter("fused_prob < max_prob").count() == 0

    resolved = spark.read.parquet(f"{save_dir}/resolved")
    # functional resolution: exactly one row per (subj, pred)
    assert (
        resolved.groupBy("subj", "pred").count().filter("count > 1").count()
        == 0
    )

    ranks = spark.read.parquet(f"{save_dir}/entity_ranks")
    total = ranks.agg({"rank": "sum"}).collect()[0][0]
    assert abs(total - 1.0) < 1e-6  # mass conserved

    # determinism: a rerun into a fresh dir produces identical tables
    save2 = str(tmp_path / "kg_out2")
    m2 = run_kg.main([
        "--synth-convs", "40",
        "--save-dir", save2,
        "--resolve-functional",
    ])
    assert m2["fused_edges"] == m["fused_edges"]
    a = sorted(map(tuple, spark.read.parquet(f"{save_dir}/resolved").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{save2}/resolved").collect()))
    assert a == b
