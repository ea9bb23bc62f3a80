"""Smoke test for the conversion CLI (scripts/run_convert.py), the
distributed analog of reference run_convert.py's arg surface."""

import pytest

import json
import os
import sys

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _export(tmp_path):
    text = "原告支出醫療費用98,532元 並請求精神慰撫金額80,000元"
    s1 = text.index("98,532元")
    s2 = text.index("80,000元")
    records = [
        {
            "id": i,
            "data": {"text": text},
            "annotations": [{"result": [
                {"type": "labels",
                 "value": {"start": s1, "end": s1 + 7, "text": "98,532元",
                           "labels": ["醫療費用"]}},
                {"type": "labels",
                 "value": {"start": s2, "end": s2 + 7, "text": "80,000元",
                           "labels": ["精神慰撫金額"]}},
            ]}],
        }
        for i in range(20)
    ]
    # one invalid record that must quarantine, not abort
    records.append({
        "id": 99,
        "data": {"text": "relation doc"},
        "annotations": [{"result": [
            {"type": "relation",
             "value": {"start": 0, "end": 3, "text": "rel", "labels": ["x"]}},
        ]}],
    })
    path = tmp_path / "export.json"
    path.write_text(json.dumps(records, ensure_ascii=False))
    return str(path)


def test_convert_cli_end_to_end(spark, tmp_path):
    sys.path.insert(0, SCRIPTS)
    try:
        import run_convert
    finally:
        sys.path.remove(SCRIPTS)

    save_dir = str(tmp_path / "out")
    out = run_convert.main([
        "--labelstudio-file", _export(tmp_path),
        "--save-dir", save_dir,
        "--seed", "7",
    ])
    assert out["quarantined"] == 1
    # 20 valid docs x 3 default prompts x 1 chunk = 60 records, 80/10/10
    assert out["total"] == 60
    assert out["counts"]["train"] == 48
    assert os.path.isdir(os.path.join(save_dir, "train"))

    # every emitted record carries routed gold spans for its prompt
    train = spark.read.json(os.path.join(save_dir, "train"))
    assert {"doc_id", "chunk_idx", "chunk_start", "content", "prompt",
            "result_list"} <= set(train.columns)
    row = train.filter("prompt = '醫療費用'").first()
    assert any(r["text"] == "98,532元" for r in row.result_list)

    # the scale path produces a valid three-way split too
    out2 = run_convert.main([
        "--labelstudio-file", _export(tmp_path),
        "--save-dir", str(tmp_path / "out2"),
        "--hash-split",
    ])
    assert out2["total"] == 60


def test_split_is_document_granular(spark, tmp_path):
    """No document's records may straddle splits (the reference's
    do_split partitions raw documents BEFORE convert_format; splitting
    expanded records would leak identical source text across splits)."""
    sys.path.insert(0, SCRIPTS)
    try:
        import run_convert
    finally:
        sys.path.remove(SCRIPTS)

    for extra in ([], ["--hash-split"]):
        save = str(tmp_path / ("out_doc" + ("_h" if extra else "")))
        run_convert.main([
            "--labelstudio-file", _export(tmp_path),
            "--save-dir", save, "--seed", "7", *extra,
        ])
        seen = {}
        for name in ("train", "dev", "test"):
            part = os.path.join(save, name)
            if not os.path.isdir(part):
                continue
            for r in spark.read.json(part).select("doc_id").collect():
                assert seen.setdefault(r.doc_id, name) == name, (
                    f"doc {r.doc_id} straddles {seen[r.doc_id]} and {name}"
                )

# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
pytestmark = pytest.mark.slow
