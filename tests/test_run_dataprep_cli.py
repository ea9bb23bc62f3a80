"""Smoke test for the curation CLI (scripts/run_dataprep.py): dedup →
decontaminate → quality filter → PII scrub → stratified sample, with
per-stage survivor counts."""

import pytest

import os
import sys

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def test_dataprep_cli_end_to_end(spark, tmp_path):
    sys.path.insert(0, SCRIPTS)
    try:
        import run_dataprep
    finally:
        sys.path.remove(SCRIPTS)

    rows = []
    # 3 exact copies -> 1 survivor
    for i in range(3):
        rows.append((i, "alpha beta gamma delta epsilon zeta eta theta", "en"))
    # near-dup pair (one token differs) -> 1 survivor via LSH+CC
    rows.append((10, "one two three four five six seven eight nine ten", "en"))
    rows.append((11, "one two three four five six seven eight nine zen", "en"))
    # overlaps the eval corpus -> decontaminated away
    rows.append((20, "the secret eval question about spark internals", "en"))
    # PII doc
    rows.append((30, "contact me at alice@example.com for details ok", "en"))
    # unique zh doc
    rows.append((40, "完全 不同 的 文件 內容 在 這裡 存在", "zh"))
    docs_path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(docs_path)

    eval_path = str(tmp_path / "eval.parquet")
    spark.createDataFrame(
        [(0, "the secret eval question about spark internals")],
        "doc_id long, text string",
    ).write.parquet(eval_path)

    save_dir = str(tmp_path / "out")
    m = run_dataprep.main([
        "--input", docs_path,
        "--save-dir", save_dir,
        "--dedup", "pipeline",
        "--n-bands", "2", "--rows-per-band", "2",
        "--decontaminate", eval_path, "--decontam-ngram", "5",
        "--scrub-pii",
    ])
    assert m["n_in"] == 8
    assert m["n_after_dedup"] <= 6  # exact triple -> 1, near-dup pair -> 1
    assert m["n_after_decontam"] == m["n_after_dedup"] - 1
    assert m["n_redactions"] >= 1
    assert m["n_out"] == m["n_after_decontam"]
    out = {r.doc_id: r.text for r in
           spark.read.parquet(os.path.join(save_dir, "docs")).collect()}
    assert 20 not in out
    assert "<EMAIL>" in out[30]


def test_dataprep_cli_sampling_and_exact(spark, tmp_path):
    sys.path.insert(0, SCRIPTS)
    try:
        import run_dataprep
    finally:
        sys.path.remove(SCRIPTS)

    docs_path = str(tmp_path / "docs2.parquet")
    spark.createDataFrame(
        [(i, f"unique words number {i} here", "zh" if i % 2 else "en")
         for i in range(40)],
        "doc_id long, text string, lang string",
    ).write.parquet(docs_path)

    save_dir = str(tmp_path / "out2")
    m = run_dataprep.main([
        "--input", docs_path,
        "--save-dir", save_dir,
        "--dedup", "exact",
        "--sample", "zh=1.0", "--default-fraction", "0.0",
    ])
    assert m["n_after_dedup"] == 40  # no exact dups
    assert m["n_after_sample"] == 20  # zh kept, en default 0.0
    langs = {r.lang for r in
             spark.read.parquet(os.path.join(save_dir, "docs")).collect()}
    assert langs == {"zh"}

def test_dataprep_cli_text_col_not_named_text(spark, tmp_path):
    """--text-col body on an input that ALSO carries a literal 'text'
    column: the PII stage must scrub `body` (renaming its fixed 'text'
    output back BEFORE the join — the old join-first shape produced two
    ambiguous 'text' columns) and leave the unrelated 'text' column
    byte-identical."""
    sys.path.insert(0, SCRIPTS)
    try:
        import run_dataprep
    finally:
        sys.path.remove(SCRIPTS)

    docs_path = str(tmp_path / "docs3.parquet")
    spark.createDataFrame(
        [(1, "reach me at bob@example.com today", "unrelated text col 1"),
         (2, "no private data in this body here", "unrelated text col 2")],
        "doc_id long, body string, text string",
    ).write.parquet(docs_path)

    save_dir = str(tmp_path / "out3")
    m = run_dataprep.main([
        "--input", docs_path,
        "--save-dir", save_dir,
        "--dedup", "none",
        "--text-col", "body",
        "--scrub-pii",
    ])
    assert m["n_redactions"] == 1
    out = {r.doc_id: r for r in
           spark.read.parquet(os.path.join(save_dir, "docs")).collect()}
    assert "<EMAIL>" in out[1].body
    assert out[1].text == "unrelated text col 1"
    assert out[2].body == "no private data in this body here"
    assert out[2].text == "unrelated text col 2"


def test_dataprep_cli_line_dedup_stage(spark, tmp_path):
    """--line-dedup-min-df strips corpus boilerplate before dedup and
    reports the drop count; passenger columns survive."""
    sys.path.insert(0, SCRIPTS)
    try:
        import run_dataprep
    finally:
        sys.path.remove(SCRIPTS)

    docs_path = str(tmp_path / "docs4.parquet")
    rows = [(i, f"COOKIE BANNER\nbody number {i} here\nFOOTER", "en")
            for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(docs_path)

    save_dir = str(tmp_path / "out4")
    m = run_dataprep.main([
        "--input", docs_path,
        "--save-dir", save_dir,
        "--dedup", "none",
        "--line-dedup-min-df", "3",
    ])
    assert m["n_hot_lines_dropped"] == 10  # 2 hot lines x 5 docs
    out = {r.doc_id: r for r in
           spark.read.parquet(os.path.join(save_dir, "docs")).collect()}
    assert len(out) == 5
    assert all("COOKIE" not in r.text and "FOOTER" not in r.text
               for r in out.values())
    assert all(r.lang == "en" for r in out.values())


# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
pytestmark = pytest.mark.slow
