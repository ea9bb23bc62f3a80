"""S1/S2/S4 scans, K1/K3 sinks, R5 Label Studio export, T3 shuffle,
P5 inclusive threshold."""

import json

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.convert import (
    parse_labelstudio,
    shuffle_rows,
    to_labelstudio,
)
from information_extraction_for_chinese_nlp_spark.operators.postprocess import (
    apply_strategy,
)
from information_extraction_for_chinese_nlp_spark.sources.catalog import (
    read_csv_table,
    read_json_arrays,
    read_text_lines,
    write_csv,
    write_jsonl,
)


def test_text_scan_trims_lines(spark, tmp_path):
    p = tmp_path / "docs.txt"
    p.write_text("  原告請求98,532元  \nsecond line\n", encoding="utf-8")
    rows = read_text_lines(spark, str(p)).collect()
    assert [r.text for r in rows] == ["原告請求98,532元", "second line"]


def test_json_array_scan(spark, tmp_path):
    p = tmp_path / "arr.json"
    p.write_text(json.dumps([{"a": 1}, {"a": 2}]), encoding="utf-8")
    assert sorted(r.a for r in read_json_arrays(spark, str(p)).collect()) == [1, 2]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "98,532元")], "id int, money string")
    out = str(tmp_path / "csv")
    write_csv(df, out)
    back = read_csv_table(spark, out)
    assert back.count() == 1
    assert back.first().money == "98,532元"


def test_jsonl_sink_keeps_cjk(spark, tmp_path):
    df = spark.createDataFrame([("醫療費用",)], "pred string")
    out = str(tmp_path / "jl")
    write_jsonl(df, out)
    raw = "".join(
        p.read_text(encoding="utf-8")
        for p in (tmp_path / "jl").glob("part-*")
    )
    assert "醫療費用" in raw  # not \u-escaped


def test_labelstudio_export_roundtrips(spark):
    ex = spark.createDataFrame(
        [
            ("d1", "醫療費用", "98,532元", 4, 11, 0.9, "xx支出98,532元yy"),
            ("d1", "薪資收入", "700元", 13, 17, 0.8, "xx支出98,532元yy"),
        ],
        "doc_id string, prompt string, span_text string, start int, end int, "
        "probability double, text string",
    )
    ls = to_labelstudio(ex)
    docs, bad = parse_labelstudio(ls)
    assert bad.count() == 0
    row = docs.first()
    assert row.doc_id == "d1"
    labels = sorted((s["start"], s["end"], s["text"], s["label"]) for s in row.spans)
    assert labels == [(4, 11, "98,532元", "醫療費用"), (13, 17, "700元", "薪資收入")]


def test_shuffle_rows_is_seeded_permutation(spark):
    df = spark.range(100).repartition(4)
    a = [r.id for r in shuffle_rows(df, seed=7).collect()]
    b = [r.id for r in shuffle_rows(df, seed=7).collect()]
    assert a == b
    assert sorted(a) == list(range(100))
    assert a != list(range(100))


def test_threshold_inclusive_vs_strict(spark):
    df = spark.createDataFrame(
        [("d", "p", "x", 0, 1, 0.5)],
        "doc_id string, prompt string, span_text string, start int, end int, "
        "probability double",
    )
    assert apply_strategy(df, "threshold", 0.5).count() == 0
    assert apply_strategy(df, "threshold_inclusive", 0.5).count() == 1
