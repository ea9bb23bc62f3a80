"""A2/A3 eval-count edge cases."""

from information_extraction_for_chinese_nlp_spark.operators.evaluation import (
    eval_counts,
    span_f1,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, prompt string, start int, end int")


def test_zero_prediction_class_reports_zero_not_null(spark):
    pred = _df(spark, [("d1", "A", 0, 3)])
    gold = _df(spark, [("d1", "A", 0, 3), ("d1", "B", 5, 9)])
    out = (
        eval_counts(pred, gold, ["doc_id", "prompt", "start", "end"], "prompt")
        .toPandas()
        .set_index("prompt")
    )
    # class B: no predictions -> precision 0.0 (SpanEvaluator semantics),
    # never NULL/NaN
    assert out.loc["B", "num_infer"] == 0
    assert out.loc["B", "precision_"] == 0.0
    assert out.loc["B", "recall_"] == 0.0
    assert out.loc["A", "precision_"] == 1.0


def test_f1_zero_when_no_correct(spark):
    pred = _df(spark, [("d1", "A", 0, 3)])
    gold = _df(spark, [("d1", "A", 4, 8)])
    row = span_f1(pred, gold, group_col=None).toPandas().iloc[0]
    assert row.num_correct == 0
    assert row.f1 == 0.0
