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


def test_threshold_sweep_matches_per_threshold_eval(spark):
    """The one-pass sweep must equal running eval_counts once per
    threshold with strategy_threshold filtering (strict >), including
    grid points where nothing survives."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.evaluation import (
        eval_counts,
        threshold_sweep,
    )

    pred = spark.createDataFrame(
        [("d1", "a", 0, 3, 0.9), ("d1", "a", 5, 8, 0.4), ("d2", "b", 1, 4, 0.6)],
        "doc_id string, prompt string, start int, end int, probability double",
    )
    gold = spark.createDataFrame(
        [("d1", "a", 0, 3), ("d2", "b", 1, 4), ("d2", "b", 9, 12)],
        "doc_id string, prompt string, start int, end int",
    )
    grid = (0.3, 0.5, 0.95)
    swept = {r["threshold"]: r for r in threshold_sweep(pred, gold, grid).collect()}
    assert set(swept) == set(grid)
    for t in grid:
        filt = pred.filter(F.col("probability") > t)
        row = eval_counts(filt, gold, ("doc_id", "prompt", "start", "end")).first()
        assert swept[t]["num_correct"] == row["num_correct"]
        assert swept[t]["num_infer"] == row["num_infer"]
        assert swept[t]["precision_"] == row["precision_"]
        assert swept[t]["recall_"] == row["recall_"]
    assert swept[0.95]["num_infer"] == 0 and swept[0.95]["f1"] == 0.0
