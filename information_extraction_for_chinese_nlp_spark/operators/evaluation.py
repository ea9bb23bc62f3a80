"""A2/A3 — span P/R/F1 as exact-match joins (reference run_eval.py:60-114).

The reference streams batches through PaddleNLP's SpanEvaluator,
accumulating (num_correct, num_infer, num_label). In Spark the same
metric is one inner join plus three counts — partial aggregation gives
the reference's partial+final accumulation for free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eval_counts(
    pred: DataFrame,
    gold: DataFrame,
    keys: Sequence[str],
    group_col: str | None = None,
) -> DataFrame:
    """Exact-match evaluation.

    pred/gold must both carry `keys` (the span identity, e.g.
    doc_id/prompt/start/end) and, if grouped, `group_col`.
    Returns per-group (num_correct, num_infer, num_label, precision_,
    recall_); group '%total%' semantics are left to the caller (union).
    """
    group = [group_col] if group_col else []

    correct = (
        pred.join(gold.select(*keys).distinct(), on=list(keys), how="inner")
        .groupBy(*group)
        .agg(F.count("*").alias("num_correct"))
    )
    infer = pred.groupBy(*group).agg(F.count("*").alias("num_infer"))
    label = gold.groupBy(*group).agg(F.count("*").alias("num_label"))

    if group:
        out = (
            infer.join(label, on=group, how="full")
            .join(correct, on=group, how="left")
        )
    else:
        out = infer.crossJoin(label).crossJoin(correct)

    out = out.na.fill({"num_correct": 0, "num_infer": 0, "num_label": 0})
    # 0/0 -> 0.0, matching SpanEvaluator.accumulate (a class with no
    # predictions reports precision 0.0, not NULL/NaN). try_divide keeps
    # ANSI mode (Spark 4 default) from raising DIVIDE_BY_ZERO.
    precision = F.coalesce(
        F.round(F.try_divide("num_correct", F.col("num_infer").cast("double")), 6),
        F.lit(0.0),
    )
    recall = F.coalesce(
        F.round(F.try_divide("num_correct", F.col("num_label").cast("double")), 6),
        F.lit(0.0),
    )
    return out.select(
        *group,
        "num_correct",
        "num_infer",
        "num_label",
        precision.alias("precision_"),
        recall.alias("recall_"),
    )


def span_f1(pred: DataFrame, gold: DataFrame,
            keys: Sequence[str] = ("doc_id", "prompt", "start", "end"),
            group_col: str | None = "prompt") -> DataFrame:
    """Convenience wrapper with F1 for the triple-extraction eval
    (SpanEvaluator parity: P = C/I, R = C/L, F1 = 2PR/(P+R))."""
    counts = eval_counts(pred, gold, list(keys), group_col)
    p = F.col("num_correct") / F.col("num_infer")
    r = F.col("num_correct") / F.col("num_label")
    return counts.withColumn(
        "f1",
        F.when(F.col("num_correct") == 0, F.lit(0.0)).otherwise(
            F.round(2 * p * r / (p + r), 6)
        ),
    )
