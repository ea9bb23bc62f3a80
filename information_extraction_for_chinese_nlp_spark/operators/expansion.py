"""R1 — prompt expansion and gold-span routing.

The reference emits one model-input record per (document × entity type),
routing each gold span to the record whose prompt equals the span's
label (reference utils/json_utils.py:31-68). Here: a literal-array
explode (narrow, no shuffle) plus a filtered spans projection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_prompts(documents: DataFrame, prompts: Sequence[str],
                   spans_col: str | None = None) -> DataFrame:
    """documents -> one row per (doc, prompt); gold spans routed by label.

    Output adds `prompt` and, when ``spans_col`` is given, `result_list`
    (array<struct<text,start,end>>) holding only the spans whose label
    matches the row's prompt, ordered by start (T1).
    """
    out = documents.withColumn(
        "prompt", F.explode(F.array(*[F.lit(p) for p in prompts]))
    )
    if spans_col is not None:
        routed = F.filter(F.col(spans_col), lambda s: s["label"] == F.col("prompt"))
        ordered = F.array_sort(
            F.transform(routed, lambda s: F.struct(
                s["start"].alias("start"), s["end"].alias("end"), s["text"].alias("text")
            ))
        )
        out = out.withColumn(
            "result_list",
            F.transform(ordered, lambda s: F.struct(
                s["text"].alias("text"), s["start"].alias("start"), s["end"].alias("end")
            )),
        )
    return out
