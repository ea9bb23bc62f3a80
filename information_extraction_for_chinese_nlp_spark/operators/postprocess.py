"""Select strategies (M4 dispatch) + key projection (P3).

The reference dispatches ``all`` / ``max`` / ``threshold`` postprocess
strategies by name (run_infer.py:26,61-83). Here each strategy is a plain
DataFrame transform over the exploded extraction frame
(doc_id, prompt, span_text, start, end, probability); the registry dict
plays the role of the string dispatch.

- all: identity (run_infer.py:70-71)
- max: single highest-probability span per (doc, prompt) via ``max_by``
  — one shuffle with partial aggregation, no window needed
  (run_infer.py:61-63)
- threshold: strictly greater than t, default 0.5 (run_infer.py:65-67;
  we standardize on the inference path's strict ``>`` — the tools path's
  ``>=`` at tools/convert_to_labelstudio.py:87 is a reference
  inconsistency, noted in SURVEY.md P5)
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strategy_all(extractions: DataFrame, **_) -> DataFrame:
    return extractions


def strategy_threshold(extractions: DataFrame, threshold: float = 0.5, **_) -> DataFrame:
    return extractions.filter(F.col("probability") > F.lit(threshold))


def strategy_max(extractions: DataFrame, **_) -> DataFrame:
    """Top-1 span per (doc_id, prompt), deterministic tie-break.

    ``max_by`` over a struct ordered (probability, start, end) so equal
    probabilities break ties stably — the reference's ``sorted(...)[0]``
    is stable on input order; we need an order-free rule at scale.
    """
    payload = F.struct("span_text", "start", "end", "probability")
    key = F.struct("probability", F.col("start"), F.col("end"))
    picked = extractions.groupBy("doc_id", "prompt").agg(
        F.max_by(payload, key).alias("_best")
    )
    return picked.select(
        "doc_id",
        "prompt",
        F.col("_best.span_text").alias("span_text"),
        F.col("_best.start").alias("start"),
        F.col("_best.end").alias("end"),
        F.col("_best.probability").alias("probability"),
    )


def strategy_threshold_inclusive(extractions: DataFrame, threshold: float = 0.5,
                                 **_) -> DataFrame:
    """P5 — the tools path's >= variant (tools/convert_to_labelstudio.py:87).
    Kept as a separate named strategy so the reference's boundary
    inconsistency stays visible instead of silently standardized."""
    return extractions.filter(F.col("probability") >= F.lit(threshold))


STRATEGIES: Dict[str, Callable[..., DataFrame]] = {
    "all": strategy_all,
    "max": strategy_max,
    "threshold": strategy_threshold,
    "threshold_inclusive": strategy_threshold_inclusive,
}


def apply_strategy(extractions: DataFrame, strategy: str = "threshold",
                   threshold: float = 0.5) -> DataFrame:
    try:
        fn = STRATEGIES[strategy]
    except KeyError:
        raise ValueError(
            f"unknown strategy {strategy!r}; register it in STRATEGIES"
        ) from None
    return fn(extractions, threshold=threshold)


def select_keys(extractions: DataFrame,
                keys: Sequence[str] = ("text", "start", "end", "probability"),
                id_cols: Sequence[str] = ("doc_id", "prompt")) -> DataFrame:
    """P3 — project the requested span fields (reference run_infer.py:31-38).

    `text` maps to the exploded frame's `span_text` column.
    """
    mapping = {"text": "span_text"}
    cols = list(id_cols) + [mapping.get(k, k) for k in keys]
    return extractions.select(*cols)
