"""Triple-level knowledge fusion for KG construction.

The extraction pipeline emits one (subj, pred, obj, prob) assertion per
MENTION; a knowledge graph wants one edge per FACT with a confidence
that grows with independent supporting evidence. ``fuse_triples``
collapses repeated assertions with the classic noisy-or combiner
(Knowledge Vault-style fusion: P(fact) = 1 - prod(1 - p_i) under
independent extractors/mentions), plus the provenance aggregates a
downstream consumer filters on (mention count, distinct-source count,
strongest single mention, earliest source).

The reference repo stops at per-mention triples (its `run_infer.py`
writes raw Taskflow results); fusion is the beyond-reference KG step,
built from public fusion literature only.

Scale shape: ONE shuffle on the triple key; every aggregate is
map-side combinable (sum/count/min/max — count distinct is Spark's
two-phase partial aggregation). A hot fact (millions of identical
mentions) partial-aggregates before the exchange, so skew in fact
popularity does not skew the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def fuse_triples(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    prob_col: str = "prob",
    doc_col: str = "doc_id",
    eps: float = 1e-12,
) -> DataFrame:
    """-> one row per (subj, pred, obj):

    - ``fused_prob``: noisy-or 1 - prod(1 - p_i), computed as
      ``1 - exp(sum(ln(max(eps, 1 - p))))`` so it stays a combinable
      SUM instead of a non-associative product fold; ``eps`` guards
      ln(0) when a mention arrives with p = 1.0, and the result is
      clamped to ``max_prob`` from below so the eps clamp can never
      push it under the strongest single mention.
    - ``n_mentions`` / ``n_docs``: total and distinct-source support.
    - ``max_prob``: strongest single mention (noisy-or is monotone in
      every input, so fused_prob >= max_prob exactly — a sanity
      invariant tests pin).
    - ``first_doc``: smallest source id, a deterministic provenance
      anchor.

    NULL-probability mentions are EXCLUDED before aggregation (from
    fused_prob AND the support counts): the scorer's tokenizer-crash
    quarantine emits sentinel rows with NULL probability, and
    ``greatest(eps, 1 - NULL)`` would otherwise read each one as
    near-certain evidence (ln(eps) drives the product to ~0, fusing
    the fact to ~1.0). A fact whose every mention is NULL vanishes
    from the output entirely.
    """
    supported = triples.filter(F.col(prob_col).isNotNull())
    one_minus = F.greatest(F.lit(eps), F.lit(1.0) - F.col(prob_col))
    agg = supported.groupBy(subj_col, pred_col, obj_col).agg(
        F.sum(F.log(one_minus)).alias("_log_miss"),
        F.count("*").alias("n_mentions"),
        F.countDistinct(doc_col).alias("n_docs"),
        F.max(prob_col).alias("max_prob"),
        F.min(doc_col).alias("first_doc"),
    )
    return agg.select(
        subj_col,
        pred_col,
        obj_col,
        F.greatest(
            F.lit(1.0) - F.exp(F.col("_log_miss")), F.col("max_prob")
        ).alias("fused_prob"),
        "n_mentions",
        "n_docs",
        "max_prob",
        "first_doc",
    )


def top_k_objects(
    fused: DataFrame,
    k: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    score_col: str = "fused_prob",
) -> DataFrame:
    """Top-k candidate objects per (subj, pred) by fused confidence —
    the slot-filling view of the fused graph (e.g. the k best values
    for 醫療費用 per case). Deterministic: ties break on the object
    value itself, so reruns and retries rank identically.

    Scale shape: one window over the already-fused (small-per-key)
    table; the rank prunes before any downstream join.
    """
    w = Window.partitionBy(subj_col, pred_col).orderBy(
        F.col(score_col).desc(), F.col(obj_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
