"""Turn assembly — transcripts to one document per conversation.

The reference reads one pre-assembled document per line
(run_infer.py:123-125). Our input is the transcripts table
(conv_id, turn_idx, role, text, tool, ts); a "document" is the
concatenation of a conversation's turn texts under stable
(conv_id, turn_idx) ordering — the per-row invariant from
BASELINE.json's input_hint.

Implementation: one shuffle on conv_id via
``groupBy(conv_id).agg(array_sort(collect_list(struct(turn_idx, text))))``.
``array_sort`` on the struct gives a total order by turn_idx inside the
aggregation buffer, so no window + second shuffle is needed. Partial
aggregation (map-side combine) applies; AQE skew-split plus optional
salting (see ``assemble_turns_salted``) covers pathological
million-turn conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_turns(transcripts: DataFrame, sep: str = "") -> DataFrame:
    """-> (doc_id, text, n_turns, first_ts). doc_id = conv_id."""
    ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
    return (
        transcripts.groupBy(F.col("conv_id").alias("doc_id"))
        .agg(
            F.array_join(
                F.transform(ordered, lambda s: F.coalesce(s["text"], F.lit(""))), sep
            ).alias("text"),
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
        )
    )


def assemble_turns_salted(
    transcripts: DataFrame, n_salts: int = 16, sep: str = ""
) -> DataFrame:
    """Two-level aggregation for skewed conv_id distributions.

    Level 1 aggregates (conv_id, turn_idx % n_salts) sub-groups — spreading
    a single hot conversation over ``n_salts`` reducers — level 2 merges
    the ordered sub-arrays. Both levels keep turn order via sorted structs,
    so the per-turn text equality invariant is preserved exactly.
    """
    salted = transcripts.withColumn("_salt", F.col("turn_idx") % n_salts)
    level1 = salted.groupBy("conv_id", "_salt").agg(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("_part"),
        F.count("*").alias("_n"),
        F.min("ts").alias("_ts"),
    )
    merged = level1.groupBy(F.col("conv_id").alias("doc_id")).agg(
        F.array_sort(F.flatten(F.collect_list("_part"))).alias("_turns"),
        F.sum("_n").alias("n_turns"),
        F.min("_ts").alias("first_ts"),
    )
    return merged.select(
        "doc_id",
        F.array_join(
            F.transform("_turns", lambda s: F.coalesce(s["text"], F.lit(""))), sep
        ).alias("text"),
        "n_turns",
        "first_ts",
    )
