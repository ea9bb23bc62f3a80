"""Entity linking: blocking -> broadcast candidate join -> similarity ->
best-match selection (SURVEY.md §2.8; the KG tail of north_star).

The alias dictionary is small by construction (it's curated), so the
candidate join broadcasts it — no shuffle of the mention table, which is
the 100 TB side. Blocking keys bound the candidate set per mention;
scoring is char-n-gram Jaccard (set expressions, JVM-side) with an
optional TF-IDF cosine variant for longer surface forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import normalize_money_udf


def char_ngrams(col, n: int = 2):
    """array of char n-grams of a string column (JVM-side, no UDF)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(col, i, n))
    )


def jaccard(a, b):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def block_key_for_mention(pred_col, obj_col):
    """Blocking key: entity type + normalized money value (the reference's
    obj normalization, F4, doubles as the blocking function)."""
    return F.concat_ws("#", pred_col, normalize_money_udf(obj_col))


def link_entities(
    mentions: DataFrame,
    alias_dict: DataFrame,
    threshold: float = 0.5,
    ngram: int = 2,
) -> DataFrame:
    """mentions(mention_id, pred, obj) × alias_dict(alias, canonical_id,
    block_key) -> (mention_id, pred, obj, canonical_id, score).

    Unlinked mentions are kept with NULL canonical_id (left join), so the
    caller can mint new vertex ids for them.
    """
    m = mentions.withColumn("block_key", block_key_for_mention(F.col("pred"), F.col("obj")))
    cand = m.join(
        F.broadcast(alias_dict), on="block_key", how="left"
    ).withColumn(
        "score",
        jaccard(char_ngrams(F.col("obj"), ngram), char_ngrams(F.col("alias"), ngram)),
    )
    scored = cand.withColumn(
        "canonical_id",
        F.when(F.col("score") >= threshold, F.col("canonical_id")),
    )
    best = F.max_by(
        F.struct("canonical_id", "score", "alias"),
        F.struct(F.col("score"), F.col("canonical_id")),
    )
    return (
        scored.groupBy("mention_id", "pred", "obj")
        .agg(best.alias("_b"))
        .select(
            "mention_id",
            "pred",
            "obj",
            F.col("_b.canonical_id").alias("canonical_id"),
            F.round(F.col("_b.score"), 6).alias("score"),
        )
    )
