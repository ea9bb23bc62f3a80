"""Graph materialization: extraction edges -> canonical vertex + edge
tables (the reference's D6 wide result table, re-expressed as a KG;
SURVEY.md §1 D6, north_star tail).

Canonicalization layers:
1. value normalization (F4): surface forms with the same normalized
   money value and predicate collapse ("98,532元" == "98532元" == 98532);
2. similarity linking for non-normalizable surfaces: char-bigram
   Jaccard pairs inside the predicate block, closed under connected
   components (min-label propagation);
3. vertex identity = md5(pred # canonical key); canonical_text = the
   most frequent surface form (max_by count, tie-break lexicographic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import normalize_money_udf
from ..operators.components import connected_components
from ..operators.linking import char_ngrams, jaccard


def normalize_objects(edges: DataFrame) -> DataFrame:
    """Add obj_norm (normalized value or 'nan') and the entity key."""
    normed = edges.withColumn("obj_norm", normalize_money_udf(F.col("obj")))
    key = F.when(
        F.col("obj_norm") != "nan", F.concat_ws("#", "pred", "obj_norm")
    ).otherwise(F.concat_ws("#", "pred", F.lit("raw"), "obj"))
    return normed.withColumn("entity_key", key)


def raw_match_pairs(normed: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Similarity pairs among non-normalizable surfaces, blocked by pred.

    The candidate join is bounded: distinct raw surfaces per predicate
    are few relative to edges; at scale add an LSH band on the bigram
    set before the pair join (same shape as dedup.minhash_lsh_pairs).
    """
    raw = (
        normed.filter(F.col("obj_norm") == "nan")
        .select("pred", "obj", "entity_key")
        .distinct()
        .withColumn("grams", char_ngrams(F.col("obj"), 2))
    )
    a, b = raw.alias("a"), raw.alias("b")
    return (
        a.join(b, on="pred")
        .filter(F.col("a.entity_key") < F.col("b.entity_key"))
        .withColumn("sim", jaccard(F.col("a.grams"), F.col("b.grams")))
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("a.entity_key").alias("src"), F.col("b.entity_key").alias("dst")
        )
    )


def build_graph(edges: DataFrame, link_threshold: float = 0.6):
    """-> (vertices, canonical_edges).

    vertices: (entity_id, canonical_text, type, n_mentions)
    canonical_edges: (subj, pred, entity_id, obj, obj_norm, prob,
                      doc_id, start, end)
    """
    normed = normalize_objects(edges)

    pairs = raw_match_pairs(normed, link_threshold)
    comps = connected_components(pairs, src="src", dst="dst")

    keyed = normed.join(
        comps.withColumnRenamed("node", "entity_key"), on="entity_key", how="left"
    ).withColumn("canon_key", F.coalesce("component", "entity_key"))

    surface_counts = keyed.groupBy("canon_key", "pred", "obj").agg(
        F.count("*").alias("n")
    )
    vertices = (
        surface_counts.groupBy("canon_key")
        .agg(
            F.max_by(
                F.struct("obj", "pred"), F.struct(F.col("n"), F.col("obj"))
            ).alias("_best"),
            F.sum("n").alias("n_mentions"),
        )
        .select(
            F.md5("canon_key").alias("entity_id"),
            F.col("_best.obj").alias("canonical_text"),
            F.col("_best.pred").alias("type"),
            "n_mentions",
            "canon_key",
        )
    )

    canonical_edges = keyed.select(
        "subj",
        "pred",
        F.md5("canon_key").alias("entity_id"),
        "obj",
        "obj_norm",
        "prob",
        "doc_id",
        "start",
        "end",
    )
    return vertices.drop("canon_key"), canonical_edges
