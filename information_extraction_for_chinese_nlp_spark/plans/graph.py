"""Graph materialization: extraction edges -> canonical vertex + edge
tables (the reference's D6 wide result table, re-expressed as a KG;
SURVEY.md §1 D6, north_star tail).

Canonicalization layers:
1. value normalization (F4): surface forms with the same normalized
   money value and predicate collapse ("98,532元" == "98532元" == 98532);
2. similarity linking for non-normalizable surfaces: char-bigram
   Jaccard pairs from MinHash-LSH banded buckets (exact-verified,
   never all-pairs), closed under connected components (min-label
   propagation);
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


# the linker's default banding budget — shared by the batch linker and
# streaming/stream.stream_build_kg so the two faces generate identical
# candidate sets (same discipline as fusion's log_miss_expr)
LINK_N_BANDS, LINK_ROWS_PER_BAND = 8, 1


def band_signatures(n_bands: int = LINK_N_BANDS,
                    rows_per_band: int = LINK_ROWS_PER_BAND):
    """The MinHash band-signature projection over a ``grams`` column —
    ONE array expression (per-seed ``array_min`` over md5'd grams, bands
    joined with '|'), no explode and no shuffle. Shared by
    ``raw_match_pairs`` and the streaming linker: a change to the seed
    string, band count, or join format lands on both faces at once."""

    def seed_min(s: int):
        return F.array_min(
            F.transform(
                F.col("grams"), lambda g: F.md5(F.concat_ws("#", g, F.lit(s)))
            )
        )

    return F.array(
        *[
            F.array_join(
                F.array(
                    *[
                        seed_min(b * rows_per_band + r)
                        for r in range(rows_per_band)
                    ]
                ),
                "|",
            )
            for b in range(n_bands)
        ]
    )


def _distinct_raw_surfaces(normed: DataFrame) -> DataFrame:
    return (
        normed.filter(F.col("obj_norm") == "nan")
        .select("pred", "obj", "entity_key")
        .distinct()
        .withColumn("grams", char_ngrams(F.col("obj"), 2))
    )


def raw_match_pairs(
    normed: DataFrame,
    threshold: float = 0.6,
    n_bands: int = 8,
    rows_per_band: int = 1,
    max_bucket: int | None = 10_000,
    observation=None,
) -> DataFrame:
    """Similarity pairs among non-normalizable surfaces — MinHash-LSH
    banded candidate generation, exact-Jaccard verified.

    The pred-blocked self-join this replaces was O(n²) candidates per
    predicate: at scale the nan-surface set is the whole long tail of
    OCR/colloquial junk, and with only 3 predicates "block by pred" is
    barely blocking. Here candidates form only inside (pred, band)
    buckets: each surface's char-bigram set gets an n_bands×rows_per_band
    MinHash signature computed as a pure PROJECTION (`array_min` over
    the gram array per seed — surfaces are short, so no token explode
    and no shuffle), then ONE aggregation chain groups by
    (pred, band_id, band) and expands ordered pairs JVM-side
    (``dedup._bucket_pairs`` — a self-join would re-run the upstream
    pipeline for its second alias, measured). Every candidate is
    verified with the exact bigram Jaccard, so precision is identical to
    the quadratic version; recall for a pair at Jaccard s is
    1-(1-s^r)^b (defaults b=8, r=1: ≥0.9993 at s=0.6).

    ``max_bucket`` caps degenerate buckets (e.g. thousands of identical
    junk surfaces) exactly like the dedup operators — default ON,
    ``None`` = explicit opt-out, drops counted via ``observation``
    (see ``dedup.minhash_lsh_pairs``).
    """
    from ..operators.dedup import _bucket_pairs, _cap_buckets

    raw = _distinct_raw_surfaces(normed).filter(F.size("grams") > 0)
    bands = band_signatures(n_bands, rows_per_band)
    banded = raw.select(
        "pred", "entity_key", "grams",
        F.posexplode(bands).alias("band_id", "band"),
    )
    buckets = (
        banded.groupBy("pred", "band_id", "band")
        .agg(F.array_sort(F.collect_list(F.struct("entity_key", "grams"))).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    buckets = _cap_buckets(buckets, max_bucket, observation)
    cand = buckets.select(F.explode(_bucket_pairs(F.col("ids"))).alias("p")).select(
        F.col("p.doc_a.entity_key").alias("src"),
        F.col("p.doc_b.entity_key").alias("dst"),
        jaccard(F.col("p.doc_a.grams"), F.col("p.doc_b.grams")).alias("sim"),
    )
    return cand.filter(F.col("sim") >= threshold).select("src", "dst").distinct()


def raw_match_pairs_exact(normed: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Recall-1.0 baseline: the pred-blocked all-pairs join. QUADRATIC
    per predicate — kept only as the oracle for the banded generator's
    parity/recall tests; never use in the pipeline at scale."""
    raw = _distinct_raw_surfaces(normed)
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


def build_graph(edges: DataFrame, link_threshold: float = 0.6,
                link_max_bucket: int | None = 10_000,
                checkpoint: bool = False):
    """-> (vertices, canonical_edges).

    vertices: (entity_id, canonical_text, type, n_mentions)
    canonical_edges: (subj, pred, entity_id, obj, obj_norm, prob,
                      doc_id, start, end)

    ``link_max_bucket`` caps degenerate linker buckets (thousands of
    identical junk surfaces) — default ON like the dedup caps,
    ``None`` = explicit opt-out.

    ``checkpoint=True`` puts a lazy ``localCheckpoint`` under the
    canonicalized join (the subtree BOTH outputs consume), so a caller
    materializing vertices AND edges — ``build_kg``, or a job writing
    both tables — runs the linker + CC once instead of once per
    output. Default False keeps gate plans pure (same discipline as
    ``dedup_pipeline``).
    """
    normed = normalize_objects(edges)
    if checkpoint:
        # normed is consumed twice (the linker's distinct-surface pass
        # and the canonicalized join) and carries a pandas-UDF column
        # (obj_norm) — without a boundary the ArrowEvalPython
        # normalization runs once per consumer. Same lazy-checkpoint
        # discipline (and the same memory class) as the `keyed`
        # boundary below; gate plans (checkpoint=False) stay pure.
        normed = normed.localCheckpoint(eager=False)

    pairs = raw_match_pairs(normed, link_threshold, max_bucket=link_max_bucket)
    comps = connected_components(pairs, src="src", dst="dst")

    keyed = normed.join(
        comps.withColumnRenamed("node", "entity_key"), on="entity_key", how="left"
    ).withColumn("canon_key", F.coalesce("component", "entity_key"))
    if checkpoint:
        keyed = keyed.localCheckpoint(eager=False)

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


def build_kg(edges: DataFrame, link_threshold: float = 0.6,
             link_max_bucket: int | None = 10_000,
             checkpoint: bool = True):
    """The full KG-construction tail as ONE composed job:
    extraction edges -> value normalization -> similarity linking ->
    connected-components canonicalization (``build_graph``) ->
    triple-level noisy-or fusion (``operators.fusion.fuse_triples``)
    over the CANONICAL entity ids.

    -> (vertices, fused_edges) where fused_edges has one row per FACT
    (subj, pred, entity_id) with (fused_prob, n_mentions, n_docs,
    max_prob, first_doc, canonical_text): fusing AFTER canonicalization
    is the point — surface variants of the same value ("98,532元",
    "98532元", "九万八千五百三十二元") first collapse into one entity,
    THEN their mentions combine as independent evidence. Fusing raw
    objects would fragment a fact's support across spellings.

    Scale shape: build_graph's banded linker + CC (never all-pairs),
    one extra shuffle on the fact key (map-side combinable aggregates),
    and the canonical_text enrichment joins the already-aggregated
    fact table against the vertex table on entity_id — both post-agg,
    orders smaller than the mention stream. ``checkpoint`` defaults
    True here (both outputs are consumed by construction).
    """
    from ..operators.fusion import fuse_triples

    vertices, canonical = build_graph(
        edges, link_threshold, link_max_bucket, checkpoint=checkpoint
    )
    fused = fuse_triples(
        canonical, subj_col="subj", pred_col="pred",
        obj_col="entity_id", prob_col="prob", doc_col="doc_id",
    )
    fused_edges = fused.join(
        vertices.select("entity_id", "canonical_text"), on="entity_id"
    ).select(
        "subj", "pred", "entity_id", "canonical_text", "fused_prob",
        "n_mentions", "n_docs", "max_prob", "first_doc",
    )
    return vertices, fused_edges
