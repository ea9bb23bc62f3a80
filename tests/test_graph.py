"""Graph materialization: value canonicalization, similarity merge,
vertex/edge consistency."""

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.plans.graph import (
    build_graph,
    normalize_objects,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, prob double, doc_id string, "
        "start int, end int",
    )


def test_value_canonicalization_merges_surfaces(spark):
    edges = _edges(
        spark,
        [
            ("c1", "醫療費用", "98,532元", 0.9, "c1", 0, 7),
            ("c2", "醫療費用", "98532元", 0.8, "c2", 3, 9),
            ("c3", "醫療費用", "九萬八千五百三十二元", 0.7, "c3", 1, 11),
            ("c4", "薪資收入", "98,532元", 0.9, "c4", 0, 7),  # other pred
        ],
    )
    vertices, cedges = build_graph(edges)
    v = vertices.toPandas()
    # three identical-value surfaces under the same pred collapse to one
    med = v[v.type == "醫療費用"]
    assert len(med) == 1
    assert med.iloc[0].n_mentions == 3
    # different predicate stays a separate entity even with equal value
    assert len(v) == 2
    # every canonical edge points at an existing vertex
    ce = cedges.toPandas()
    assert set(ce.entity_id) <= set(v.entity_id)
    assert len(ce) == 4


def test_similarity_merge_for_unparseable(spark):
    edges = _edges(
        spark,
        [
            ("c1", "醫療費用", "unknown-alpha", 0.9, "c1", 0, 13),
            ("c2", "醫療費用", "unknown-alphx", 0.8, "c2", 0, 13),
            ("c3", "醫療費用", "totally-different", 0.7, "c3", 0, 17),
        ],
    )
    normed = normalize_objects(edges)
    assert normed.filter(F.col("obj_norm") != "nan").count() == 0
    vertices, cedges = build_graph(edges, link_threshold=0.6)
    v = vertices.toPandas()
    # the two near-identical surfaces merge; the third stays separate
    assert len(v) == 2
    assert sorted(v.n_mentions.tolist()) == [1, 2]


def test_canonical_text_is_most_frequent_surface(spark):
    edges = _edges(
        spark,
        [
            ("c1", "醫療費用", "1,680元", 0.9, "c1", 0, 6),
            ("c2", "醫療費用", "1,680元", 0.9, "c2", 0, 6),
            ("c3", "醫療費用", "1680元", 0.9, "c3", 0, 5),
        ],
    )
    vertices, _ = build_graph(edges)
    v = vertices.toPandas()
    assert len(v) == 1
    assert v.iloc[0].canonical_text == "1,680元"
    assert v.iloc[0].n_mentions == 3
