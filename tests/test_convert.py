"""E2 conversion lifecycle: Label Studio -> regularize -> model input ->
split (reference run_convert.py semantics)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark import ENTITY_TYPES
from information_extraction_for_chinese_nlp_spark.operators.convert import (
    parse_labelstudio,
    regularize_documents,
    split_dataset,
    to_model_input,
)


def _labelstudio_df(spark):
    def rec(i, text, results):
        return Row(
            id=i,
            data=Row(text=text),
            annotations=[Row(result=results)],
        )

    def span(start, end, text, label, typ="labels"):
        return Row(
            type=typ, value=Row(start=start, end=end, text=text, labels=[label])
        )

    text1 = "原告 支出醫療費用98,532元\n並請求慰撫金"
    # span over "98,532元" in raw coords: index of '9' = 12 ... verify below
    s = text1.index("98,532元")
    rows = [
        rec(0, text1, [span(s, s + 7, "98,532元", "醫療費用")]),
        rec(1, "無相關內容", []),
        rec(2, "relation doc", [span(0, 3, "rel", "醫療費用", typ="relation")]),
    ]
    return spark.createDataFrame(rows)


def test_parse_and_quarantine(spark):
    docs, bad = parse_labelstudio(_labelstudio_df(spark))
    assert bad.count() == 1
    assert bad.first().bad_type == "relation"
    got = {r.doc_id for r in docs.select("doc_id").collect()}
    assert got == {"0", "1"}


def test_null_type_annotation_quarantines(spark):
    from pyspark.sql import Row

    schema = (
        "id long, data struct<text:string>, annotations array<struct<"
        "result:array<struct<type:string,value:struct<"
        "start:int,end:int,text:string,labels:array<string>>>>>>"
    )
    rec = (
        9,
        ("null type doc",),
        [([(None, (0, 3, "nul", ["醫療費用"]))],)],
    )
    docs, bad = parse_labelstudio(spark.createDataFrame([rec], schema))
    # NULL type must route to quarantine, not silently vanish
    assert bad.count() == 1
    assert bad.first().bad_type is None
    assert docs.filter("doc_id = '9'").count() == 0


def test_regularize_preserves_spans(spark):
    docs, _ = parse_labelstudio(_labelstudio_df(spark))
    reg = regularize_documents(docs).toPandas().set_index("doc_id")
    t = reg.loc["0", "text"]
    assert "\n" not in t and " " not in t
    sp = reg.loc["0", "spans"][0]
    assert t[sp["start"] : sp["end"]] == sp["text"] == "98,532元"


def test_model_input_routing_and_roundtrip(spark):
    docs, _ = parse_labelstudio(_labelstudio_df(spark))
    reg = regularize_documents(docs)
    mi = to_model_input(reg, ENTITY_TYPES, max_seq_len=64).toPandas()
    # 2 docs × 3 prompts, 1 chunk each (short texts)
    assert len(mi) == 6
    routed = mi[mi.result_list.map(len) > 0]
    assert len(routed) == 1
    row = routed.iloc[0]
    assert row.prompt == "醫療費用"
    sp = row.result_list[0]
    assert row.content[sp["start"] : sp["end"]] == sp["text"]


def test_split_exact_counts_and_determinism(spark):
    df = spark.range(100).select(
        F.concat(F.lit("d"), "id").alias("doc_id"),
        F.lit("p").alias("prompt"),
        F.lit(0).alias("chunk_idx"),
    )
    s1 = split_dataset(df, (0.8, 0.1, 0.1), seed=1000)
    counts = {r["split"]: r["count"] for r in s1.groupBy("split").count().collect()}
    assert counts == {"train": 80, "dev": 10, "test": 10}
    s2 = split_dataset(df, (0.8, 0.1, 0.1), seed=1000)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    s3 = split_dataset(df, (0.8, 0.1, 0.1), seed=7)
    assert sorted(map(tuple, s1.collect())) != sorted(map(tuple, s3.collect()))


def test_pack_documents_budget_bounds(spark, sf_dir):
    """Quota-binning invariant: within a bucket every non-final pack's
    token total lies in (cap − max_doc, cap + max_doc), packs partition
    the corpus, and the assignment is deterministic."""
    from information_extraction_for_chinese_nlp_spark.operators.convert import (
        pack_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cap = 256
    out = pack_documents(docs, cap_tokens=cap, n_buckets=4).toPandas()
    assert len(out) == docs.count()  # partition: every doc exactly once

    for bucket, grp in out.groupby("bucket"):
        max_doc = grp.n_tokens.max()
        packs = grp.groupby("pack_id").n_tokens.sum()
        # identify the final pack (largest pack index) and exempt it
        final = max(packs.index, key=lambda p: int(p.split("#")[1]))
        for pack_id, total in packs.items():
            if pack_id == final:
                continue
            assert cap - max_doc < total < cap + max_doc, (
                bucket, pack_id, total, max_doc)

    out2 = pack_documents(docs, cap_tokens=cap, n_buckets=4).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, out2.values.tolist())
    )


def test_pack_documents_derives_buckets_from_input_size(spark):
    """n_buckets=None sizes the bucket count from the row count (each
    bucket sorts on ONE reducer, so buckets must scale with the input):
    ceil(count / target_bucket_rows)."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.operators.convert import (
        pack_documents,
    )

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("a b c d").alias("text")
        )

    small = pack_documents(corpus(50), cap_tokens=64, target_bucket_rows=100)
    big = pack_documents(corpus(1000), cap_tokens=64, target_bucket_rows=100)
    assert small.select("bucket").distinct().count() == 1  # ceil(50/100)
    # ceil(1000/100) = 10 derived buckets, all populated at n=1000
    assert big.select("bucket").distinct().count() == 10
    assert big.agg(F.max("bucket")).first()[0] == 9


def test_sample_stratified_cutoff_rounds_not_truncates(spark):
    """Fraction 0.29: cutoff must be round(0.29e6) = 290000, not the
    truncated 289999 (0.29*1e6 = 289999.999…). doc_id 227430 hashes to
    exactly 289999 (keep), 1794987 to 290000 (drop) — the two boundary
    rows pin the rounding rule on both sides of the cutoff."""
    from information_extraction_for_chinese_nlp_spark.operators.convert import (
        sample_stratified,
    )

    df = spark.createDataFrame(
        [(227430, "en"), (1794987, "en")], "doc_id long, lang string"
    )
    kept = {r.doc_id for r in sample_stratified(df, {"en": 0.29}).collect()}
    assert kept == {227430}


def test_sample_stratified_rates_and_determinism(spark, sf_dir):
    """Per-stratum keep rates track the requested fractions (hash
    precision), unlisted strata get the default, and the decision is
    independent of partitioning (repartition must not change the set)."""
    from information_extraction_for_chinese_nlp_spark.operators.convert import (
        sample_stratified,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    frac = {"en": 0.5, "zh": 1.0}
    out = sample_stratified(docs, frac, strata_col="lang", default_fraction=0.0)
    kept = out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    totals = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    assert kept.get("zh", 0) == totals["zh"]           # fraction 1.0 keeps all
    assert set(kept.index) <= {"en", "zh"}             # default 0.0 drops rest
    rate_en = kept.get("en", 0) / totals["en"]
    assert 0.3 < rate_en < 0.7, rate_en                # ~0.5 at n≈200

    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in
         sample_stratified(docs.repartition(17), frac, strata_col="lang",
                           default_fraction=0.0).collect()}
    assert a == b
    import pytest

    with pytest.raises(ValueError):
        sample_stratified(docs, {"en": 1.5})


def test_empty_annotations_array_yields_empty_spans(spark):
    """annotations = [] (exported but never annotated) must parse to a
    doc with empty spans — under Spark 4 ANSI defaults a plain
    element_at would throw INVALID_ARRAY_INDEX and kill the import."""
    import json

    from information_extraction_for_chinese_nlp_spark.operators.convert import (
        parse_labelstudio,
    )

    rows = [
        {"id": 1, "data": {"text": "abc"}, "annotations": []},
        {"id": 2, "data": {"text": "def"},
         "annotations": [{"result": [
             {"type": "labels",
              "value": {"start": 0, "end": 2, "text": "de", "labels": ["L"]}}]}]},
    ]
    raw = spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )
    docs, bad = parse_labelstudio(raw)
    got = {r.doc_id: r.spans for r in docs.collect()}
    assert got["1"] == []
    assert len(got["2"]) == 1
    assert bad.count() == 0
