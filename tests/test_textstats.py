"""CJK-aware text analysis: language ID and quality features must work
on REAL (unsegmented) Chinese text, not just space-delimited fixtures;
PII redaction counting must be idempotent."""

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.textstats import (
    lang_id,
    quality_features,
    repetition_features,
    scrub_pii,
)

ZH_TEXT = "原告主張因系爭事故受有傷害的情形，支出醫療費用，是以請求賠償，被告對此不爭執，經查屬實了，爰判決如主文。"


def test_lang_id_detects_unsegmented_chinese(spark):
    docs = spark.createDataFrame(
        [
            (0, ZH_TEXT),
            (1, "the cat sat on a mat of straw"),
            (2, "xxxx yyyy zzzz"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lang_id(docs).collect()}
    assert got[0].lang_pred == "zh" and got[0].marker_hits >= 2
    assert got[1].lang_pred == "en"
    assert got[2].lang_pred == "und"


def test_quality_features_chinese_not_collapsed(spark):
    """Each CJK char is a token unit and a word char: a normal Chinese
    document must not score ~0 quality / ~1.0 punct (which would let a
    --min-quality filter silently drop the whole zh corpus)."""
    docs = spark.createDataFrame(
        [(0, ZH_TEXT), (1, "the of and a to in is " * 20)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in quality_features(docs).collect()}
    zh = got[0]
    assert zh.n_tokens >= 30  # ~one unit per CJK char, not 1
    assert zh.punct_ratio < 0.25  # only the enumeration commas count
    assert zh.quality_score > 0.2  # was ~0.005 under ASCII-only \w
    assert zh.stopword_ratio > 0.0  # 的/是/了 occurrences count
    assert got[1].quality_score > 0.5  # en path unchanged in spirit


def test_scrub_pii_recount_is_idempotent(spark):
    docs = spark.createDataFrame(
        [(0, "mail alice@example.com now"), (1, "keep <EMAIL> quoted")],
        "doc_id long, text string",
    )
    first = scrub_pii(docs)
    got = {r.doc_id: r for r in first.collect()}
    assert got[0].n_redactions == 1
    assert got[1].n_redactions == 0  # pre-existing placeholder: not ours
    # second pass over already-scrubbed text redacts nothing
    second = {r.doc_id: r for r in scrub_pii(first.select("doc_id", "text")).collect()}
    assert second[0].n_redactions == 0
    assert second[0].text == got[0].text


def test_char_run_max_newline_only_is_zero(spark):
    docs = spark.createDataFrame(
        [(0, "\n\n"), (1, "aaa"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.char_run_max for r in repetition_features(docs).collect()}
    assert got == {0: 0, 1: 3, 2: 0}


def test_threshold_sweep_matches_eval_with_duplicate_gold(spark):
    """num_label must be RAW gold rows on both paths — a distinct in the
    sweep would tune thresholds against a different recall denominator
    when gold carries duplicate rows."""
    from information_extraction_for_chinese_nlp_spark.operators.evaluation import (
        eval_counts,
        threshold_sweep,
    )

    pred = spark.createDataFrame(
        [("d1", 0, 2, 0.9), ("d2", 1, 3, 0.7)],
        "doc_id string, s int, e int, probability double",
    )
    gold = spark.createDataFrame(
        [("d1", 0, 2), ("d1", 0, 2), ("d2", 5, 7)],  # duplicated row
        "doc_id string, s int, e int",
    )
    sweep = {
        r.threshold: r
        for r in threshold_sweep(
            pred, gold, thresholds=(0.5,), keys=("doc_id", "s", "e")
        ).collect()
    }
    ref = eval_counts(
        pred.filter(F.col("probability") > 0.5), gold, keys=["doc_id", "s", "e"]
    ).first()
    assert sweep[0.5].num_label == ref.num_label == 3
    assert sweep[0.5].recall_ == ref.recall_
