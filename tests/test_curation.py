"""curate(): composed curation equals the naive stage-by-stage
composition, with a linear plan (no corpus re-scan blowup)."""

import io
import contextlib

from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.curation import curate
from information_extraction_for_chinese_nlp_spark.operators.convert import (
    sample_stratified,
)
from information_extraction_for_chinese_nlp_spark.operators.dedup import (
    decontaminate,
    dedup_pipeline,
)
from information_extraction_for_chinese_nlp_spark.operators.textstats import (
    quality_features,
    scrub_pii,
)


def _naive(docs, eval_docs):
    """The join-back composition run_dataprep-style, stage by stage."""
    out = dedup_pipeline(docs, n_bands=2, rows_per_band=2, max_bucket=1000)
    flags = decontaminate(out, eval_docs, n=8)
    out = out.join(
        flags.filter(~F.col("contaminated")).select("doc_id"),
        "doc_id", "left_semi",
    )
    q = quality_features(out).filter(F.col("quality_score") >= 0.1).select("doc_id")
    out = out.join(q, "doc_id", "left_semi")
    red = scrub_pii(out).select("doc_id", "text")
    out = out.drop("text").join(red, "doc_id")
    return sample_stratified(
        out, {}, strata_col="lang", key_cols=("doc_id",), default_fraction=0.5
    )


def test_curate_matches_naive_composition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    got = curate(
        docs, eval_docs=eval_docs, decontam_n=8, min_quality=0.1,
        sample_fractions={}, default_fraction=0.5,
        n_bands=2, rows_per_band=2, max_bucket=1000,
    )
    want = _naive(docs, eval_docs)
    g = {(r.doc_id, r.text) for r in got.select("doc_id", "text").collect()}
    w = {(r.doc_id, r.text) for r in want.select("doc_id", "text").collect()}
    assert g == w
    assert len(g) > 0


def test_curate_plan_is_linear(spark, sf_dir):
    """The composed plan must NOT re-scan the corpus per stage: above
    the two checkpoint boundaries there are ZERO parquet scans (the
    naive join-back composition showed 60 in the r5 audit)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate(
        docs, eval_docs=docs.limit(5).select("text"), min_quality=0.1,
        sample_fractions={}, default_fraction=0.5,
        n_bands=2, rows_per_band=2, max_bucket=1000,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan  # the checkpoint boundary


def test_curate_stages_optional(spark, sf_dir):
    """Disabled stages change nothing: dedup-only curate == dedup_pipeline."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = curate(docs, scrub=False, n_bands=2, rows_per_band=2,
                 max_bucket=1000)
    want = dedup_pipeline(docs, n_bands=2, rows_per_band=2, max_bucket=1000)
    assert {r.doc_id for r in got.select("doc_id").collect()} == {
        r.doc_id for r in want.select("doc_id").collect()
    }


def test_curate_custom_text_col(spark, sf_dir):
    """text_col != 'text' must flow through every stage, including the
    decontaminate eval side (whose column name follows text_col unless
    eval_text_col names it explicitly)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
        "text", "body"
    )
    out = curate(
        docs, eval_docs=docs.limit(3).select("body"), text_col="body",
        min_quality=0.0, n_bands=2, rows_per_band=2, max_bucket=1000,
    )
    assert "body" in out.columns and out.count() > 0
    # explicit eval_text_col for an eval frame with a different schema
    out2 = curate(
        docs,
        eval_docs=docs.limit(3).selectExpr("body AS eval_text"),
        eval_text_col="eval_text", text_col="body",
        n_bands=2, rows_per_band=2, max_bucket=1000,
    )
    assert out2.count() > 0


def test_curate_line_dedup_stage(spark, tmp_path):
    """line_dedup_min_df strips corpus boilerplate BEFORE banding:
    equals running line_dedup then curate, passenger columns (lang)
    survive without a join-back, and the composed plan still has zero
    parquet scans above the boundaries — the fixture is PARQUET-backed
    so that assertion can actually fail if a boundary is removed."""
    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        line_dedup,
    )

    rows = [
        (i, f"COOKIE BANNER\nunique body {i} words\nFOOTER", "en")
        for i in range(6)
    ] + [(10, "totally distinct document here", "zh")]
    path = str(tmp_path / "ld_docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(path)
    docs = spark.read.parquet(path)

    got = curate(docs, line_dedup_min_df=3, scrub=False,
                 n_bands=2, rows_per_band=2, max_bucket=1000)
    pre = line_dedup(docs, min_df=3, keep=("lang",)).select(
        "doc_id", "lang", "text"
    )
    want = curate(pre, scrub=False, n_bands=2, rows_per_band=2,
                  max_bucket=1000)
    g = sorted((r.doc_id, r.lang, r.text) for r in got.collect())
    w = sorted((r.doc_id, r.lang, r.text) for r in want.collect())
    assert g == w and g
    # boilerplate gone from every survivor; lang passenger intact
    assert all("COOKIE" not in t and "FOOTER" not in t for _, _, t in g)
    assert {l for _, l, _ in g} <= {"en", "zh"}

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    assert buf.getvalue().count("Scan parquet") == 0


# composed-job e2e (naive-equivalence runs every stage twice): slow tier
import pytest

pytestmark = pytest.mark.slow
