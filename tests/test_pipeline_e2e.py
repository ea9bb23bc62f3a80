"""End-to-end: synthetic transcripts -> edges; Spark vs pure-Python
reference-style oracle (per-document serial loop, like run_infer.py:127)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark import ENTITY_TYPES
from information_extraction_for_chinese_nlp_spark.functions.chunking import chunk_content
from information_extraction_for_chinese_nlp_spark.functions.spans import decode_spans
from information_extraction_for_chinese_nlp_spark.functions.text import scrub_text
from information_extraction_for_chinese_nlp_spark.inference.scorer import StubEncoder
from information_extraction_for_chinese_nlp_spark.operators.assembly import (
    assemble_turns,
    assemble_turns_salted,
)
from information_extraction_for_chinese_nlp_spark.plans.pipeline import extract_triples
from information_extraction_for_chinese_nlp_spark.sources.transcripts import synth_transcripts


def reference_style_extract(doc_id, text, prompts, max_seq_len=512, threshold=0.5):
    """Serial single-process restatement of the reference E1 loop:
    scrub -> chunk -> score -> decode -> threshold. Used as oracle."""
    encoder = StubEncoder(prompts)
    out = []
    text = scrub_text(text)
    for prompt in prompts:
        for chunk_start, piece, _ in chunk_content(text, prompt, max_seq_len):
            sp, ep = encoder.score(piece, prompt)
            for s, e_incl, prob in decode_spans(sp, ep):
                if prob > threshold:
                    out.append(
                        (doc_id, prompt, piece[s : e_incl + 1],
                         chunk_start + s, chunk_start + e_incl + 1, prob)
                    )
    return out


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth_transcripts(spark, n_convs=30, turns_per_conv=8,
                             long_conv_every=10, long_conv_turns=60).cache()


def test_assembly_invariant_order(spark, transcripts):
    """Per-turn text equality under stable (conv_id, turn_idx) order."""
    docs = assemble_turns(transcripts).toPandas().set_index("doc_id")
    turns = transcripts.toPandas()
    for conv_id, grp in turns.groupby("conv_id"):
        expected = "".join(grp.sort_values("turn_idx")["text"])
        assert docs.loc[conv_id, "text"] == expected


def test_salted_assembly_equals_plain(spark, transcripts):
    a = assemble_turns(transcripts).orderBy("doc_id").toPandas()
    b = assemble_turns_salted(transcripts, n_salts=4).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_e2e_matches_reference_oracle(spark, transcripts):
    edges = extract_triples(transcripts, max_seq_len=128).toPandas()
    got = set(
        zip(edges.subj, edges.pred, edges.obj, edges.start, edges.end)
    )

    docs = assemble_turns(transcripts).toPandas()
    want = set()
    for _, row in docs.iterrows():
        for d, p, o, s, e, _prob in reference_style_extract(
            row.doc_id, row.text, ENTITY_TYPES, max_seq_len=128
        ):
            want.add((d, p, o, s, e))

    assert want, "oracle produced no triples — generator broken"
    # exact agreement => P = R = 1.0 >= 0.95 target
    assert got == want


def test_span_pr_meets_target(spark, transcripts):
    """The north_rule gate, measured the reference's way: SpanEvaluator-
    style exact-match P/R of the Spark pipeline vs the serial
    reference-style oracle, via the A2 join harness. Target >= 0.95."""
    from information_extraction_for_chinese_nlp_spark.operators.evaluation import span_f1

    pred = extract_triples(transcripts, max_seq_len=128).select(
        F.col("subj").alias("doc_id"), F.col("pred").alias("prompt"), "start", "end"
    )

    docs = assemble_turns(transcripts).toPandas()
    gold_rows = []
    for _, row in docs.iterrows():
        for d, p, _o, s, e, _prob in reference_style_extract(
            row.doc_id, row.text, ENTITY_TYPES, max_seq_len=128
        ):
            gold_rows.append((d, p, s, e))
    gold = spark.createDataFrame(
        gold_rows, "doc_id string, prompt string, start int, end int"
    )

    per_class = span_f1(pred, gold).toPandas()
    assert set(per_class.prompt) == set(ENTITY_TYPES)
    assert (per_class.precision_ >= 0.95).all(), per_class
    assert (per_class.recall_ >= 0.95).all(), per_class

    total = span_f1(pred, gold, group_col=None).toPandas().iloc[0]
    assert total.precision_ >= 0.95 and total.recall_ >= 0.95
    assert total.f1 >= 0.95


def test_jaccard_max_df_is_lower_bound(spark):
    from information_extraction_for_chinese_nlp_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e g"),
            (3, "x y z w v u"),
        ],
        "doc_id long, text string",
    )
    full = {
        (r.doc_a, r.doc_b): r.jac
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.01).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jac
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.01, max_df=1).collect()
    }
    assert (1, 2) in full
    for pair, jac in capped.items():
        assert jac <= full[pair] + 1e-9
    assert set(capped) <= set(full)


def test_probability_strictly_above_threshold(spark, transcripts):
    edges = extract_triples(transcripts, max_seq_len=128, threshold=0.6)
    assert edges.filter("prob <= 0.6").count() == 0


def test_max_strategy_single_span_per_doc_prompt(spark, transcripts):
    edges = extract_triples(transcripts, max_seq_len=128, strategy="max")
    dup = edges.groupBy("subj", "pred").count().filter("count > 1").count()
    assert dup == 0

# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
pytestmark = pytest.mark.slow
