"""Pathological skew: one conversation with 20k turns among normal ones.
Assembly order, extraction, and the salted variant must all stay correct."""

import pandas as pd
from pyspark.sql import functions as F

from information_extraction_for_chinese_nlp_spark.operators.assembly import (
    assemble_turns,
    assemble_turns_salted,
)
from information_extraction_for_chinese_nlp_spark.plans.pipeline import extract_triples
from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
    synth_transcripts,
)


def test_hot_conversation_assembles_in_order(spark):
    t = synth_transcripts(
        spark, n_convs=21, turns_per_conv=5,
        long_conv_every=21, long_conv_turns=20000,
    ).cache()
    hot_id = "conv-0000000000000"
    hot = assemble_turns(t.filter(F.col("conv_id") == hot_id))
    row = hot.first()
    assert row.n_turns == 20000

    serial = (
        t.filter(F.col("conv_id") == hot_id)
        .orderBy("turn_idx")
        .agg(F.concat_ws("", F.collect_list("text")))
        .first()[0]
    )
    assert row.text == serial

    salted = assemble_turns_salted(
        t.filter(F.col("conv_id") == hot_id), n_salts=16
    ).first()
    assert salted.text == serial


def test_extraction_on_skewed_input_matches_per_doc(spark):
    t = synth_transcripts(
        spark, n_convs=21, turns_per_conv=5,
        long_conv_every=21, long_conv_turns=20000,
    ).cache()
    edges = extract_triples(t, max_seq_len=256).toPandas()
    hot = edges[edges.subj == "conv-0000000000000"]
    # the hot conversation carries ~1/3 mention density over 20k turns;
    # its spans must round-trip against the assembled text
    assert len(hot) > 100
    doc_text = assemble_turns(
        t.filter(F.col("conv_id") == "conv-0000000000000")
    ).first().text
    from information_extraction_for_chinese_nlp_spark.functions.text import scrub_text

    clean = scrub_text(doc_text)
    sample = hot.head(50)
    for _, r in sample.iterrows():
        assert clean[r.start : r.end] == r.obj
