"""Explicit StructType schemas for every dataflow boundary.

The reference's data model is schema-implicit JSON (SURVEY.md §1); here
every representation D1..D6 gets an explicit Spark schema so writers,
readers, and the Arrow UDF boundary are all pinned.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# D1 — primary input per BASELINE.json input_hint: Iceberg/parquet table of
# multi-turn transcripts.
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

SPAN = StructType(
    [
        StructField("text", StringType(), False),
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
    ]
)

# Assembled document: one row per conversation (reference D2's `data.text`,
# built here by window-ordered concatenation of turns).
DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), True),
        StructField("spans", ArrayType(
            StructType(
                [
                    StructField("start", IntegerType(), False),
                    StructField("end", IntegerType(), False),
                    StructField("text", StringType(), False),
                    StructField("label", StringType(), False),
                ]
            )
        ), True),
    ]
)

# D3 — chunked model-input record (reference utils/data_utils.py:30-39).
MODEL_INPUT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("chunk_idx", IntegerType(), False),
        StructField("chunk_start", IntegerType(), False),
        StructField("content", StringType(), False),
        StructField("prompt", StringType(), False),
        StructField("result_list", ArrayType(SPAN), True),
    ]
)

# D5 — exploded inference result (reference run_infer.py:79-81).
EXTRACTIONS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("prompt", StringType(), False),
        StructField("span_text", StringType(), True),
        StructField("start", IntegerType(), True),
        StructField("end", IntegerType(), True),
        StructField("probability", DoubleType(), True),
    ]
)

# D6 / output — knowledge-graph edge and vertex tables.
EDGES = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), True),
        StructField("obj_norm", StringType(), True),
        StructField("prob", DoubleType(), True),
        StructField("doc_id", StringType(), True),
        StructField("start", IntegerType(), True),
        StructField("end", IntegerType(), True),
    ]
)

VERTICES = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("canonical_text", StringType(), True),
        StructField("type", StringType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)
