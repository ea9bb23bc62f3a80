"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: documents.parquet (sf0.001) reshaped into the
transcripts schema, then the full triple-extraction plan (assemble →
scrub → chunk → prompt-explode → Arrow-batched scorer → decode →
threshold) returning the (subj, pred, obj) edge table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, each checked against a DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from information_extraction_for_chinese_nlp_spark.plans.pipeline import extract_triples
    from information_extraction_for_chinese_nlp_spark.sources.transcripts import (
        transcripts_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = transcripts_from_documents(docs)
    return extract_triples(transcripts, max_seq_len=512)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from information_extraction_for_chinese_nlp_spark.plans import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from information_extraction_for_chinese_nlp_spark.plans import registry

    return registry.oracle_sql()
