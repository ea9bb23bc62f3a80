"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.8); streaming is the new
Spark-native capability for continuously-arriving transcripts:

- ``stream_edges``: incremental triple extraction via ``foreachBatch`` —
  each micro-batch runs the exact batch plan (one code path, no
  batch/stream drift) and appends to the edge sink; the streaming
  checkpoint gives exactly-once per micro-batch, complementing the
  bucket-watermark resume of the batch path.
  Caveat: a conversation split across micro-batches is assembled per
  batch; upstream should route whole conversations into one batch
  (session-gap trigger or conv-complete markers) — the same contract
  the reference's line-per-document input format implies.
- ``windowed_edge_counts``: event-time tumbling window aggregation with
  a watermark for late data — the monitoring/rollup stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract_triples
from ..schemas import TRANSCRIPTS


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_edges(
    transcripts_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    max_seq_len: int = 512,
    available_now: bool = True,
):
    """Incremental extraction: micro-batch -> batch pipeline -> append."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        edges = extract_triples(batch_df, max_seq_len=max_seq_len)
        edges.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_path
        )

    writer = (
        transcripts_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_edge_counts(
    transcripts_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Event-time rollup: mentions per (window, role) with late-data
    tolerance = watermark. Pure streaming aggregation (stateful, no
    foreachBatch) — demonstrates watermark + window semantics."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                F.when(F.col("text").rlike("[0-9][0-9,]*元"), 1).otherwise(0)
            ).alias("n_money_turns"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "n_money_turns",
        )
    )
