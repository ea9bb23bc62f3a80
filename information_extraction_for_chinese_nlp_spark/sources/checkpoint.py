"""Resumable execution: per-partition watermarks + LEFT ANTI skip.

north_rule: "every stage checkpoints per-partition watermarks and
lineage so a killed run resumes without recomputing completed Iceberg
snapshots." Mechanism:

- work is bucketed by a stable hash of the partition key
  (``pmod(xxhash64(conv_id), n_buckets)``) and processed in bucket
  batches;
- each completed batch appends an output snapshot (TableIO) and then a
  watermark row (bucket range, snapshot id, row count) — write order
  means a crash can leave an orphan snapshot but never a watermark
  without data; the next run prunes unacknowledged snapshots before
  reprocessing, so the crash window cannot double rows;
- on (re)start, pending work = input LEFT ANTI JOIN watermarks on
  bucket, so completed buckets are never rescanned past the filter —
  at scale this prunes at the source when the input is bucketed or
  partitioned by the same key.

The reference's closest concept is training checkpoint resume
(reference run_train.py:100-117); this generalizes it to dataflow.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import TableIO

WATERMARK_SCHEMA = ("bucket int, snapshot_id string, snapshot_rows long, "
                    "completed_at double")


class ResumableRunner:
    """Drive a bucket-partitioned pipeline with resume."""

    def __init__(self, spark: SparkSession, io: TableIO, n_buckets: int = 16,
                 key_col: str = "conv_id"):
        self.spark = spark
        self.io = io
        self.n_buckets = n_buckets
        self.key_col = key_col
        self._wm_path = os.path.join(io.warehouse, "_watermarks.jsonl")

    # -- watermark table ----------------------------------------------------

    def watermarks(self) -> DataFrame:
        if not os.path.exists(self._wm_path):
            return self.spark.createDataFrame([], WATERMARK_SCHEMA)
        with open(self._wm_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        if not rows:
            return self.spark.createDataFrame([], WATERMARK_SCHEMA)
        return self.spark.createDataFrame(rows, WATERMARK_SCHEMA)

    def done_buckets(self) -> set[int]:
        if not os.path.exists(self._wm_path):
            return set()
        with open(self._wm_path) as f:
            return {json.loads(line)["bucket"] for line in f if line.strip()}

    def _record(self, bucket: int, snapshot_id: str, n_rows: int) -> None:
        with open(self._wm_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "bucket": bucket,
                        "snapshot_id": snapshot_id,
                        # row count of the SHARED snapshot this bucket
                        # belongs to (not per-bucket rows)
                        "snapshot_rows": n_rows,
                        "completed_at": time.time(),
                    }
                )
                + "\n"
            )

    # -- execution ----------------------------------------------------------

    def bucket_col(self):
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast("int")

    def pending(self, df: DataFrame) -> DataFrame:
        """Input minus completed buckets, via LEFT ANTI join on bucket."""
        with_bucket = df.withColumn("_bucket", self.bucket_col())
        wm = self.watermarks().select(F.col("bucket").alias("_bucket")).distinct()
        return with_bucket.join(F.broadcast(wm), on="_bucket", how="left_anti")

    def _prune_orphan_snapshots(self, table: str) -> int:
        """Drop snapshots that have no watermark — the crash window is
        'snapshot appended, watermark not yet written', and the batch
        will re-run, so an orphan snapshot would double its rows."""
        acked = set()
        if os.path.exists(self._wm_path):
            with open(self._wm_path) as f:
                acked = {
                    json.loads(line)["snapshot_id"]
                    for line in f
                    if line.strip()
                }
        m = self.io._manifest()
        snaps = m.get(table, [])
        orphans = [s for s in snaps if s["snapshot_id"] not in acked]
        if orphans:
            m[table] = [s for s in snaps if s["snapshot_id"] in acked]
            self.io._save_manifest(m)
        return len(orphans)

    def run(
        self,
        df: DataFrame,
        process: Callable[[DataFrame], DataFrame],
        table: str,
        buckets_per_batch: int = 4,
        stamp_snapshot_col: str | None = "snapshot_id",
    ) -> int:
        """Process all pending buckets in batches; returns rows written
        by THIS run (the table total is ``io.read(table).count()``).

        Commit order per batch: snapshot append, then one watermark row
        per bucket (each carrying the shared snapshot_id and the
        snapshot's total row count as ``snapshot_rows``). A kill between
        batches loses nothing; a kill inside a batch is healed on the
        next run by ``_prune_orphan_snapshots`` (an appended snapshot
        without watermarks is discarded before the batch re-runs).
        """
        self._prune_orphan_snapshots(table)
        done = self.done_buckets()
        todo = [b for b in range(self.n_buckets) if b not in done]
        written = 0
        with_bucket = df.withColumn("_bucket", self.bucket_col())
        for i in range(0, len(todo), buckets_per_batch):
            batch = todo[i : i + buckets_per_batch]
            part = with_bucket.filter(F.col("_bucket").isin(batch)).drop("_bucket")
            out = process(part)
            # write once, count what was written — running count() on the
            # unmaterialized plan would execute the whole pipeline twice
            snapshot_id = self.io.write(
                out, table, mode="append", stamp_snapshot_col=stamp_snapshot_col
            )
            n = self.io.read_snapshot(table, snapshot_id).count()
            for b in batch:
                self._record(b, snapshot_id, n)
            written += n
        return written
