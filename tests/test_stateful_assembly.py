"""Cross-batch stateful turn assembly (applyInPandasWithState):
conversations split across micro-batches assemble correctly once the
session gap elapses."""

import pytest

import time

from information_extraction_for_chinese_nlp_spark.schemas import TRANSCRIPTS
from information_extraction_for_chinese_nlp_spark.streaming.stream import (
    assemble_stream_stateful,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, TRANSCRIPTS)
    df.coalesce(1).write.mode("append").parquet(path)


def test_stateful_assembly_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: first half of conv A, all of conv B — write BEFORE start
    _write_batch(
        spark, src,
        [("A", 0, "user", "第一句", None, None), ("A", 1, "assistant", "第二句", None, None),
         ("B", 0, "user", "乙一", None, None)],
    )

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = assemble_stream_stateful(stream, gap_seconds=8)
    q = (
        out.writeStream.format("memory").queryName("assembled")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        time.sleep(1)
        # batch 2: second half of conv A, arriving out of order
        _write_batch(spark, src, [("A", 3, "tool", "第四句", "t", None),
                                  ("A", 2, "user", "第三句", None, None)])
        # heartbeat batches keep micro-batches firing so the processing
        # time timeout can close the sessions
        deadline = time.time() + 90
        hb = 0
        while time.time() < deadline:
            got = {r.doc_id: r for r in spark.sql("select * from assembled").collect()}
            if "A" in got and "B" in got:
                break
            hb += 1
            _write_batch(spark, src, [(f"HB{hb}", 0, "user", "x", None, None)])
            time.sleep(1.5)
        got = {r.doc_id: r for r in spark.sql("select * from assembled").collect()}
        assert "A" in got and "B" in got, f"sessions never closed: {got.keys()}"
        assert got["A"].text == "第一句第二句第三句第四句"  # turn_idx order, cross-batch
        assert got["A"].n_turns == 4
        assert got["B"].text == "乙一"
    finally:
        q.stop()

# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
pytestmark = pytest.mark.slow
