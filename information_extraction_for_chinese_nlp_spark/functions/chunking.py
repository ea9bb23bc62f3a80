"""R2 — sliding-window content chunking with gold-span rebasing.

Re-derivation of the reference's ``read_data_by_chunk``
(reference utils/data_utils.py:9-87), restated in absolute coordinates:

- Window width is ``max_content_len = max_seq_len - len(prompt) - 3``
  (3 = [CLS] + 2×[SEP] in the UIE input layout).
- Windows slide left-to-right; a gold span that would straddle a window
  boundary (the "Result-Cross" case, utils/data_utils.py:56-63) shrinks
  the current window to end exactly at the span's start, so no gold span
  is ever split.
- Emitted spans are chunk-local; the round-trip invariant
  ``chunk[start:end] == span_text`` is asserted (utils/data_utils.py:74-78).
- Validation: ``start <= end`` and span length ≤ window width, else the
  row is invalid (DataError in the reference; quarantined here).

The pure function below is property-tested; the Spark surface is a pandas
UDF computing chunk boundaries + rebased spans, followed by
``posexplode`` so the chunk fan-out stays a narrow, parallel transform.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

Span = Tuple[int, int, str]  # (start, end, text) — absolute char offsets
Chunk = Tuple[int, str, List[Span]]  # (chunk_start, content, local spans)


class ChunkDataError(ValueError):
    """Invalid gold span (start > end, overlong, or overlapping)."""


def chunk_content(
    content: str,
    prompt: str,
    max_seq_len: int = 512,
    spans: Sequence[Span] = (),
) -> List[Chunk]:
    """Split ``content`` into windows; return chunk-local spans per window.

    Equivalent to the reference generator for sorted, non-overlapping
    spans (its only valid input — enforced by its round-trip assertion),
    with the lazy head-rebasing bookkeeping replaced by absolute offsets.
    """
    if max_seq_len <= len(prompt) + 3:
        raise ValueError("max_seq_len too small for prompt")
    base = max_seq_len - len(prompt) - 3

    # NOTE: the reference strips content at read (utils/data_utils.py:33);
    # in its data the regularize step has already removed every space and
    # newline, so that strip is a no-op. Stripping here would shift all
    # absolute offsets for inputs with leading whitespace the scrub list
    # doesn't cover (\t, \r), breaking the span contract — so we don't.
    ordered = sorted(spans, key=lambda s: (s[0], s[1]))
    for s, e, _ in ordered:
        if s > e or e - s > base:
            raise ChunkDataError(f"invalid span start={s} end={e} (window {base})")

    # Reference parity: empty content yields no chunks (its `while
    # len(content) > 0` never fires), so an empty document vanishes.
    chunks: List[Chunk] = []
    pos = 0
    i = 0
    n = len(content)
    while pos < n:
        width = base
        local: List[Span] = []
        while i < len(ordered):
            s, e, t = ordered[i]
            rs, re_ = s - pos, e - pos
            if rs < 0:
                raise ChunkDataError(f"overlapping spans at start={s}")
            if rs >= width:
                break
            if re_ > width:
                # Result-Cross: shrink this window to the span's start so
                # the whole span lands in the next window.
                width = rs
                break
            local.append((rs, re_, t))
            i += 1
        piece = content[pos : pos + width]
        for rs, re_, t in local:
            if piece[rs:re_] != t:
                raise ChunkDataError(
                    f"round-trip failed: {piece[rs:re_]!r} != {t!r}"
                )
        chunks.append((pos, piece, local))
        pos += width
    if i < len(ordered):
        # a span starting at/after len(content) can never round-trip —
        # silently dropping it would lose the training label invisibly;
        # raise so the row quarantines like every other data error
        s, e, _ = ordered[i]
        raise ChunkDataError(
            f"span start={s} end={e} beyond content length {n}"
        )
    return chunks


_CHUNKS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("chunk_start", IntegerType()),
            StructField("content", StringType()),
            StructField(
                "result_list",
                ArrayType(
                    StructType(
                        [
                            StructField("text", StringType()),
                            StructField("start", IntegerType()),
                            StructField("end", IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
)


def make_chunk_udf(max_seq_len: int = 512):
    """pandas UDF: (text, prompt, spans?) -> array<struct chunk>.

    Invalid rows (reference DataError) yield NULL so the caller can route
    them to a quarantine sink instead of failing the job (SURVEY.md P6).
    """

    @F.pandas_udf(_CHUNKS_SCHEMA)
    def chunk_udf(text: pd.Series, prompt: pd.Series, spans: pd.Series) -> pd.Series:
        from .worker import pin_worker_threads

        pin_worker_threads()
        out = []
        for t, p, sp in zip(text, prompt, spans):
            if t is None or p is None:
                out.append(None)
                continue
            try:
                # tuple building sits INSIDE the try: a span struct with
                # NULL start/end (int(None) -> TypeError) is a data
                # error that must quarantine, not kill the task
                tuples = (
                    []
                    if sp is None
                    else [(int(s["start"]), int(s["end"]), s["text"]) for s in sp]
                )
                chunks = chunk_content(t, p, max_seq_len, tuples)
            except (ChunkDataError, ValueError, TypeError):
                out.append(None)
                continue
            out.append(
                [
                    {
                        "chunk_start": cs,
                        "content": piece,
                        "result_list": [
                            {"text": tt, "start": a, "end": b} for a, b, tt in local
                        ],
                    }
                    for cs, piece, local in chunks
                ]
            )
        return pd.Series(out)

    return chunk_udf


def explode_chunks(df, text_col: str, prompt_col: str, spans_col: Column | None,
                   max_seq_len: int = 512):
    """documents × prompts -> one row per chunk with chunk-local spans.

    Input df must already carry `prompt_col`. Output adds
    (chunk_idx, chunk_start, content, result_list); invalid rows are
    dropped here — use ``quarantine_chunks`` to capture them.
    """
    udf = make_chunk_udf(max_seq_len)
    spans = spans_col if spans_col is not None else F.lit(None).cast(
        "array<struct<start:int,end:int,text:string>>"
    )
    with_chunks = df.withColumn("_chunks", udf(F.col(text_col), F.col(prompt_col), spans))
    # posexplode_outer, not posexplode: the plain Generate makes the
    # optimizer infer a `size(_chunks) > 0` pre-filter that re-evaluates
    # the pandas UDF a second time (two ArrowEvalPython nodes). The outer
    # variant keeps one UDF eval; null rows are dropped right after.
    exploded = with_chunks.select(
        "*", F.posexplode_outer("_chunks").alias("chunk_idx", "_chunk")
    ).filter(F.col("_chunk").isNotNull())
    return (
        exploded.withColumn("chunk_start", F.col("_chunk.chunk_start"))
        .withColumn("content", F.col("_chunk.content"))
        .withColumn("result_list", F.col("_chunk.result_list"))
        .drop("_chunks", "_chunk")
    )
