"""Text regularization: stateless scrub (P1) and span-preserving scrub (P2).

Semantics match the reference:
- P1: sequentially delete newline, ASCII space, ideographic space (U+3000),
  then the two-character literal ``\\n`` (reference run_infer.py:52-59,
  config/base_config.py:17).
- P2: same deletion over a document that carries labeled spans; every
  span's (start, end) is rebased by the number of removed characters
  before it, and span text itself is scrubbed; the round-trip invariant
  ``text[start:end] == span_text`` must hold afterwards (reference
  utils/json_utils.py:94-220).

P1 is a pure Catalyst expression chain (JVM-side, codegen'd); P2 is a
stateful per-character scan with no Catalyst equivalent, implemented as a
vectorized pandas UDF over an Arrow batch.
"""

from __future__ import annotations

import re
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

# Applied in this order, mirroring the reference's sequential re.sub loop.
SCRUB_PATTERNS: List[str] = ["\n", " ", "　", r"\\n"]


def scrub_text(text: str) -> str:
    """Pure-Python P1 scrub (reference parity; used by oracles/tests)."""
    for pat in SCRUB_PATTERNS:
        text = re.sub(pat, "", text)
    return text


def scrub_col(col: Column) -> Column:
    """P1 as a Catalyst expression chain.

    Sequential application (not one alternation) preserves the reference's
    order-sensitive edge case where deleting a newline first can create a
    new literal ``\\n`` adjacency that the final pass then removes.
    """
    out = col
    for pat in ["\\n", " ", "　", "\\\\n"]:
        out = F.regexp_replace(out, pat, "")
    return out


REMOVABLE_CHARS = {"\n", " ", "　"}
_LITERAL_BACKSLASH_N = re.compile(r"\\n")
_CHAR_PATTERN = re.compile("[\n 　]")


def regularize_with_spans(
    text: str, spans: Sequence[Tuple[int, int, str, str]]
) -> Tuple[str, List[Tuple[int, int, str, str]]]:
    """P2: scrub `text` and rebase each (start, end, span_text, label).

    Rebasing: a boundary index i shifts left by the count of removable
    single characters strictly before i (prefix-count formulation of the
    reference's pointer walk, utils/json_utils.py:130-156 — equivalent for
    sorted non-overlapping spans and robust to touching spans). Span text
    is scrubbed with the same char classes plus the literal ``\\n``
    (utils/json_utils.py:148-154).

    Raises ValueError if the round-trip invariant fails, mirroring the
    reference's ConvertingError (utils/json_utils.py:184-192). Note the
    reference does NOT remove the literal ``\\n`` from the document text
    in this path (only single chars are counted/removed), so a span whose
    text contains a literal backslash-n would fail its round-trip check
    there too; we preserve that behavior.
    """
    # prefix[i] = number of removable chars in text[:i]
    n = len(text)
    prefix = [0] * (n + 1)
    cnt = 0
    for i, ch in enumerate(text):
        prefix[i] = cnt
        if ch in REMOVABLE_CHARS:
            cnt += 1
    prefix[n] = cnt

    new_text = _CHAR_PATTERN.sub("", text)

    out = []
    for start, end, span_text, label in sorted(spans, key=lambda s: s[0]):
        new_start = start - prefix[start]
        new_end = end - prefix[end]
        new_span_text = _CHAR_PATTERN.sub("", span_text)
        new_span_text = _LITERAL_BACKSLASH_N.sub("", new_span_text)
        if new_text[new_start:new_end] != new_span_text:
            raise ValueError(
                f"span round-trip failed: {new_text[new_start:new_end]!r} != "
                f"{new_span_text!r} at {new_start}:{new_end}"
            )
        out.append((new_start, new_end, new_span_text, label))
    return new_text, out


_REGULARIZED_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("start", IntegerType()),
                        StructField("end", IntegerType()),
                        StructField("text", StringType()),
                        StructField("label", StringType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_REGULARIZED_SCHEMA)
def regularize_udf(text: pd.Series, spans: pd.Series) -> pd.DataFrame:
    """Arrow-batched P2. spans: array<struct<start,end,text,label>> or null."""
    from .worker import pin_worker_threads

    pin_worker_threads()
    out_text, out_spans = [], []
    for t, sp in zip(text, spans):
        if t is None:
            out_text.append(None)
            out_spans.append(None)
            continue
        try:
            # NULL start/end in a span struct (int(None) -> TypeError) is
            # a data error: emit the NULL row the quarantine filter
            # catches, don't kill the task
            tuples = (
                []
                if sp is None
                else [
                    (int(s["start"]), int(s["end"]), s["text"], s["label"])
                    for s in sp
                ]
            )
        except TypeError:
            out_text.append(None)
            out_spans.append(None)
            continue
        nt, ns = regularize_with_spans(t, tuples)
        out_text.append(nt)
        out_spans.append(
            [{"start": a, "end": b, "text": c, "label": d} for a, b, c, d in ns]
        )
    return pd.DataFrame({"text": out_text, "spans": out_spans})
