"""M1 — tokenizer offset alignment for the [CLS] prompt [SEP] content
[SEP] layout (reference utils/data_utils.py:90-219).

A fast tokenizer returns ``offset_mapping``: per token, the (start, end)
char span in its own segment, with (0, 0) for special tokens. The UIE
input concatenates prompt and content, so content-token offsets must be
shifted past the prompt prefix ("drift"), and gold char spans must be
mapped to token indices to build the one-hot pointer labels.

Semantics re-derived from the reference:
- drift = end offset of the last prompt token + 1, detected at the
  first (0,0) mapping after position 0 (the [SEP] between segments;
  utils/data_utils.py:104-113); subsequent (0,0) mappings (padding,
  trailing [SEP]) stay untouched.
- char index i maps to the token whose shifted span satisfies
  start <= i < end; if no token contains it, fall back to (last
  non-special token index) + 1 (utils/data_utils.py:116-135).
- gold spans label token_start at char ``start + drift`` and token_end
  at char ``end - 1 + drift`` (end exclusive -> last char;
  utils/data_utils.py:206-210).

Pure functions — used inside the ONNX scorer's pandas batches; the stub
encoder is char-level so it bypasses this module.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

OffsetMapping = Sequence[Tuple[int, int]]


def drift_offsets(offset_mapping: OffsetMapping) -> Tuple[List[List[int]], int]:
    """Shift content-segment offsets past the prompt prefix.

    Returns (adjusted mapping, drift). The first (0,0) entry after index
    0 marks the segment boundary; every following non-special mapping is
    shifted by drift = previous token's end + 1.
    """
    adjusted = [list(m) for m in offset_mapping]
    drift = 0
    for idx in range(1, len(adjusted)):
        lo, hi = adjusted[idx]
        if lo == 0 and hi == 0:
            if drift == 0:
                drift = adjusted[idx - 1][1] + 1
            continue
        adjusted[idx][0] += drift
        adjusted[idx][1] += drift
    return adjusted, drift


def align_index(char_index: int, offset_mapping: Sequence[Sequence[int]]) -> int:
    """Char index -> token index under the shifted mapping.

    Falls back to (index of the last non-special token) + 1 when the
    char lands in no token (e.g. truncated content).
    """
    last_real = 0
    for idx, (lo, hi) in enumerate(offset_mapping):
        if lo <= char_index < hi:
            return idx
        if lo != 0 or hi != 0:
            last_real = idx
    return last_real + 1


def one_hot_labels(
    spans: Sequence[Tuple[int, int]],
    offset_mapping: OffsetMapping,
    max_seq_len: int,
) -> Tuple[List[float], List[float]]:
    """Gold char spans (end exclusive) -> start/end pointer label vectors."""
    adjusted, drift = drift_offsets(offset_mapping)
    start_ids = [0.0] * max_seq_len
    end_ids = [0.0] * max_seq_len
    for s, e in spans:
        si = align_index(s + drift, adjusted)
        ei = align_index(e - 1 + drift, adjusted)
        if si < max_seq_len:
            start_ids[si] = 1.0
        if ei < max_seq_len:
            end_ids[ei] = 1.0
    return start_ids, end_ids


def spans_from_token_ids(
    token_start: int,
    token_end: int,
    offset_mapping: Sequence[Sequence[int]],
    drift: int,
) -> Tuple[int, int]:
    """Inverse map for inference: decoded token span -> char span in the
    original content (undo the drift; end exclusive)."""
    s_char = offset_mapping[token_start][0] - drift
    e_char = offset_mapping[token_end][1] - drift
    return s_char, e_char
