"""M3 — UIE-style start/end pointer span decode.

The reference delegates decoding to PaddleNLP's SpanEvaluator / Taskflow
(invoked at run_eval.py:110 and run_infer.py:127; threshold documented at
tools/convert_to_labelstudio.py:79-87). The algorithm, re-derived here
from the published semantics and pinned with golden tests:

1. threshold: positions with probability strictly greater than ``limit``
   (default 0.5) on each of the start / end vectors;
2. pairing: walk both sorted position lists; each end position pairs with
   the nearest preceding (or equal) unconsumed start position — later
   starts before the same end overwrite earlier candidates, and each
   start is consumed by at most one end;
3. span probability = p_start × p_end; char range is [start, end+1) when
   positions index characters (our scorer is char-level; with a real
   tokenizer the offset mapping converts token→char first).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

DecodedSpan = Tuple[int, int, float]  # (start, end_inclusive, probability)


def positions_over(probs: Sequence[float], limit: float = 0.5) -> List[Tuple[int, float]]:
    """Indices (with probs) where prob > limit — strict, like the reference
    inference path (run_infer.py:67)."""
    return [(i, p) for i, p in enumerate(probs) if p > limit]


def pair_spans(
    starts: Sequence[Tuple[int, float]], ends: Sequence[Tuple[int, float]]
) -> List[DecodedSpan]:
    """Pair thresholded start/end positions (nearest-preceding-start rule)."""
    starts = sorted(starts)
    ends = sorted(ends)
    chosen: dict[int, Tuple[int, float, float]] = {}  # end -> (start, ps, pe)
    si = ei = 0
    while si < len(starts) and ei < len(ends):
        s_pos, s_p = starts[si]
        e_pos, e_p = ends[ei]
        if s_pos <= e_pos:
            chosen[e_pos] = (s_pos, s_p, e_p)
            si += 1
            if s_pos == e_pos:
                ei += 1
        else:
            ei += 1
    return sorted((s, e, sp * ep) for e, (s, sp, ep) in chosen.items())


def decode_spans(
    start_probs: Sequence[float],
    end_probs: Sequence[float],
    limit: float = 0.5,
) -> List[DecodedSpan]:
    """Full decode: probability vectors -> [(start, end_incl, prob)]."""
    return pair_spans(positions_over(start_probs, limit), positions_over(end_probs, limit))


def decode_one_hot(ids: Sequence[float]) -> List[int]:
    """Gold one-hot vector -> positions (used by the eval harness, A2)."""
    return [i for i, v in enumerate(ids) if v > 0.5]
