"""M3 decode semantics — pinned golden cases for the nearest-preceding-
start pairing rule (PaddleNLP SpanEvaluator behavior, SURVEY.md §2.7)."""

from information_extraction_for_chinese_nlp_spark.functions.spans import (
    decode_spans,
    pair_spans,
    positions_over,
)


def test_positions_strictly_greater():
    assert positions_over([0.5, 0.51, 0.49]) == [(1, 0.51)]


def test_pairing_golden_case():
    # starts at 1,2,10 ; ends at 4,12 -> (2,4) and (10,12):
    # for each end, the nearest preceding start wins.
    starts = [(1, 0.9), (2, 0.8), (10, 0.7)]
    ends = [(4, 0.6), (12, 0.9)]
    spans = pair_spans(starts, ends)
    assert [(s, e) for s, e, _ in spans] == [(2, 4), (10, 12)]
    assert abs(spans[0][2] - 0.8 * 0.6) < 1e-12


def test_pairing_equal_position():
    assert [(s, e) for s, e, _ in pair_spans([(3, 0.9)], [(3, 0.9)])] == [(3, 3)]


def test_end_before_any_start_dropped():
    assert pair_spans([(5, 0.9)], [(2, 0.9)]) == []


def test_start_after_all_ends_dropped():
    assert pair_spans([(9, 0.9)], [(2, 0.9)]) == []


def test_decode_end_inclusive_and_product_prob():
    sp = [0.0] * 10
    ep = [0.0] * 10
    sp[2] = 0.8
    ep[5] = 0.7
    spans = decode_spans(sp, ep)
    assert len(spans) == 1
    s, e, p = spans[0]
    assert (s, e) == (2, 5)
    assert abs(p - 0.56) < 1e-12


def test_decode_multiple_mentions():
    sp = [0.0] * 20
    ep = [0.0] * 20
    sp[1], ep[3] = 0.9, 0.9
    sp[10], ep[14] = 0.6, 0.55
    out = decode_spans(sp, ep)
    assert [(s, e) for s, e, _ in out] == [(1, 3), (10, 14)]
