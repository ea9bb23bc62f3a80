"""P1/P2 regularization semantics (reference utils/json_utils.py:94-220)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_for_chinese_nlp_spark.functions.text import (
    regularize_with_spans,
    scrub_text,
)


def test_scrub_removes_all_targets():
    assert scrub_text("a\nb c　d\\ne") == "abcde"


def test_scrub_order_sensitivity():
    # Deleting the newline first creates a literal backslash-n that the
    # final pass then removes — sequential semantics, like the reference.
    assert scrub_text("x\\\nny") == "xy"
    # but a lone backslash stays
    assert scrub_text("x\\y") == "x\\y"


def test_regularize_rebases_spans():
    text = "ab \ncd　ef"
    # span over "cd" at raw offsets [4,6)
    new_text, spans = regularize_with_spans(text, [(4, 6, "cd", "L")])
    assert new_text == "abcdef"
    assert spans == [(2, 4, "cd", "L")]
    assert new_text[2:4] == "cd"


def test_regularize_span_containing_special_chars():
    text = "xx一 二\n三yy"
    new_text, spans = regularize_with_spans(text, [(2, 7, "一 二\n三", "L")])
    assert new_text == "xx一二三yy"
    assert spans == [(2, 5, "一二三", "L")]


def test_regularize_roundtrip_failure_raises():
    # A span whose stored text disagrees with the document fails the
    # round-trip check (reference ConvertingError).
    with pytest.raises(ValueError):
        regularize_with_spans("abcdef", [(0, 2, "zz", "L")])


@given(st.text(alphabet="ab 一\n　", min_size=0, max_size=120), st.data())
@settings(max_examples=200, deadline=None)
def test_regularize_property_roundtrip(text, data):
    # pick a span that contains no leading/trailing removable char issues:
    # any substring works as long as we pass its true text.
    if len(text) < 2:
        spans = []
    else:
        start = data.draw(st.integers(0, len(text) - 1))
        end = data.draw(st.integers(start + 1, len(text)))
        spans = [(start, end, text[start:end], "L")]
    new_text, new_spans = regularize_with_spans(text, spans)
    assert new_text == scrub_text(text.replace("\\n", ""))  # no literal \n here
    for s, e, t, _ in new_spans:
        assert new_text[s:e] == t
