"""M1 offset drift/align semantics (reference utils/data_utils.py:90-219).

Offset mappings are hand-built to mirror a fast tokenizer's output for
[CLS] prompt [SEP] content [SEP] with char-level tokens.
"""

from information_extraction_for_chinese_nlp_spark.functions.offsets import (
    align_index,
    drift_offsets,
    one_hot_labels,
    spans_from_token_ids,
)


def _mapping(prompt_len, content_len, pad_to=None):
    """[CLS] + prompt chars + [SEP] + content chars + [SEP] (+ padding)."""
    m = [(0, 0)]
    m += [(i, i + 1) for i in range(prompt_len)]
    m += [(0, 0)]
    m += [(i, i + 1) for i in range(content_len)]
    m += [(0, 0)]
    if pad_to:
        m += [(0, 0)] * (pad_to - len(m))
    return m


def test_drift_is_prompt_end_plus_one():
    m = _mapping(4, 6)
    adjusted, drift = drift_offsets(m)
    assert drift == 5  # last prompt token ends at 4, +1 for [SEP]
    # content char 0 now lives at shifted span (5, 6)
    assert adjusted[6] == [5, 6]
    # special tokens untouched
    assert adjusted[0] == [0, 0] and adjusted[5] == [0, 0]


def test_align_roundtrip_content_chars():
    m = _mapping(4, 6, pad_to=20)
    adjusted, drift = drift_offsets(m)
    # content char c -> token index 6 + c (1 CLS + 4 prompt + 1 SEP)
    for c in range(6):
        assert align_index(c + drift, adjusted) == 6 + c


def test_one_hot_labels_match_span():
    m = _mapping(4, 10, pad_to=24)
    start_ids, end_ids = one_hot_labels([(2, 5)], m, max_seq_len=24)
    # span chars [2,5): start token = 6+2, end token = 6+4
    assert start_ids[8] == 1.0 and sum(start_ids) == 1.0
    assert end_ids[10] == 1.0 and sum(end_ids) == 1.0


def test_inverse_map_restores_char_span():
    m = _mapping(4, 10, pad_to=24)
    adjusted, drift = drift_offsets(m)
    si, ei = 8, 10
    s_char, e_char = spans_from_token_ids(si, ei, adjusted, drift)
    assert (s_char, e_char) == (2, 5)


def test_align_fallback_past_content():
    m = _mapping(2, 3)
    adjusted, drift = drift_offsets(m)
    # char index beyond any token -> last real token index + 1
    last_real = 6  # [CLS] p p [SEP] c c c -> last content token at 6
    assert align_index(99, adjusted) == last_real + 1


def test_multichar_tokens():
    # tokens covering 2 chars each in content ("word-piece" style)
    m = [(0, 0), (0, 2), (0, 0), (0, 2), (2, 4), (0, 0)]
    adjusted, drift = drift_offsets(m)
    assert drift == 3
    # content char 1 -> token 3; char 3 -> token 4
    assert align_index(1 + drift, adjusted) == 3
    assert align_index(3 + drift, adjusted) == 4
