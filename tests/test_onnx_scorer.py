"""UIEOnnxScorer dataflow with injected fakes: tokenizer-with-offsets ->
int64 feeds -> session probs -> token decode -> char-span mapping.

The fakes mirror the shapes of a HF fast tokenizer and an onnxruntime
session, so the only untested piece in this container is the actual
model weights."""

import numpy as np

from information_extraction_for_chinese_nlp_spark.inference.scorer import (
    UIEOnnxScorer,
)


class CharTokenizer:
    """[CLS] prompt-chars [SEP] content-chars [SEP], identity offsets —
    the shape a fast tokenizer returns for text=prompt, text_pair=content."""

    def __call__(self, prompt: str, content: str):
        n = 1 + len(prompt) + 1 + len(content) + 1
        input_ids = [101] + [ord(c) for c in prompt] + [102] + [
            ord(c) for c in content
        ] + [102]
        offsets = (
            [(0, 0)]
            + [(i, i + 1) for i in range(len(prompt))]
            + [(0, 0)]
            + [(i, i + 1) for i in range(len(content))]
            + [(0, 0)]
        )
        return {
            "input_ids": input_ids,
            "token_type_ids": [0] * (len(prompt) + 2) + [1] * (len(content) + 1),
            "position_ids": list(range(n)),
            "attention_mask": [1] * n,
            "offset_mapping": offsets,
        }


class PointerSession:
    """Fake pointer-head session: marks the configured token positions."""

    def __init__(self, start_at, end_at, p=0.9):
        self.start_at = start_at
        self.end_at = end_at
        self.p = p
        self.feeds_seen = None

    def run(self, _outputs, feeds):
        self.feeds_seen = feeds
        seq = feeds["input_ids"].shape[1]
        sp = np.zeros((1, seq))
        ep = np.zeros((1, seq))
        sp[0, self.start_at] = self.p
        ep[0, self.end_at] = self.p
        return sp, ep


def test_onnx_dataflow_maps_token_span_to_char_span():
    prompt, content = "醫療費用", "支出98,532元整"
    # content char span for "98,532元" is [2, 9)
    # token index of content char c = 1 + len(prompt) + 1 + c = 6 + c
    session = PointerSession(start_at=6 + 2, end_at=6 + 8)
    scorer = UIEOnnxScorer(session, CharTokenizer())
    spans = scorer.extract(content, prompt)
    assert len(spans) == 1
    s, e, p = spans[0]
    assert content[s:e] == "98,532元"
    assert abs(p - 0.81) < 1e-9
    # int64 feeds, batch dim present — the exported graph's input spec
    for name in ("input_ids", "token_type_ids", "position_ids", "attention_mask"):
        assert session.feeds_seen[name].dtype == np.int64
        assert session.feeds_seen[name].shape[0] == 1


def test_onnx_dataflow_thresholds_and_multiple(_=None):
    prompt, content = "薪資收入", "月薪三千500元另計"
    # "三千500元" at chars [2, 8): start token 6+2... prompt len 4 -> base 1+4+1=6
    session = PointerSession(start_at=[6 + 2], end_at=[6 + 7], p=0.6)
    scorer = UIEOnnxScorer(session, CharTokenizer())
    spans = scorer.extract(content, prompt)
    assert [(s, e) for s, e, _p in spans] == [(2, 8)]
    # below-threshold probabilities decode to nothing
    weak = PointerSession(start_at=[6 + 2], end_at=[6 + 7], p=0.4)
    assert UIEOnnxScorer(weak, CharTokenizer()).extract(content, prompt) == []


def test_onnx_out_of_content_span_dropped():
    prompt, content = "醫療費用", "abc"
    # end pointer on the trailing [SEP] (maps outside content) -> dropped
    n = 1 + len(prompt) + 1 + len(content)
    session = PointerSession(start_at=6, end_at=n, p=0.9)
    scorer = UIEOnnxScorer(session, CharTokenizer())
    assert scorer.extract(content, prompt) == []
