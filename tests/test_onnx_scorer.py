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


class BatchPointerSession:
    """Fake session that marks one span per row (wherever the digits
    sit) and counts forward passes."""

    def __init__(self, p=0.9):
        self.p = p
        self.n_runs = 0
        self.shapes = []

    def run(self, _outputs, feeds):
        self.n_runs += 1
        ids = feeds["input_ids"]
        self.shapes.append(ids.shape)
        sp = np.zeros(ids.shape)
        ep = np.zeros(ids.shape)
        for i, row in enumerate(ids):
            digit_pos = [j for j, t in enumerate(row) if ord("0") <= t <= ord("9")]
            if digit_pos:
                sp[i, digit_pos[0]] = self.p
                ep[i, digit_pos[-1]] = self.p
        return sp, ep


def test_extract_batch_single_forward_pass():
    """A batch of variable-length items is padded+stacked and scored by
    exactly ONE session.run; every row decodes independently."""
    session = BatchPointerSession()
    scorer = UIEOnnxScorer(session, CharTokenizer())
    prompt = "醫療費用"
    contents = ["支出98,532元", "費用700元整", "無金額", "x" * 40 + "12元"]
    results = scorer.extract_batch([(c, prompt) for c in contents])

    assert session.n_runs == 1
    # feeds padded to the longest row, batch axis = n items
    assert session.shapes[0][0] == len(contents)
    assert session.shapes[0][1] == 1 + len(prompt) + 1 + max(map(len, contents)) + 1
    assert [len(r) for r in results] == [1, 1, 0, 1]
    (s, e, _p) = results[0][0]
    assert contents[0][s:e] == "98,532"
    (s, e, _p) = results[3][0]
    assert contents[3][s:e] == "12"


class PoisonTokenizer(CharTokenizer):
    """Raises on contents containing the poison marker — the zh
    tokenizer bug class the reference guards against
    (utils/data_utils.py:183-198)."""

    def __call__(self, prompt: str, content: str):
        if "☠" in content:
            raise RuntimeError("tokenizer bug")
        return super().__call__(prompt, content)


def test_tokenizer_crash_fallback_batch_survives():
    """A raising tokenizer must not kill the batch: the poisoned item is
    re-tokenized as "無文本" (reference fallback), decodes to an EMPTY
    span list, is recorded in last_failed, and the batch still runs in
    ONE forward pass with every healthy item decoded normally."""
    session = BatchPointerSession()
    scorer = UIEOnnxScorer(session, PoisonTokenizer())
    prompt = "醫療費用"
    contents = ["支出98,532元", "poison☠98元", "費用700元整"]
    results = scorer.extract_batch([(c, prompt) for c in contents])

    assert session.n_runs == 1
    assert scorer.last_failed == [1]
    assert [len(r) for r in results] == [1, 0, 1]
    s, e, _p = results[0][0]
    assert contents[0][s:e] == "98,532"
    s, e, _p = results[2][0]
    assert contents[2][s:e] == "700"


def test_tokenizer_crash_routes_doc_to_quarantine_row():
    """_score_chunk_items emits a sentinel row (NULL span_text /
    probability, start=end=-1) for the quarantined chunk — routed, not
    lost — while healthy docs score normally."""
    from information_extraction_for_chinese_nlp_spark.inference.scorer import (
        EXTRACTION_COLUMNS,
        _score_chunk_items,
    )

    scorer = UIEOnnxScorer(BatchPointerSession(), PoisonTokenizer())
    prompt = "醫療費用"
    metas = [
        ("d0", 0, 0, "支出98,532元", prompt),
        ("dbad", 0, 0, "poison☠98元", prompt),
        ("d2", 0, 0, "費用700元整", prompt),
    ]
    rows = _score_chunk_items(scorer, metas, limit=0.5, serving_batch_size=64)
    by_doc = {r[0]: r for r in rows}
    assert set(by_doc) == {"d0", "dbad", "d2"}
    bad = by_doc["dbad"]
    assert dict(zip(EXTRACTION_COLUMNS, bad))["probability"] is None
    assert dict(zip(EXTRACTION_COLUMNS, bad))["span_text"] is None
    assert dict(zip(EXTRACTION_COLUMNS, bad))["start"] == -1
    # healthy rows keep real probabilities
    assert dict(zip(EXTRACTION_COLUMNS, by_doc["d0"]))["probability"] > 0.5
    # sub-batch boundaries must not confuse last_failed indexing
    rows2 = _score_chunk_items(
        UIEOnnxScorer(BatchPointerSession(), PoisonTokenizer()),
        metas, limit=0.5, serving_batch_size=1,
    )
    assert {r[0] for r in rows2 if r[7] is None} == {"dbad"}


def test_quarantine_split_helpers(spark):
    from information_extraction_for_chinese_nlp_spark.inference.scorer import (
        EXTRACTION_DDL,
        ok_extractions,
        quarantined_extractions,
    )

    df = spark.createDataFrame(
        [
            ("d0", 0, 0, "醫療費用", "98元", 2, 5, 0.9),
            ("dbad", 0, 0, "醫療費用", None, -1, -1, None),
            ("dbad", 1, 40, "薪資收入", None, -1, -1, None),
        ],
        EXTRACTION_DDL,
    )
    q = quarantined_extractions(df).collect()
    assert {(r.doc_id, r.chunk_idx) for r in q} == {("dbad", 0), ("dbad", 1)}
    ok = ok_extractions(df).collect()
    assert [r.doc_id for r in ok] == ["d0"]


def test_fused_map_one_forward_pass_per_arrow_batch():
    """make_extract_map must score ALL chunks of an Arrow batch through
    extract_batch (≤ ceil(n_chunks / serving_batch_size) forward
    passes), never chunk-at-a-time — the reference's batch_size=16
    serving contract (run_infer.py:110)."""
    import pandas as pd

    from information_extraction_for_chinese_nlp_spark.inference import scorer as S

    prompt = "醫療費用"
    session = BatchPointerSession()
    key = ("fake-batch", (prompt,), None, 64)
    S._ENCODER_CACHE[key] = UIEOnnxScorer(session, CharTokenizer())
    try:
        fn = S.make_extract_map("fake-batch", [prompt], max_seq_len=64,
                                serving_batch_size=128)
        pdf = pd.DataFrame(
            {"doc_id": [f"d{i}" for i in range(12)],
             "text": [f"支出{i}00元整" for i in range(12)]}
        )
        out = pd.concat(list(fn(iter([pdf]))))
        assert session.n_runs == 1, f"{session.n_runs} forward passes for one batch"
        assert len(out) == 12
        assert set(out["doc_id"]) == {f"d{i}" for i in range(12)}
        # sub-batching kicks in when the batch exceeds serving_batch_size
        session2 = BatchPointerSession()
        S._ENCODER_CACHE[key] = UIEOnnxScorer(session2, CharTokenizer())
        fn2 = S.make_extract_map("fake-batch", [prompt], max_seq_len=64,
                                 serving_batch_size=5)
        pd.concat(list(fn2(iter([pdf]))))
        assert session2.n_runs == 3  # ceil(12 / 5)
    finally:
        S._ENCODER_CACHE.pop(key, None)
