"""R2 chunking semantics (reference utils/data_utils.py:9-87)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_for_chinese_nlp_spark.functions.chunking import (
    ChunkDataError,
    chunk_content,
)


def test_first_window_width_matches_reference():
    # Golden rule from the reference test (tests/utils/test_data_utils.py:44-56):
    # first chunk == content[:max_seq_len - len(prompt) - 3]
    content = "x" * 100
    prompt = "醫療費用"
    chunks = chunk_content(content, prompt, max_seq_len=50)
    width = 50 - len(prompt) - 3
    assert chunks[0][1] == content[:width]
    assert [c[0] for c in chunks] == list(range(0, 100, width))


def test_max_seq_len_too_small_raises():
    with pytest.raises(ValueError):
        chunk_content("abc", "p" * 10, max_seq_len=13)


def test_invalid_span_start_after_end():
    # Mirrors the reference error fixture (start 19 > end 13).
    with pytest.raises(ChunkDataError):
        chunk_content("x" * 30, "p", max_seq_len=20, spans=[(19, 13, "bad")])


def test_result_cross_shrinks_window():
    # Window base = 10; span [8, 12) would straddle the boundary, so the
    # first window shrinks to end at 8 and the span lands whole in window 2.
    content = "0123456789abcdefghij"
    spans = [(8, 12, "89ab")]
    chunks = chunk_content(content, "p", max_seq_len=14, spans=spans)  # base=10
    assert chunks[0] == (0, "01234567", [])
    assert chunks[1][0] == 8
    assert chunks[1][2] == [(0, 4, "89ab")]
    piece = chunks[1][1]
    assert piece[0:4] == "89ab"


def test_spans_distributed_to_correct_chunks():
    content = "".join(chr(ord("a") + i % 26) for i in range(40))
    spans = [(2, 5, content[2:5]), (12, 15, content[12:15]), (33, 36, content[33:36])]
    chunks = chunk_content(content, "pp", max_seq_len=15, spans=spans)  # base=10
    flat = []
    for cs, piece, local in chunks:
        for s, e, t in local:
            assert piece[s:e] == t
            flat.append((cs + s, cs + e, t))
    assert flat == spans


def test_overlong_span_raises():
    with pytest.raises(ChunkDataError):
        chunk_content("x" * 50, "p", max_seq_len=14, spans=[(0, 20, "x" * 20)])


def test_empty_content_yields_nothing():
    assert chunk_content("", "p", max_seq_len=20) == []


def test_leading_whitespace_preserves_offsets():
    # content is NOT stripped: offsets stay absolute (a leading \t survives
    # the scrub list, and spans are defined on the unstripped text)
    content = "\txx98532元yy"
    spans = [(3, 9, "98532元")]
    chunks = chunk_content(content, "p", max_seq_len=64, spans=spans)
    assert chunks[0][1][3:9] == "98532元"


@given(
    st.integers(20, 400),  # content length
    st.integers(1, 8),  # prompt length
    st.integers(0, 6),  # number of spans
    st.randoms(use_true_random=False),
)
@settings(max_examples=200, deadline=None)
def test_property_reconstruction(n, plen, k, rng):
    """Chunks concatenate back to the content; every span round-trips and
    every gold span appears exactly once, unsplit."""
    content = "".join(chr(ord("a") + rng.randrange(26)) for _ in range(n))
    base = 64 - plen - 3
    spans = []
    cursor = 0
    for _ in range(k):
        if cursor >= n - 2:
            break
        s = cursor + rng.randrange(1, 5)
        length = rng.randrange(1, min(base, 9))
        e = min(s + length, n)
        if s >= n or s >= e:
            break
        spans.append((s, e, content[s:e]))
        cursor = e
    chunks = chunk_content(content, "p" * plen, max_seq_len=64, spans=spans)
    assert "".join(piece for _, piece, _ in chunks) == content
    rebuilt = []
    for cs, piece, local in chunks:
        for s, e, t in local:
            assert piece[s:e] == t
            rebuilt.append((cs + s, cs + e, t))
    assert rebuilt == spans


def test_span_beyond_content_quarantines_not_drops(spark):
    """A gold span starting at/after len(content) cannot round-trip:
    silently dropping it loses the label invisibly — it must raise
    ChunkDataError (pure fn) and quarantine (UDF), like every data
    error."""
    import pytest
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.functions.chunking import (
        ChunkDataError,
        chunk_content,
        make_chunk_udf,
    )

    # start beyond every emitted window -> the unconsumed-span check
    with pytest.raises(ChunkDataError, match="beyond content"):
        chunk_content("short", "p", 64, [(70, 72, "xx")])
    # start inside the window but past the text -> round-trip check
    with pytest.raises(ChunkDataError, match="round-trip"):
        chunk_content("short", "p", 64, [(10, 12, "xx")])

    df = spark.createDataFrame([(0, "short", 70, 72)],
                               "vid long, text string, s int, e int")
    spans = F.array(F.struct(
        F.col("s").alias("start"), F.col("e").alias("end"),
        F.lit("xx").alias("text")))
    udf = make_chunk_udf(max_seq_len=64)
    out = df.withColumn("_c", udf(F.col("text"), F.lit(""), spans)).first()
    assert out._c is None  # routed to quarantine, task alive


def test_null_span_fields_quarantine(spark):
    """NULL start/end inside a span struct (int(None) -> TypeError) is a
    data error: quarantine, don't kill the task."""
    from pyspark.sql import functions as F

    from information_extraction_for_chinese_nlp_spark.functions.chunking import (
        make_chunk_udf,
    )

    df = spark.createDataFrame([(0, "some text here")], "vid long, text string")
    spans = F.array(F.struct(
        F.lit(None).cast("int").alias("start"),
        F.lit(None).cast("int").alias("end"),
        F.lit("x").alias("text")))
    udf = make_chunk_udf(max_seq_len=64)
    assert df.withColumn("_c", udf(F.col("text"), F.lit(""), spans)).first()._c is None
