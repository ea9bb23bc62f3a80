"""Property test: an independent int->Chinese-numeral renderer round-trips
through parse_money for the full supported range."""

from hypothesis import given, settings
from hypothesis import strategies as st

from information_extraction_for_chinese_nlp_spark.functions.money import (
    normalize_money,
    parse_money,
)

DIG = "零一二三四五六七八九"
UNITS = ["", "十", "百", "千"]


def render_section(n: int) -> str:
    """0 < n <= 9999 -> Chinese with internal zero markers (305 -> 三百零五)."""
    digits = [int(d) for d in str(n)]
    out = []
    pending_zero = False
    for i, d in enumerate(digits):
        unit = UNITS[len(digits) - 1 - i]
        if d == 0:
            pending_zero = True
            continue
        if pending_zero and out:
            out.append("零")
        pending_zero = False
        out.append(DIG[d] + unit)
    return "".join(out)


def render(n: int) -> str:
    """1 <= n < 10^12 -> Chinese numeral string (億/萬 sections)."""
    assert 1 <= n < 10**12
    sections = [
        (n // 10**8, "億"),
        (n // 10**4 % 10**4, "萬"),
        (n % 10**4, ""),
    ]
    out = []
    emitted = False
    for value, unit in sections:
        if value == 0:
            continue
        # zero marker when a higher section was emitted and this section
        # has a leading gap (e.g. 一億零一, 一萬零五)
        width = 4 if unit != "億" else len(str(sections[0][0]))
        if emitted and len(str(value)) < width:
            out.append("零")
        out.append(render_section(value) + unit)
        emitted = True
    return "".join(out)


@given(st.integers(1, 10**12 - 1))
@settings(max_examples=500, deadline=None)
def test_roundtrip_chinese(n):
    assert parse_money(render(n)) == n


@given(st.integers(1, 10**12 - 1))
@settings(max_examples=200, deadline=None)
def test_roundtrip_arabic_with_separators(n):
    assert normalize_money(f"{n:,}元") == str(n)


@given(st.integers(1, 9999), st.integers(1, 999))
@settings(max_examples=200, deadline=None)
def test_roundtrip_mixed(thousands_part, low):
    # mixed form like 三千500: chinese thousands digit + arabic remainder
    k = thousands_part % 10
    if k == 0:
        return
    mixed = DIG[k] + "千" + str(low)
    assert parse_money(mixed) == k * 1000 + low
