"""F4 money normalization golden cases (FIXTURES.md F5; semantics of
reference tools/regularize_money_from_csv_results.py:40-153)."""

import pytest

from information_extraction_for_chinese_nlp_spark.functions.money import (
    normalize_money,
    parse_money,
)

CASES = [
    # pure Arabic with separators
    ("98,532元", "98532"),
    ("1,680元", "1680"),
    ("10000元", "10000"),
    ("2,954元", "2954"),
    # pure Chinese
    ("一萬五千元", "15000"),
    ("八萬元", "80000"),
    ("六百二十五元", "625"),
    ("八十八元", "88"),
    ("七百元", "700"),
    ("五萬三千元", "53000"),
    ("十五元", "15"),
    ("兩千元", "2000"),
    ("一億二千萬元", "120000000"),
    ("三百零五元", "305"),
    ("一千零一元", "1001"),
    # mixed Arabic + Chinese
    ("三千500元", "3500"),
    ("三千500", "3500"),
    ("3千5百元", "3500"),
    ("500萬元", "5000000"),
    ("1萬2000元", "12000"),
    # 餘 dropped before parsing (reference :136)
    ("五萬餘元", "50000"),
    # the reference's alnum-strip quirk: decimals collapse
    ("1,680.50元", "168050"),
    # simplified + formal numerals
    ("一万五千元", "15000"),
    ("伍佰元", "500"),
    # outliers
    ("nan", "nan"),
    ("不明", "nan"),
    ("", "nan"),
    (None, "nan"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_money(raw, expected):
    assert normalize_money(raw) == expected


def test_parse_money_rejects_garbage():
    with pytest.raises(ValueError):
        parse_money("abc")
    with pytest.raises(ValueError):
        parse_money("")


def test_bare_section_routes_to_outlier():
    """'萬'/'億' with no preceding digits: cn2an raises and the reference
    routes the surface to 'nan' — parsing 0 would collide with genuine
    zero amounts (tools/regularize_money_from_csv_results.py:131-140)."""
    from information_extraction_for_chinese_nlp_spark.functions.money import (
        normalize_money,
    )

    assert normalize_money("萬餘元") == "nan"
    assert normalize_money("萬五") == "nan"
    assert normalize_money("億") == "nan"
    assert normalize_money("零萬") == "nan"
    # unit-led sections remain valid
    assert normalize_money("十萬元") == "100000"
    assert normalize_money("一億零五萬") == "100050000"
