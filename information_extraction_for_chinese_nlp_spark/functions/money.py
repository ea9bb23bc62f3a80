"""F4 — money-string normalization (entity canonicalization key).

From-scratch Chinese-numeral → integer converter with the same contract
as the reference's ArabicNumbersFormatter
(tools/regularize_money_from_csv_results.py:40-153):

- pre-clean: drop 餘, keep only Unicode-alphanumeric chars (so commas,
  dots and spaces vanish — including the reference's documented quirk
  that "1,680.50元" collapses to 168050), strip currency suffixes;
- parse pure Arabic, pure Chinese (traditional or simplified, incl.
  missing-unit forms like 六百二十五 and 八十八), and mixed forms like
  三千500 / 500萬;
- unparseable values -> "nan" (outlier representation), matching the
  reference's fail-case routing.

Pure function + Arrow-batched pandas UDF; no cn2an/opencc dependency.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DIGITS = {
    "零": 0, "〇": 0,
    "一": 1, "壹": 1,
    "二": 2, "貳": 2, "贰": 2, "兩": 2, "两": 2,
    "三": 3, "參": 3, "叁": 3,
    "四": 4, "肆": 4,
    "五": 5, "伍": 5,
    "六": 6, "陸": 6, "陆": 6,
    "七": 7, "柒": 7,
    "八": 8, "捌": 8,
    "九": 9, "玖": 9,
}
_UNITS = {"十": 10, "拾": 10, "百": 100, "佰": 100, "千": 1000, "仟": 1000}
_SECTIONS = {"萬": 10**4, "万": 10**4, "億": 10**8, "亿": 10**8}
_CURRENCY = "元圓圆块塊"

_NON_ALNUM = re.compile(r"[^\w]|_", re.UNICODE)


def _pre_clean(money: str) -> str:
    money = money.replace("餘", "")
    money = _NON_ALNUM.sub("", money)  # reference: filter(str.isalnum)
    return money.rstrip(_CURRENCY)


def parse_money(money: str) -> int:
    """Parse a cleaned money string into an int. Raises ValueError.

    Follows cn2an's 'smart' colloquial rule (the reference converts via
    ``cn2an.cn2an(x, "smart")``): a SINGLE trailing digit right after a
    unit/section char means the next-lower unit — 兩千五 -> 2500,
    五萬三 -> 53000, 一百二 -> 120 — unless a 零 intervenes
    (兩千零五 -> 2005) or the trailing group has several digits
    (三千500 -> 3500, 1萬2000 -> 12000). The rule applies to CHINESE
    digits only: colloquial forms are speech renderings, while a mixed
    trailing Arabic digit (一千1) routes through the reference's
    add-zero-for-missing-unit path and stays positional (-> 1001,
    reference tools/regularize_money_from_csv_results.py:48-87).
    """
    if not money:
        raise ValueError("empty")
    total = 0
    section = 0
    current = 0
    i = 0
    n = len(money)
    seen_number = False
    last_unit = 0       # value of the most recent unit/section char
    tail_digits = 0     # numeral chars accumulated since that unit
    tail_chinese = False
    zero_after_unit = False
    while i < n:
        ch = money[i]
        if ch.isascii() and ch.isdigit():
            j = i
            while j < n and money[j].isascii() and money[j].isdigit():
                j += 1
            current = current * (10 ** (j - i)) + int(money[i:j])
            tail_digits += j - i
            tail_chinese = False
            seen_number = True
            i = j
            continue
        if ch in _DIGITS:
            d = _DIGITS[ch]
            if d == 0:
                # 零 is a positional placeholder; it never accumulates,
                # and it cancels the colloquial missing-unit rule. It
                # still counts as a numeral ("零元" -> 0, cn2an parity).
                zero_after_unit = True
                seen_number = True
                i += 1
                continue
            current = current * 10 + d
            tail_digits += 1
            tail_chinese = True
            seen_number = True
        elif ch in _UNITS:
            if current == 0:
                # forms where cn2an raises and the reference routes the
                # surface to the outlier bucket; accumulating a phantom
                # 1 here would mint a number for garbage that then
                # collides with genuine amounts under one entity key:
                if tail_digits > 0:
                    # explicit zero digits before the unit (0千, 00百)
                    raise ValueError(f"zero value before unit {ch!r} in {money!r}")
                if last_unit and not zero_after_unit:
                    # consecutive unit chars (千千, 五百千)
                    raise ValueError(f"unit {ch!r} directly follows a unit in {money!r}")
                if zero_after_unit and (
                    last_unit == 0 or _UNITS[ch] >= last_unit
                ):
                    # leading 零 before a unit (零千), or 零-interleaved
                    # units that don't DESCEND (一千零千) — the valid
                    # zero-gap family is strictly descending (兩千零十)
                    raise ValueError(f"零 before unit {ch!r} in {money!r}")
            section += (current if current else 1) * _UNITS[ch]
            current = 0
            last_unit = _UNITS[ch]
            tail_digits = 0
            zero_after_unit = False
            seen_number = True
        elif ch in _SECTIONS:
            if section + current == 0:
                # bare/leading section char (萬, 萬五, 零萬): cn2an has no
                # digits to scale, raises, and the reference routes the
                # surface to the outlier — parsing it as 0 would collide
                # with genuine zero amounts under one canonical key.
                # (十萬 stays valid: the 十 branch set section=10.)
                raise ValueError(f"section {ch!r} without digits in {money!r}")
            section = (section + current) * _SECTIONS[ch]
            total += section
            section = 0
            current = 0
            last_unit = _SECTIONS[ch]
            tail_digits = 0
            zero_after_unit = False
            seen_number = True
        else:
            raise ValueError(f"unparseable char {ch!r} in {money!r}")
        i += 1
    if not seen_number:
        raise ValueError(f"no numerals in {money!r}")
    if (
        1 <= current <= 9
        and tail_digits == 1
        and tail_chinese
        and last_unit >= 10
        and not zero_after_unit
    ):
        current *= last_unit // 10
    return total + section + current


def normalize_money(money, outlier: str = "nan") -> str:
    """Full normalization: surface form -> integer string or 'nan'."""
    if money is None:
        return outlier
    s = str(money)
    if s == "nan":
        return outlier
    try:
        return str(parse_money(_pre_clean(s)))
    except ValueError:
        return outlier


@F.pandas_udf(StringType())
def normalize_money_udf(money: pd.Series) -> pd.Series:
    from .worker import pin_worker_threads

    pin_worker_threads()
    return money.map(lambda m: normalize_money(m))
