"""F4 fidelity vs the reference's 8,250-row golden CSV.

The reference ships its own converted money values
(reference utils/final_result_with_correct_money.csv, produced by
tools/regularize_money_from_csv_results.py). Each numeric cell is the
reference converter's OUTPUT; we regenerate realistic raw surfaces for
every value (full Chinese numerals, comma-grouped Arabic + 元, mixed
Arabic/萬 forms) and require normalize_money to recover the reference's
integer for ≥99% of cells, listing every disagreement. The CSV's seven
raw fail-case surfaces (e.g. 26天元, 不固定元) must route to 'nan',
matching the reference's outlier handling
(regularize_money_from_csv_results.py:141-144).
"""

import os

import pandas as pd
import pytest
from test_money_property import render

from information_extraction_for_chinese_nlp_spark.functions.money import (
    normalize_money,
)

GOLDEN_CSV = "/root/reference/utils/final_result_with_correct_money.csv"
MONEY_COLS = ["精神慰撫金額", "醫療費用", "薪資收入"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_CSV), reason="reference golden CSV not present"
)


def _cells():
    df = pd.read_csv(GOLDEN_CSV, low_memory=False)
    numeric, fail_cases = [], []
    for c in MONEY_COLS:
        for v in df[c].dropna():
            s = str(v)
            try:
                f = float(s)
            except ValueError:
                fail_cases.append(s)
                continue
            assert f == int(f), f"golden value not integral: {v!r}"
            numeric.append(int(f))
    return numeric, fail_cases


def _surfaces(n: int):
    """Raw surface forms a verdict could contain for integer n."""
    forms = [f"{n:,}元"]
    if n > 0:
        forms.append(render(n) + "元")  # full Chinese numerals
        if n >= 10000:
            high, low = divmod(n, 10000)
            forms.append(f"{high}萬{low}元" if low else f"{high}萬元")
    else:
        forms.append("零元")
    return forms


def test_golden_csv_roundtrip_parity():
    numeric, fail_cases = _cells()
    assert len(numeric) > 17000, "golden CSV should contribute >17k cells"

    disagreements = []
    for n in numeric:
        expected = str(n)
        for raw in _surfaces(n):
            got = normalize_money(raw)
            if got != expected:
                disagreements.append((raw, expected, got))

    total = sum(len(_surfaces(n)) for n in numeric)
    parity = 1.0 - len(disagreements) / total
    assert parity >= 0.99, (
        f"parity {parity:.4f} over {total} surfaces; first disagreements: "
        f"{disagreements[:20]}"
    )
    # report exact parity in -v output even when passing
    print(f"golden-CSV parity: {parity:.6f} over {total} surfaces, "
          f"{len(disagreements)} disagreements: {disagreements[:10]}")


def test_golden_csv_fail_cases_route_to_nan():
    _, fail_cases = _cells()
    assert len(fail_cases) >= 5  # the CSV's known raw outlier surfaces
    for raw in fail_cases:
        assert normalize_money(raw) == "nan", raw


def test_golden_csv_idempotent_on_converted_values():
    numeric, _ = _cells()
    for n in numeric:
        assert normalize_money(str(n)) == str(n)
