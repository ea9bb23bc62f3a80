import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from information_extraction_for_chinese_nlp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ie-kg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


# A reference-style verdict snippet (same shape as the reference fixture
# tests/conftest.py:4-8 / tests/data/example_model_input_data.txt, written
# fresh): long CJK text with embedded money mentions and scrub targets.
VERDICT = (
    "原告主張因系爭事故受有傷害，\n支出醫療費用98,532元，"
    "　並請求精神慰撫金額八萬元；\\n另原告每月薪資收入三千500元，"
    "業據提出診斷證明書及薪資單為證。 被告對此不爭執。"
)


def pytest_collection_modifyitems(config, items):
    # two-tier suite (VERDICT r4 task 10): everything not explicitly
    # slow is the fast inner-loop tier — `pytest -m fast` stays under
    # ~2 min; `pytest -m slow` is the e2e/streaming/property tier; no
    # marker filter runs both (CI default).
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
