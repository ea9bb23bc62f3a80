"""north_rule contract: the pipeline runs via `spark-submit --py-files`
on a multi-executor master (local-cluster = real separate executor JVMs)."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(__import__("pyspark").__file__), "bin", "spark-submit"
)


@pytest.mark.slow
def test_spark_submit_pyfiles_multi_executor(tmp_path):
    from scripts.package import build

    zip_path = build(str(tmp_path / "ie_spark.zip"))
    warehouse = str(tmp_path / "wh")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local-cluster[2,2,2048]",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--synth-convs", "60",
        "--warehouse", warehouse,
        "--resume", "--n-buckets", "8",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                         cwd=str(tmp_path))  # cwd outside repo: zip must provide the pkg
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["edges"] > 0
    assert metrics["vertices"] > 0
    assert metrics["canonical_edges"] == metrics["edges"]
    rm = metrics["resume_metrics"]
    assert rm["buckets_done"] == 8 and rm["buckets_pending"] == 0
    assert rm["rows_acked"] == metrics["edges"]
    # second submit with same warehouse: everything watermarked, no rework
    out2 = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          cwd=str(tmp_path))
    assert out2.returncode == 0, out2.stderr[-3000:]
    m2 = json.loads([l for l in out2.stdout.splitlines() if l.startswith("{")][-1])
    assert m2["edges"] == 0  # nothing pending
    assert m2["canonical_edges"] == metrics["edges"]

# e2e / streaming / property-heavy: excluded from the fast inner-loop tier
pytestmark = pytest.mark.slow
