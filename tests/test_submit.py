"""spark-submit --py-files deployment test (north-rule run mode)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = __file__.rsplit("/tests/", 1)[0]


def _spark_submit() -> str | None:
    """spark-submit from PATH, $SPARK_HOME/bin, the stock install
    location, or the pyspark wheel's own bin/ (where pip installs
    put it — present in this container but not on PATH)."""
    found = shutil.which("spark-submit")
    if found:
        return found
    cands = []
    if os.environ.get("SPARK_HOME"):
        cands.append(os.path.abspath(
            os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")))
    cands.append("/opt/spark/bin/spark-submit")
    try:
        import pyspark
        cands.append(os.path.join(os.path.dirname(pyspark.__file__),
                                  "bin", "spark-submit"))
    except ImportError:
        pass
    for c in cands:
        if os.access(c, os.X_OK):
            return c
    return None


@pytest.mark.skipif(_spark_submit() is None,
                    reason="spark-submit not found")
def test_spark_submit_pyfiles(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run([sys.executable, f"{REPO}/scripts/make_pyfiles.py", zip_path],
                   check=True, capture_output=True)
    out_dir = str(tmp_path / "job_out")

    def run():
        p = subprocess.run(
            [_spark_submit(), "--master", "local[4]", "--py-files", zip_path,
             f"{REPO}/scripts/pip_job.py", "--pages", "20000", "--polys", "20",
             "--out", out_dir],
            check=True, capture_output=True, text=True, cwd=str(tmp_path),
            timeout=240)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    r1 = run()
    assert r1["match_rows"] > 0
    assert r1["points_stage_skipped"] is False

    # second submit resumes from the checkpointed stage
    r2 = run()
    assert r2["match_rows"] == r1["match_rows"]
    assert r2["points_stage_skipped"] is True
