"""End-to-end spark-submit packaging test (north-rule requirement:
"packaged for spark-submit --py-files"): build dist/dagli_spark.zip, launch
the example job through the real spark-submit from a neutral cwd so the
package resolves ONLY through --py-files, and check the output + the
zero-leakage audit the job prints."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_smoke(tmp_path):
    subprocess.run([sys.executable, os.path.join(REPO, "package.py")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "dagli_spark.zip")
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "nr_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", zip_path,
         os.path.join(REPO, "examples", "northrule_job.py"),
         "--scale", "smoke", "--output", out_dir],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    audit = json.loads(proc.stdout.strip().splitlines()[-1])
    assert audit["violations"] == 0
    assert audit["rows"] > 0
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))


def test_feature_pipeline_demo_runs():
    """The library-tour example (examples/feature_pipeline_demo.py) runs
    end to end and emits feature rows."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "feature_pipeline_demo.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "feature rows: " in r.stdout
