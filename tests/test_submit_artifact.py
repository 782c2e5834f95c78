"""End-to-end packaging test: the literal north-rule invocation —
`spark-submit --py-files <zip> jobs/extract_job.py` — runs the resumable
extraction from a clean artifact (no repo on PYTHONPATH) and reports a
sane JSON summary. This is the exact artifact the scaling criterion
benchmarks at two parallelism levels."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_artifact():
    d = tempfile.mkdtemp(prefix="ocs-submit-")
    zip_path = os.path.join(d, "ocs.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "ocr_suite_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--input", "/root/testdata/sf0.001",
            "--output", f"{d}/out",
            "--checkpoint", f"{d}/ckpt",
            "--n-buckets", "4",
            "--report-interval", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=d,  # NOT the repo — the zip must be self-sufficient
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(
        [line for line in out.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert summary["docs"] == 500
    assert summary["buckets_done"] == 4
    assert summary["quarantined"] == 0
    assert summary["docs_per_sec"] > 0
    # the 5s-cadence reporter produced at least its final line
    assert "[speed]" in out.stdout
    shutil.rmtree(d, ignore_errors=True)
