"""Job-CLI behavior that only shows up in a real process: SIGTERM
graceful shutdown mid-run (T5 end-to-end through the signal handler, not
just the stop_requested hook) and the curate funnel CLI."""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def d():
    d = tempfile.mkdtemp(prefix="ocs-jobcli-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return env


def test_extract_job_sigterm_graceful_then_resume(d):
    """SIGTERM mid-run: the job finishes the in-flight bucket group,
    commits it, prints the shutdown notice, exits 0. A second run resumes
    and completes without redoing committed groups."""
    args = [
        sys.executable, os.path.join(REPO, "jobs", "extract_job.py"),
        "--input", "/root/testdata/sf0.001",
        "--output", f"{d}/out", "--checkpoint", f"{d}/ckpt",
        "--n-buckets", "16", "--bucket-groups", "16",
        "--report-interval", "0",
    ]
    p = subprocess.Popen(
        args, env=_env(), cwd=d, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    # wait for the first bucket group to COMMIT (progress table appears),
    # then request shutdown — deterministic "mid-run", no sleep guessing
    progress = f"{d}/ckpt/progress"
    deadline = time.time() + 300
    while time.time() < deadline and not os.path.exists(progress):
        if p.poll() is not None:
            pytest.fail("job exited before first group committed")
        time.sleep(0.2)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out[-2000:]
    assert "[shutdown]" in out
    summary = json.loads([line for line in out.splitlines() if line.startswith("{")][-1])
    assert 1 <= summary["buckets_done"] <= 16

    out2 = subprocess.run(
        args, env=_env(), cwd=d, capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    summary2 = json.loads(
        [line for line in out2.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert summary2["docs"] == 500
    assert summary2["buckets_done"] == 16
    # committed groups were not redone: every bucket has exactly ONE done
    # row in the progress table — a resume that recomputed the first run's
    # buckets would have appended a second row for them
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT bucket, COUNT(*) AS n FROM read_parquet('{d}/ckpt/progress/*.parquet')"
        " WHERE status = 'done' GROUP BY bucket"
    ).fetchall()
    assert len(rows) == 16
    redone = [b for b, n in rows if n != 1]
    assert redone == [], f"buckets re-committed on resume: {redone}"


def test_curate_job_cli(d):
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001", "--output", f"{d}/cur",
        ],
        env=_env(), cwd=d, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(
        [line for line in out.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert summary["input"] == 500
    assert 0 < summary["after_mixture"] < summary["input"]
    assert os.path.exists(f"{d}/cur/survivors") and os.path.exists(f"{d}/cur/packed")


def test_extract_job_spark_submit_py_files(d):
    """The north rule's literal ship vehicle: the engine zipped and run
    via `spark-submit --py-files` (not `python`) — proves the artifact is
    self-contained (no repo-cwd imports) and the job completes end-to-end
    under spark-submit's launcher."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zip_path = f"{d}/ocs.zip"
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", zip_path, "ocr_suite_spark"],
        cwd=REPO, check=True,
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    out = subprocess.run(
        [
            spark_submit, "--master", "local[8]", "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--input", "/root/testdata/sf0.001",
            "--output", f"{d}/out", "--checkpoint", f"{d}/ckpt",
            "--n-buckets", "8", "--bucket-groups", "2",
            "--report-interval", "0",
        ],
        env=env, cwd=d, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    summary = json.loads(
        [line for line in out.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert summary["docs"] == 500 and summary["buckets_done"] == 8
