"""Cluster deployment-shape smoke: the north rule says the engine runs
via `spark-submit --py-files <zip> job.py` on a multi-executor cluster.
This test proves the exact submission artifact works: it builds the
distribution zip with `tools/package_pyfiles.py`, then launches
`spark-submit` from a CLEAN working directory (no repo on sys.path, no
PYTHONPATH) so the package can ONLY be imported from the `--py-files`
zip — the same import path a remote executor/driver has on a real
cluster. Asserts the crawl drains, emits sane JSON metrics, and that a
re-run against the same warehouse resumes instead of re-fetching."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit")


def _run_job(zip_path, workdir, fx, wh, extra=()):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    # Submit a COPY of job.py that lives inside the clean workdir: Python
    # puts the submitted script's directory at sys.path[0], so submitting
    # ROOT/job.py would let driver-side imports silently resolve from the
    # checkout instead of the zip.
    job_copy = os.path.join(workdir, "job.py")
    if not os.path.exists(job_copy):
        shutil.copyfile(os.path.join(ROOT, "job.py"), job_copy)
    cmd = [SUBMIT, "--master", "local[4]",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--conf", "spark.ui.enabled=false",
           "--conf", f"spark.local.dir={workdir}/spark-local",
           "--py-files", zip_path,
           job_copy,
           "--fixtures", fx, "--warehouse", wh,
           "--n-buckets", "8", "--expected-urls", str(1 << 14),
           *extra]
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    payload = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("{")]
    assert payload, proc.stdout[-2000:]
    return json.loads(payload[-1])


@pytest.mark.skipif(SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_smoke_and_resume(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_pyfiles.py"),
         str(tmp_path / "pkg.zip")],
        capture_output=True, text=True, check=True).stdout.strip()
    # the zip must be self-contained: package sources only, no tests
    import zipfile
    names = zipfile.ZipFile(zip_path).namelist()
    assert all(n.startswith("ai_intel_web_scraper_spark/") for n in names)
    assert any(n.endswith("crawl/scheduler.py") for n in names)

    workdir = tmp_path / "clean-cwd"
    workdir.mkdir()
    fx, wh = str(tmp_path / "fx"), str(tmp_path / "wh")

    # Run 1: synthesize a tiny seeded web, stop after 2 rounds (a
    # mid-crawl interruption).
    first = _run_job(zip_path, str(workdir), fx, wh,
                     extra=("--synth-pages", "120", "--synth-hosts", "5",
                            "--max-rounds", "2"))
    assert first["rounds"] == 2
    assert 0 < first["fetched"] <= first["url_seen"]

    # Run 2: same warehouse, no re-synth — must RESUME from the snapshot
    # (strictly more fetched, never re-fetching: monotone url_seen) and
    # drain the frontier. Not all 120 pages are fetchable — robots rules,
    # exclude patterns, and unreachable nodes are part of the fixture.
    second = _run_job(zip_path, str(workdir), fx, wh)
    assert second["fetched"] > first["fetched"]
    assert second["url_seen"] >= first["url_seen"]
    assert second["snapshot"] != first["snapshot"]

    # Run 3: the frontier is drained — resuming at the fixed point must
    # fetch NOTHING new (the url_seen sidecar + anti-join contract).
    third = _run_job(zip_path, str(workdir), fx, wh)
    assert third["fetched"] == second["fetched"]
    assert third["url_seen"] == second["url_seen"]
