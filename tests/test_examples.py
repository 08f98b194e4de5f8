"""The two runnable examples are the user-facing story (quickstart = the
reference app's IDP journey; curation_pipeline = the training-data funnel).
Run them as subprocesses so they can't rot."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / script), *args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_quickstart_runs(tmp_path):
    out = _run("quickstart.py", str(tmp_path))
    assert "class" in out.lower() or out.strip()


def test_curation_pipeline_runs():
    out = _run("curation_pipeline.py", "/root/testdata/sf0.001")
    assert "after decontamination" in out
    assert "packing / mixture report:" in out


def test_warehouse_lifecycle_runs():
    out = _run("warehouse_lifecycle.py", "/root/testdata/sf0.001")
    assert "ivm rollup == recompute: ok" in out
    assert "warehouse lifecycle: complete" in out
