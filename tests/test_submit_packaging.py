"""North-rule launch contract: the engine runs via spark-submit --py-files
with the packaged zip as the ONLY source of crawler_spark on the executors
and driver (tools/submit.sh)."""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_smoke(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        ["bash", str(REPO / "tools" / "submit.sh"),
         str(REPO / "tools" / "submit_smoke_job.py"), "12"],
        cwd=str(tmp_path),          # NOT the repo: import must hit the zip
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["ok"] and out["waves"] >= 1 and out["cards_ok"] > 0
    assert ".zip" in out["engine_from"], out["engine_from"]
