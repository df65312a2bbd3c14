"""The external driver builds its OWN SparkSession (no session.py
factory). Every query must still be correct there: registry.load
applies the correctness-critical confs (nanos-as-long, UTC, Arrow) at
runtime. This test reproduces the driver exactly: a fresh subprocess
running the full oracle-compare harness on a bare unconfigured session
(tools/check_correctness.py --plain). Timeout sized to the registry:
256 queries including multi-commit storage workloads run ~11-14 min at
sf0.001 on a busy box."""

import os
import subprocess
import sys


def test_all_queries_match_oracle_on_plain_session():
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools", "check_correctness.py"),
            "--plain",
            "--sf",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    tail = out.stdout.replace("\r", "\n")
    assert "queries ok" in tail and "FAIL" not in tail, (
        tail[-2000:] + out.stderr[-1000:]
    )
    assert out.returncode == 0
