"""The plan-audit tool: correct flags on a known-clean and a
known-justified-BNLJ query, partial artifact elsewhere."""

from __future__ import annotations

import os
import subprocess
import sys


def test_audit_flags_and_artifact(tmp_path, spark):
    out = tmp_path / "PLANS.md"
    env = dict(
        os.environ,
        PYTHONPATH="/root/repo",
        SPARK_GRAFT_AUDIT_ONLY="tpch_q1,cosine_pairs",
        SPARK_GRAFT_AUDIT_OUT=str(out),
    )
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/plan_audit.py"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "flagged: none" in r.stdout
    md = out.read_text()
    assert "| tpch_q1 |" in md
    # cosine_pairs is the documented all-pairs anchor: BNLJ present
    # but justified, so the summary stays clean
    assert "| cosine_pairs |" in md and "justified" in md
    assert "unjustified BNLJ: none" in md
