"""Pytest gate for the stale-evidence check (VERDICT r5 item 6):
CORRECTNESS_SELF.json and BENCH/PLANS.md must be committed at (or
after) the newest source commit.  Uncommitted source edits are fine —
the gate compares commit timestamps, so it binds exactly when a round
is being closed out."""

from __future__ import annotations


def test_committed_artifacts_not_stale():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import release_check

    assert release_check.check() == []
