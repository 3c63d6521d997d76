"""Stale-evidence gate (VERDICT r5 item 6).

The per-round artifacts CORRECTNESS_SELF.json and BENCH/PLANS.md are
only evidence if they were regenerated AT the code they describe.
This check fails when either artifact's last git commit predates the
newest commit touching the source surfaces they summarize
(``peakmatch_xcorr_spark/``, ``__spark_entry__.py``) — so a close-out
round cannot ship stale evidence.  Same-commit updates pass (>=).

Usage: ``python tools/release_check.py`` (exit 0 = fresh) — also run
as a pytest gate in tests/test_release_check.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCES = ["peakmatch_xcorr_spark", "__spark_entry__.py"]
ARTIFACTS = ["CORRECTNESS_SELF.json", "BENCH/PLANS.md"]


def _last_commit_ts(paths: list[str]) -> int | None:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", *paths],
        cwd=REPO, capture_output=True, text=True,
    )
    s = out.stdout.strip()
    return int(s) if s else None


def check() -> list[str]:
    src_ts = _last_commit_ts(SOURCES)
    if src_ts is None:
        return []  # not a git checkout (e.g. an exported zip): no gate
    problems = []
    for art in ARTIFACTS:
        ts = _last_commit_ts([art])
        if ts is None:
            problems.append(f"{art}: never committed")
        elif ts < src_ts:
            problems.append(
                f"{art}: last committed before the newest source commit "
                f"({ts} < {src_ts}) — regenerate it at HEAD"
            )
    return problems


if __name__ == "__main__":
    probs = check()
    for p in probs:
        print(f"STALE {p}")
    if not probs:
        print("release_check: artifacts fresh")
    sys.exit(1 if probs else 0)
