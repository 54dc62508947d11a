"""examples/scheduled_etl.py — the cron-shaped drain-and-exit entry
point (reference analog: .github/workflows/main.yml's daily batch).
Pinned here: exactly-once across two invocations (the second run
re-reads nothing), the no-op cheapness contract, and the
single-flight lock's exit code."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
SCRIPT = os.path.join(REPO, "examples", "scheduled_etl.py")


def _run(*args):
    return subprocess.run(
        [sys.executable, SCRIPT, *args],
        capture_output=True, text=True, timeout=540,
    )


def test_two_runs_are_exactly_once(tmp_path):
    wd = str(tmp_path / "state")
    r1 = _run("--workdir", wd, "--demo-drop")
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert "fact table now 16 rows" in r1.stdout
    # second scheduled tick: nothing new in landing — the checkpoint
    # must prevent any re-read, leaving the fact table unchanged
    r2 = _run("--workdir", wd)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "fact table now 16 rows" in r2.stdout


def test_overlapping_run_exits_3(tmp_path):
    import fcntl

    wd = str(tmp_path / "state")
    os.makedirs(wd, exist_ok=True)
    lock = open(os.path.join(wd, ".run_lock"), "w")
    fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        r = _run("--workdir", wd)
        assert r.returncode == 3, r.stdout + r.stderr
        assert "another run holds the lock" in r.stdout
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()
