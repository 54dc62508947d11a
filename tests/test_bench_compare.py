"""tools/bench_compare.py — cross-round bench diff (VERDICT r8 #6).

Pure-function tests (no Spark, no files except the committed round
artifacts): the noise-bound flagging rule, shared-subset totals,
exclusive-name reporting, and the r7→r8 regression check against the
numbers VERDICT r8 recomputed by hand (shared-20 total 14.57s →
13.39s, zero beyond-spread regressions).
"""

import json
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)
from bench_compare import compare, load  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def _meas(queries, spread=None):
    return {"queries": queries, "spread": spread or {}}


def test_flags_only_beyond_spread():
    a = _meas({"q1": 1.0, "q2": 1.0}, {"q1": 0.05, "q2": 0.05})
    b = _meas({"q1": 1.04, "q2": 1.30}, {"q1": 0.02, "q2": 0.10})
    out = compare(a, b)
    by = {r["query"]: r for r in out["rows"]}
    # q1's +0.04 is inside max(0.05, 0.02) — weather, not flagged
    assert not by["q1"]["beyond_spread"]
    # q2's +0.30 exceeds max(0.05, 0.10) — a real regression
    assert by["q2"]["beyond_spread"]
    assert out["regressions"] == ["q2"]
    assert out["improvements"] == []


def test_improvement_and_exclusive_names():
    a = _meas({"q1": 2.0, "gone": 1.0}, {"q1": 0.1})
    b = _meas({"q1": 1.0, "new": 0.5}, {"q1": 0.1})
    out = compare(a, b)
    assert out["improvements"] == ["q1"]
    assert out["regressions"] == []
    assert out["only_a"] == ["gone"]
    assert out["only_b"] == ["new"]
    # totals cover the SHARED subset only — 'gone'/'new' excluded
    assert out["total_a_shared"] == 2.0
    assert out["total_b_shared"] == 1.0


def test_missing_spread_defaults_to_zero_bound():
    # pre-r4 artifacts carry no spread: any delta is flagged, which
    # is the conservative reading (no noise evidence => no excuse)
    out = compare(_meas({"q": 1.0}), _meas({"q": 1.001}))
    assert out["rows"][0]["beyond_spread"]


def test_r7_r8_artifacts_match_verdict_numbers():
    a = load(os.path.join(REPO, "BENCH_r07.json"))
    b = load(os.path.join(REPO, "BENCH_r08.json"))
    out = compare(a, b)
    assert len(out["shared"]) == 20
    assert round(out["total_a_shared"], 2) == 14.57
    assert round(out["total_b_shared"], 2) == 13.39
    assert out["regressions"] == []
    assert set(out["only_b"]) == {
        "crawl_front_half",
        "gif_decode_kernel",
    }


def test_cli_exit_codes(tmp_path):
    tool = os.path.join(REPO, "tools", "bench_compare.py")
    ok = tmp_path / "ok.json"
    bad = tmp_path / "bad.json"
    ok.write_text(json.dumps(_meas({"q": 1.0}, {"q": 0.5})))
    bad.write_text(json.dumps(_meas({"q": 2.0}, {"q": 0.5})))
    r = subprocess.run(
        [sys.executable, tool, str(ok), str(ok)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "no beyond-spread" in r.stdout
    r = subprocess.run(
        [sys.executable, tool, str(ok), str(bad)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1 and "REGRESSION" in r.stdout
