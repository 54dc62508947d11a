"""tools/bench_compare.py — cross-round bench diff (VERDICT r8 #6).

Pure-function tests (no Spark, no files except the committed round
artifacts): the noise-bound flagging rule, shared-subset totals,
exclusive-name reporting, and the r7→r8 regression check against the
numbers VERDICT r8 recomputed by hand (shared-20 total 14.57s →
13.39s, zero beyond-spread regressions).
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

# spec-based load of the single tool file — a sys.path.insert of
# tools/ would let every later-collected test module resolve
# same-named imports to tools/ copies for the whole pytest session
_spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
compare, load = _mod.compare, _mod.load


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


def test_load_rejects_failed_run_and_non_dict(tmp_path):
    import pytest

    null_parsed = tmp_path / "failed.json"
    null_parsed.write_text('{"rc": 1, "parsed": null}')
    with pytest.raises(SystemExit):
        load(str(null_parsed))
    non_dict = tmp_path / "list.json"
    non_dict.write_text("[1, 2]")
    with pytest.raises(SystemExit):
        load(str(non_dict))
    # queries present but not a dict (a stray scalar) also rejects
    bad_q = tmp_path / "badq.json"
    bad_q.write_text('{"queries": 7}')
    with pytest.raises(SystemExit):
        load(str(bad_q))


def test_cli_disjoint_sets_exit_2(tmp_path):
    tool = os.path.join(REPO, "tools", "bench_compare.py")
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps(_meas({"old_q": 1.0})))
    b.write_text(json.dumps(_meas({"new_q": 9.0})))
    r = subprocess.run(
        [sys.executable, tool, str(a), str(b)],
        capture_output=True, text=True,
    )
    # a vacuously-green gate would hide an across-the-board
    # regression behind a rename — disjoint sets are an error
    assert r.returncode == 2
    assert "NO SHARED QUERIES" in r.stdout


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


def test_load_recovers_truncated_tail(tmp_path):
    # r10's artifact clipped the single JSON line at BOTH ends
    # ("parsed": null) — load() must harvest the complete
    # name:number pairs out of the raw tail and drop the clipped
    # ones (VERDICT r10 "What's wrong" #1)
    tail = (
        't": "sec", "queries": {"q_full_a": 1.25, "q_full_b": 0.5, '
        '"q_full_c": 2.0}, "spread": {"q_full_a": 0.1, "q_full_'
    )
    art = tmp_path / "BENCH_rX.json"
    art.write_text(json.dumps(
        {"n": 99, "rc": 0, "parsed": None, "tail": tail}
    ))
    meas = load(str(art))
    assert meas["queries"] == {
        "q_full_a": 1.25, "q_full_b": 0.5, "q_full_c": 2.0
    }
    # the spread dict was cut mid-key: only the whole pair survives
    assert meas["spread"] == {"q_full_a": 0.1}
    assert meas["recovered_from_tail"]


def test_load_real_r10_artifact_recovers_31_queries():
    meas = load(os.path.join(REPO, "BENCH_r10.json"))
    assert len(meas["queries"]) == 31
    assert meas["queries"]["pagerank_crawl_graph"] == 5.922


def test_load_merges_spread_from_tail_for_two_line_format(tmp_path):
    # r11 bench prints spread on its own earlier line; the driver's
    # parsed final line has queries but no spread. load() must
    # harvest spread from the tail or every bound collapses to 0
    # and run-to-run noise flags REGRESSION (review catch)
    tail = (
        '{"spread":{"q1":0.5,"q2":0.1},"passes":3}\n'
        '{"metric":"headline_query_wall_total","value":3.0,'
        '"unit":"sec","queries":{"q1":1.0,"q2":2.0},"sf":"x"}'
    )
    art = tmp_path / "BENCH_rY.json"
    art.write_text(json.dumps({
        "n": 11, "rc": 0,
        "parsed": {"metric": "headline_query_wall_total",
                   "value": 3.0, "unit": "sec",
                   "queries": {"q1": 1.0, "q2": 2.0}, "sf": "x"},
        "tail": tail,
    }))
    meas = load(str(art))
    assert meas["queries"] == {"q1": 1.0, "q2": 2.0}
    assert meas["spread"] == {"q1": 0.5, "q2": 0.1}
    # a 0.02s wobble stays inside the recovered bound
    other = tmp_path / "BENCH_rZ.json"
    other.write_text(json.dumps(_meas(
        {"q1": 1.02, "q2": 1.98}, {"q1": 0.3, "q2": 0.2})))
    out = compare(meas, load(str(other)))
    assert out["regressions"] == [] and out["improvements"] == []
