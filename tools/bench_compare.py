"""Cross-round bench diff (VERDICT r8 "Next round" #6).

    python tools/bench_compare.py BENCH_r07.json BENCH_r08.json

The headline set has grown across rounds (13 → 20 → 22 → ...), so
comparing totals across rounds is meaningless; every verdict has been
recomputing the shared-subset total by hand. This tool does that
arithmetic mechanically:

- accepts either a driver-wrapped ``BENCH_r*.json`` (the measurement
  under ``"parsed"``) or a raw ``bench.py`` output line saved to a
  file — both carry ``queries`` (min-of-3 per query) and ``spread``
  (max−min per query, present since r4);
- prints per-query deltas over the SHARED name set, flagging only
  deltas exceeding the larger of the two spreads (bench noise at
  sf0.1 swings 12-18s total run-to-run — a delta inside the spread
  is weather, not a regression);
- prints the shared-subset totals and the names each side carries
  alone, so "the total went up" can be split into "queries got
  slower" vs "the set grew".

Exit status 1 iff any shared query regressed beyond its spread bound
(so CI or a round script can gate on it). No Spark, no repo imports —
runnable against artifacts from any checkout.
"""

from __future__ import annotations

import json
import re
import sys


def _recover_from_tail(tail: str) -> dict:
    """Best-effort reconstruction of {queries, spread} from a
    TRUNCATED stdout tail (r10's artifact clipped the single JSON
    line at both ends — VERDICT r10 "What's wrong" #1). Anchors on
    the dict keys and harvests every complete "name": number pair;
    pairs cut mid-key/mid-value at the window edge are dropped, so
    the result is a subset, never garbage."""
    out: dict = {}
    for key in ("queries", "spread"):
        m = re.search(r'"%s"\s*:\s*\{' % key, tail)
        if not m:
            continue
        seg = tail[m.end():]
        end = seg.find("}")
        if end != -1:
            seg = seg[:end]
        pairs = {
            k: float(v)
            for k, v in re.findall(
                r'"([^"]+)"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)',
                seg,
            )
        }
        if pairs:
            out[key] = pairs
    m = re.search(r'"value"\s*:\s*(-?\d+(?:\.\d+)?)', tail)
    if m:
        out["value"] = float(m.group(1))
    return out


def load(path: str) -> dict:
    """The measurement dict {queries, spread, value, ...} from either
    a driver-wrapped BENCH_r*.json or a raw bench.py JSON line."""
    with open(path) as f:
        doc = json.load(f)
    # 'parsed' may be null (driver recorded a failed run) or the doc
    # may not be a dict at all — both must land on the clean message,
    # not a TypeError
    meas = doc if isinstance(doc, dict) else {}
    if isinstance(meas.get("parsed"), dict):
        meas = meas["parsed"]
    if not isinstance(meas.get("queries"), dict) and isinstance(
        doc, dict
    ) and isinstance(doc.get("tail"), str):
        # driver artifact whose JSON line overflowed the tail window:
        # regex-recover the per-query dicts from the raw tail text
        rec = _recover_from_tail(doc["tail"])
        if rec.get("queries"):
            rec["recovered_from_tail"] = True
            meas = rec
    if isinstance(meas.get("queries"), dict) and not isinstance(
        meas.get("spread"), dict
    ) and isinstance(doc, dict) and isinstance(doc.get("tail"), str):
        # r11+ bench output carries spread on its own EARLIER stdout
        # line (the final parsed line holds only queries), so a
        # driver artifact parses fine but without noise bounds —
        # and a zero bound would flag ordinary run-to-run noise as
        # a regression (review catch). Harvest spread from the tail.
        rec = _recover_from_tail(doc["tail"])
        if rec.get("spread"):
            meas = dict(meas)
            meas["spread"] = rec["spread"]
    if not isinstance(meas.get("queries"), dict):
        raise SystemExit(
            f"{path}: no 'queries' key (not a bench artifact, or a "
            f"failed run?)"
        )
    if meas.get("recovered_from_tail"):
        print(f"note: {path}: recovered "
              f"{len(meas['queries'])} queries from a truncated "
              f"stdout tail", file=sys.stderr)
    return meas


def compare(a: dict, b: dict) -> dict:
    """Pure comparison (tested without files): per-shared-query delta
    with a noise bound = max of the two spreads; totals per side over
    the shared subset; each side's exclusive names."""
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("spread", {}), b.get("spread", {})
    shared = sorted(set(qa) & set(qb))
    rows = []
    for name in shared:
        bound = max(sa.get(name, 0.0), sb.get(name, 0.0))
        delta = qb[name] - qa[name]
        rows.append(
            {
                "query": name,
                "a": round(qa[name], 4),
                "b": round(qb[name], 4),
                "delta": round(delta, 4),
                "bound": round(bound, 4),
                "beyond_spread": abs(delta) > bound,
            }
        )
    return {
        "shared": shared,
        "rows": rows,
        "total_a_shared": round(sum(qa[n] for n in shared), 4),
        "total_b_shared": round(sum(qb[n] for n in shared), 4),
        "only_a": sorted(set(qa) - set(qb)),
        "only_b": sorted(set(qb) - set(qa)),
        "regressions": [
            r["query"]
            for r in rows
            if r["beyond_spread"] and r["delta"] > 0
        ],
        "improvements": [
            r["query"]
            for r in rows
            if r["beyond_spread"] and r["delta"] < 0
        ],
    }


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    a, b = load(argv[1]), load(argv[2])
    out = compare(a, b)
    if not out["shared"]:
        # disjoint query sets (renamed headline set? wrong file?):
        # there is nothing to compare, and exiting 0 would green-gate
        # an across-the-board regression vacuously
        print("NO SHARED QUERIES between the two artifacts")
        print(f"only in A: {', '.join(out['only_a']) or '(none)'}")
        print(f"only in B: {', '.join(out['only_b']) or '(none)'}")
        return 2
    w = max((len(r["query"]) for r in out["rows"]), default=5)
    print(f"{'query':<{w}}  {'A':>7}  {'B':>7}  {'delta':>7}  "
          f"{'bound':>6}  flag")
    for r in sorted(out["rows"], key=lambda r: -abs(r["delta"])):
        flag = ""
        if r["beyond_spread"]:
            flag = "REGRESSION" if r["delta"] > 0 else "improved"
        print(
            f"{r['query']:<{w}}  {r['a']:>7.3f}  {r['b']:>7.3f}  "
            f"{r['delta']:>+7.3f}  {r['bound']:>6.3f}  {flag}"
        )
    print(
        f"\nshared subset ({len(out['shared'])} queries): "
        f"A={out['total_a_shared']:.2f}s  B={out['total_b_shared']:.2f}s  "
        f"delta={out['total_b_shared'] - out['total_a_shared']:+.2f}s"
    )
    if out["only_a"]:
        print(f"only in A: {', '.join(out['only_a'])}")
    if out["only_b"]:
        print(f"only in B: {', '.join(out['only_b'])}")
    if out["regressions"]:
        print(f"beyond-spread regressions: {out['regressions']}")
        return 1
    print("no beyond-spread regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
