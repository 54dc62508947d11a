"""One-command, re-runnable 10× scale soak (VERDICT r4 "Next round"
#7: the SURVEY §11 sf1 table was builder-reported; this makes it an
independently checkable artifact like BENCH_r*.json).

    python tools/soak_sf1.py [out_dir] [--skip-curation]

1. Regenerates sf1 under ``out_dir`` (default /tmp/sf1) via
   tools/make_sf1.py — 10-way copy-shifted replication of the
   read-only sf0.1 testdata (documents become deliberate 10-way
   near-dup groups: the dedup worst case).
2. Runs the full bench.py headline set against it (min-of-3 per
   query + spread, same JSON contract as BENCH_r*.json).
3. Runs the end-to-end curation example (examples/curate_corpus.py)
   at sf1 — the longest single pipeline in the repo.
4. Writes ``SOAK_sf1.json`` at the repo root: bench numbers, wall
   times, and the peak RSS of the child processes
   (``getrusage(RUSAGE_CHILDREN).ru_maxrss`` — the soak's memory
   high-water mark, the no-OOM evidence).

Diffable across rounds: commit the JSON next to BENCH_r*.json.
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict | None = None) -> tuple[str, float]:
    t0 = time.time()
    r = subprocess.run(
        cmd, env=env, cwd=REPO, check=True, capture_output=True, text=True
    )
    return r.stdout, time.time() - t0


def main(out_dir: str = "/tmp/sf1", skip_curation: bool = False) -> dict:
    result: dict = {"sf_dir": out_dir, "copies": 10, "source": "sf0.1"}

    gen_out, gen_s = _run([sys.executable, "tools/make_sf1.py", out_dir])
    result["generate_s"] = round(gen_s, 1)
    result["row_counts"] = {
        line.split(":")[0]: int(line.split(":")[1].split()[0])
        for line in gen_out.strip().splitlines()
        if ":" in line
    }

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    bench_out, bench_s = _run([sys.executable, "bench.py"], env=env)
    bench = json.loads(bench_out.strip().splitlines()[-1])
    result["bench"] = bench
    result["bench_wall_s"] = round(bench_s, 1)

    if not skip_curation:
        _, cur_s = _run(
            [sys.executable, "examples/curate_corpus.py", out_dir]
        )
        result["curation_example_wall_s"] = round(cur_s, 1)

    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    result["peak_child_rss_gib"] = round(ru.ru_maxrss / 1024 / 1024, 2)

    path = os.path.join(REPO, "SOAK_sf1.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "bench"}))
    print(f"written: {path}")
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(
        args[0] if args else "/tmp/sf1",
        skip_curation="--skip-curation" in sys.argv,
    )
