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
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: sampled peak of the spawned process TREE's summed RSS —
#: ru_maxrss(RUSAGE_CHILDREN) reports the largest single process,
#: which understates a python-driver + JVM pair; the no-OOM evidence
#: wants the tree total at its worst moment
_PEAK_TREE_RSS_KB = 0


def _tree_rss_kb(root_pid: int) -> int:
    """Summed VmRSS of root_pid and every /proc descendant."""
    children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
            children.setdefault(ppid, []).append(int(entry))
        except OSError:
            continue
    total = 0
    stack = [root_pid]
    while stack:
        pid = stack.pop()
        stack.extend(children.get(pid, []))
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            continue
    return total


def _run(cmd: list[str], env: dict | None = None) -> tuple[str, float]:
    global _PEAK_TREE_RSS_KB
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    stop = threading.Event()

    def sample():
        global _PEAK_TREE_RSS_KB
        while not stop.is_set():
            _PEAK_TREE_RSS_KB = max(_PEAK_TREE_RSS_KB, _tree_rss_kb(proc.pid))
            stop.wait(1.0)

    t = threading.Thread(target=sample, daemon=True)
    t.start()
    out, err = proc.communicate()
    stop.set()
    t.join(timeout=5)
    if proc.returncode != 0:
        # surface the child's actual failure — the bare
        # CalledProcessError hides stderr, leaving "exit status 1"
        # as the only diagnostic for a 10-minute run
        sys.stderr.write(
            f"--- {' '.join(cmd)} failed (rc={proc.returncode}); "
            f"stderr tail ---\n" + "\n".join(err.splitlines()[-30:])
            + "\n"
        )
        raise subprocess.CalledProcessError(proc.returncode, cmd, out, err)
    return out, time.time() - t0


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

    # hot-host crawl-governance stress (VERDICT r7 #2): 2M URLs over
    # 8 hosts — 250k rows/host forces the robots evaluator's adaptive
    # salt; per-stage timings + exact-count pins from the tool itself
    crawl_out, crawl_s = _run([sys.executable, "tools/crawl_stress.py"])
    result["crawl_stress"] = json.loads(crawl_out.strip().splitlines()[-1])
    result["crawl_stress_wall_s"] = round(crawl_s, 1)

    # streaming chunk-hash index at sf1 (r10): fold the whole corpus
    # in micro-batches through the real writer, time reads, pin
    # streamed==batch count/sum equality at scale
    chunk_out, chunk_s = _run(
        [sys.executable, "tools/chunk_index_stress.py", out_dir]
    )
    result["chunk_index_stress"] = json.loads(
        chunk_out.strip().splitlines()[-1]
    )
    result["chunk_index_stress_wall_s"] = round(chunk_s, 1)

    ru = resource.getrusage(resource.RUSAGE_CHILDREN)
    result["peak_child_rss_gib"] = round(ru.ru_maxrss / 1024 / 1024, 2)
    result["peak_tree_rss_gib"] = round(_PEAK_TREE_RSS_KB / 1024 / 1024, 2)

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
