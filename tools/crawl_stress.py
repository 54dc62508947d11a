"""Hot-host crawl-governance stress at soak scale (VERDICT r7 #2:
the sf1 soak predated the crawl subsystem; this is its 10× leg).

    python tools/crawl_stress.py [n_urls] [n_hosts]

Builds ``n_urls`` synthetic URLs over only ``n_hosts`` hosts — the
deliberate worst case for per-host grouping (default 2,000,000 over
8 hosts = 250k rows/host, well past the 65,536-row salting threshold
in ``operators/robots.py``, so the adaptive salt MUST engage for the
run to finish in bounded tasks) — and times the three governance
stages end-to-end on local[*]:

1. robots:  ``drop_disallowed`` in rfc9309 mode against multi-rule
   bodies (salted applyInPandas groups);
2. quota:   ``per_host_quota`` k=50k (bounded two-phase top-k under
   hot groups);
3. budget:  ``politeness_budget`` (per-host caps from Crawl-delay).

Prints ONE JSON line with per-stage min-of-2 wall seconds and output
row counts (the counts double as a cheap correctness pin: they are
exact functions of the synthesis rule, asserted here).

Also times the link-graph centrality folds (PageRank 6 fixed
iterations with PER-ITERATION wall times + a flatness assert, HITS
3 iterations) on a 1M-node / 10M-edge Zipf-in-degree graph, plus
the streaming quota-index fold — the incremental twin.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (  # noqa: E402
    per_host_quota,
    politeness_budget,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (  # noqa: E402
    drop_disallowed,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark  # noqa: E402


def main(n_urls: int = 2_000_000, n_hosts: int = 8) -> dict:
    spark = get_spark("crawl-stress")
    urls = spark.range(n_urls).select(
        F.col("id"),
        F.concat(
            F.lit("http://h"),
            (F.col("id") % n_hosts).cast("string"),
            F.lit(".example/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [
            (
                f"h{h}.example",
                # multi-rule body: a prefix family, a longest-match
                # carve-out, and an anchored wildcard, plus the
                # crawl-delay the budget stage consumes
                "User-agent: *\nDisallow: /p/1\nAllow: /p/12\n"
                "Disallow: /*7$\nCrawl-delay: 0.002\n",
            )
            for h in range(n_hosts)
        ],
        "host string, robots_txt string",
    )

    def timed(fn):
        best = math.inf
        n = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2), n

    stages = {
        "robots_rfc9309": lambda: drop_disallowed(
            urls, robots, url_col="url", rep="rfc9309"
        ),
        "quota_50k": lambda: per_host_quota(urls, k=50_000, url_col="url"),
        "budget": lambda: politeness_budget(
            urls, robots, window_seconds=60.0, rep="rfc9309"
        ),
    }
    out: dict = {"n_urls": n_urls, "n_hosts": n_hosts, "stages": {}}
    for name, fn in stages.items():
        sec, rows = timed(fn)
        out["stages"][name] = {"sec": sec, "rows": rows}

    # streaming governance: fold the same corpus into the persistent
    # per-site quota index in 4 chunks (hot-host probe + rank-slot
    # merge per fold) — the incremental twin's wall time at the same
    # scale as the batch stages above
    import tempfile

    from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (  # noqa: E501
        ParquetTable,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.quota_index import (  # noqa: E501
        fold_quota_index,
    )

    workdir = tempfile.mkdtemp(prefix="crawl_stress_")
    index = ParquetTable(spark, os.path.join(workdir, "qidx"))
    chunks = 4
    t0 = time.perf_counter()
    for i in range(chunks):
        fold_quota_index(
            index,
            urls.filter((F.col("id") % chunks) == i),
            k=50_000,
            batch_id=i,
        )
    fold_sec = round(time.perf_counter() - t0, 2)
    idx_rows = index.read().count()
    out["stages"]["quota_index_fold_x4"] = {"sec": fold_sec, "rows": idx_rows}
    assert idx_rows == min(50_000, n_urls // n_hosts) * n_hosts

    # correctness pins (exact functions of the synthesis rule):
    # quota keeps min(k, rows/host) per host; budget cap =
    # floor(60 / 0.002) = 30000 per host, likewise clipped
    per_host = n_urls // n_hosts
    assert out["stages"]["quota_50k"]["rows"] == min(50_000, per_host) * n_hosts
    assert out["stages"]["budget"]["rows"] == min(30_000, per_host) * n_hosts

    # link-graph centrality at power-law scale (VERDICT r8 #1: the
    # one subsystem with zero wall-clock evidence). 1M nodes / 10M
    # edges with Zipf in-degree — node 0 collects ~ln(n)× the median,
    # the hub skew the dst-side hash agg must absorb flat. Fixed
    # iteration counts (tol=0); per-iteration wall recorded via the
    # on_iteration hook. Iteration 0 additionally pays the one-off
    # degree/dangling setup, so the FLATNESS pin (iterative
    # driver-loop cost must not grow with iteration index — the
    # checkpoint-growth hazard) compares iterations 1.. only.
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (  # noqa: E501
        hits,
        pagerank,
        synthetic_link_graph,
    )

    n_nodes, n_edges = 1_000_000, 10_000_000
    graph = synthetic_link_graph(spark, n_nodes, n_edges)
    iter_secs: list[float] = []
    last = [time.perf_counter()]

    def _tick(_i: int) -> None:
        now = time.perf_counter()
        iter_secs.append(round(now - last[0], 2))
        last[0] = now

    t0 = time.perf_counter()
    last[0] = t0
    ranks = pagerank(graph, max_iters=6, tol=0.0, on_iteration=_tick)
    rank_sum = ranks.agg(F.sum("rank")).collect()[0][0]
    pr_sec = round(time.perf_counter() - t0, 2)
    # MEASURED node count (post-timing): the log-uniform dst draw
    # never emits slot n_nodes-1 and ~n/e^10 uniform src slots go
    # undrawn at 10 edges/node, so distinct endpoints land slightly
    # under n_nodes — report the real number and bound it, so a
    # node-loss regression in the graph cleanup can't hide behind a
    # fabricated count
    n_ranked = ranks.count()
    out["stages"]["pagerank_1m_nodes_10m_edges"] = {
        "sec": pr_sec,
        "rows": n_ranked,
        "iter_secs": iter_secs,
    }
    assert 0.99 * n_nodes < n_ranked <= n_nodes
    assert abs(rank_sum - 1.0) < 1e-6  # mass conservation at scale
    steady = iter_secs[1:]
    assert max(steady) <= 2.5 * min(steady), (
        f"per-iteration cost is not flat: {iter_secs}"
    )

    # warm-restart leg: the incremental-crawl payoff at scale — after
    # a 1% edge delta, re-ranking from the previous converged vector
    # must need FEWER iterations than a cold start. alpha=0.5 keeps
    # the leg bounded (L1 contraction 0.5^k → tol=1e-4 in ~13 cold
    # iterations vs ~57 at 0.85); per-iteration cost is alpha-
    # independent, so the iteration-count comparison transfers.
    delta_graph = graph.unionByName(
        synthetic_link_graph(spark, n_nodes, n_edges // 100, seed=0x9E37)
    )
    base_iters: list[int] = []
    t0 = time.perf_counter()
    base_ranks = pagerank(
        graph, alpha=0.5, tol=1e-4, max_iters=30,
        on_iteration=base_iters.append,
    )
    base_sec = round(time.perf_counter() - t0, 2)
    cold_iters: list[int] = []
    t0 = time.perf_counter()
    pagerank(
        delta_graph, alpha=0.5, tol=1e-4, max_iters=30,
        on_iteration=cold_iters.append,
    )
    cold_sec = round(time.perf_counter() - t0, 2)
    warm_iters: list[int] = []
    t0 = time.perf_counter()
    warm_ranks = pagerank(
        delta_graph, alpha=0.5, tol=1e-4, max_iters=30,
        on_iteration=warm_iters.append, init_ranks=base_ranks,
    )
    warm_sec = round(time.perf_counter() - t0, 2)
    n_warm = warm_ranks.count()
    out["stages"]["pagerank_warm_restart_1pct_delta"] = {
        "base_iters": len(base_iters), "base_sec": base_sec,
        "cold_iters": len(cold_iters), "cold_sec": cold_sec,
        "warm_iters": len(warm_iters), "warm_sec": warm_sec,
        "rows": n_warm,
    }
    assert len(warm_iters) < len(cold_iters), (
        f"warm restart did not converge faster: "
        f"{len(warm_iters)} vs {len(cold_iters)}"
    )
    assert n_warm >= n_ranked  # the delta only adds nodes

    t0 = time.perf_counter()
    hs = hits(graph, max_iters=3, tol=0.0)
    h_sum = hs.agg(F.sum("hub"), F.sum("authority")).collect()[0]
    h_sec = round(time.perf_counter() - t0, 2)
    n_scored = hs.count()
    out["stages"]["hits_1m_nodes_10m_edges_x3"] = {
        "sec": h_sec,
        "rows": n_scored,
    }
    assert n_scored == n_ranked  # same graph, same node set
    assert abs(h_sum[0] - 1.0) < 1e-6 and abs(h_sum[1] - 1.0) < 1e-6

    spark.stop()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(
        int(argv[0]) if argv else 2_000_000,
        int(argv[1]) if len(argv) > 1 else 8,
    )
