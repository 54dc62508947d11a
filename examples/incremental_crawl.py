"""The incremental crawl loop, end to end (VERDICT r8 #3 + #7):

    python examples/incremental_crawl.py

Sitemap discovery → governance (robots / quota) → micro-batch folds
into the persistent canonical-URL seen-index WITH a derived
link-graph edge table → PageRank over the stored edges → lastmod
refresh scheduling → RE-ADMISSION of a genuinely modified page →
convergence. Each numbered stage below is the real production path;
only the fetches are simulated.

The one protocol decision this loop adds on top of the pieces: the
seen-index's winner invariant is MIN doc_id per canonical URL
(associative, so any shard chunking converges — see
``streaming/crawl_index.py``). A dedup crawl mints doc_ids from
content hashes and never wants refetches to win; a REFRESH loop
needs the newer fetch of a modified page to win. Both fit the same
invariant by minting refetch ids as ``-(fetch epoch)``: later
fetches are strictly smaller, so they replace the stored winner —
and the replacement cascades atomically through every derived table
(the edge row is curl-keyed, so the modified page's stale out-links
vanish in the same commit that lands the new ones).

The folds below are exactly what ``crawl_index_writer`` runs inside
``foreachBatch`` (tests/test_edge_index.py proves the same
composition over a real binaryFile readStream across a checkpoint
restart); the example drives them directly so each micro-batch's
effect is observable between folds.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
    per_host_quota,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (
    pagerank,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
    drop_disallowed,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
    parse_sitemaps,
    refresh_candidates,
    sitemap_frontier,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.edge_index import (
    fold_crawl_with_edges,
    stored_link_edges,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
N_HOSTS = 3
PAGES_PER_HOST = 6
#: the page whose content genuinely changes between generations
MODIFIED = "http://h0.example/p/2"


def _urlset(entries) -> bytes:
    rows = "".join(
        f"<url><loc>{loc}</loc><lastmod>{lm}</lastmod></url>"
        for loc, lm in entries
    )
    return f'<?xml version="1.0"?><urlset {_NS}>{rows}</urlset>'.encode()


def _discover(spark, gen: str):
    """sitemap fleet → frontier for one generation. v2 advances ONE
    page's lastmod (the genuinely-modified page); everything else
    keeps its v1 claim."""
    fetched = []
    for h in range(N_HOSTS):
        entries = []
        for i in range(PAGES_PER_HOST):
            url = f"http://h{h}.example/p/{i}"
            lm = "2026-06-01" if (gen == "v2" and url == MODIFIED) else "2026-02-01"
            entries.append((url, lm))
        fetched.append((f"http://h{h}.example/sm.xml", _urlset(entries)))
    return sitemap_frontier(
        parse_sitemaps(
            spark.createDataFrame(fetched, "sitemap_url string, content binary")
        )
    )


def _fetch(spark, worklist, gen: str, epoch: int):
    """Simulated fetch of a governed worklist: refetch ids mint as
    -(epoch) so later fetches are strictly smaller — the module-doc
    protocol that makes refreshes win the keep-min invariant. Page
    bodies are pure column expressions: every page links its host's
    /hub; the modified page's v2 drops its old /extra link and gains
    /new."""
    second_link = F.when(
        F.col("curl") == MODIFIED,
        F.lit("<a href='/new'>n</a>" if gen == "v2" else "<a href='/extra'>e</a>"),
    ).otherwise(F.lit(""))
    return worklist.select(
        F.lit(-epoch).alias("doc_id"),
        F.col("curl").alias("url"),
        F.lit(f"2026-0{3 if gen == 'v1' else 6}-02").alias("fetched_at"),
        F.concat(
            F.lit("<html><body><a href='/hub'>hub</a>"),
            second_link,
            F.lit("<p>"),
            F.col("curl"),
            F.lit(f" {gen}</p></body></html>"),
        ).alias("html"),
    )


def main() -> None:
    spark = get_spark("incremental-crawl-example")
    robots = spark.createDataFrame(
        [(f"h{h}.example", "User-agent: *\nDisallow: /p/5\n")
         for h in range(N_HOSTS)],
        "host string, robots_txt string",
    )
    workdir = tempfile.mkdtemp(prefix="inc_crawl_")
    seen = ParquetTable(spark, os.path.join(workdir, "seen"))
    edges = ParquetTable(spark, os.path.join(workdir, "edges"))

    def govern(frontier):
        return per_host_quota(
            drop_disallowed(frontier, robots, url_col="curl", rep="rfc9309"),
            k=8,
            url_col="curl",
        )

    def fold(pages, batch_id: int) -> int:
        """One micro-batch: edge fold THEN seen-index fold — the
        crawl_index_writer commit order (edges first, so a crash
        between the commits replays losslessly)."""
        return fold_crawl_with_edges(
            seen, edges, pages, batch_id=batch_id
        ).count()

    # ── crawl 1: discover, govern, fetch in two micro-batches ──
    frontier = _discover(spark, "v1")
    work = govern(frontier).persist()
    n_work = work.count()
    admitted = 0
    for i in range(2):  # interleaved chunking, like shard arrival
        chunk = work.filter(F.pmod(F.xxhash64("curl"), F.lit(2)) == i)
        admitted += fold(_fetch(spark, chunk, "v1", epoch=1000 + i), i)
    work.unpersist()
    print(f"crawl 1:     {n_work} governed URLs → {admitted} admitted "
          f"({seen.read().count()} in seen-index)")
    assert admitted == n_work  # everything was new

    ranks1 = pagerank(stored_link_edges(edges), max_iters=40)
    top1 = ranks1.orderBy(F.desc("rank")).limit(3).collect()
    print(f"link graph:  {edges.read().count()} page rows; top ranks "
          f"{[(r['node'], round(r['rank'], 4)) for r in top1]}")

    # ── re-discovery: one page's lastmod advanced ──
    refetch = refresh_candidates(_discover(spark, "v2"), seen.read())
    flagged = [r["curl"] for r in refetch.collect()]
    print(f"re-discover: {len(flagged)} refresh candidate(s): {flagged}")
    # exactly the modified page plus the robots-disallowed stragglers
    # the governance stage keeps unfetched by design
    assert MODIFIED in flagged
    assert all(c == MODIFIED or c.endswith("/p/5") for c in flagged)

    # ── crawl 2: the modified page re-fetches and RE-ADMITS ──
    stale = {
        (r["src"], r["dst"])
        for r in stored_link_edges(edges).collect()
        if r["src"] == MODIFIED
    }
    readmitted = fold(_fetch(spark, govern(refetch), "v2", epoch=2000), 2)
    fresh = {
        (r["src"], r["dst"])
        for r in stored_link_edges(edges).collect()
        if r["src"] == MODIFIED
    }
    print(f"crawl 2:     {readmitted} re-admitted; {MODIFIED} edges "
          f"{sorted(d for _, d in stale)} → {sorted(d for _, d in fresh)}")
    assert readmitted == 1  # the modified page, nothing else
    assert ("http://h0.example/extra" in {d for _, d in stale}
            and "http://h0.example/new" in {d for _, d in fresh}
            and "http://h0.example/extra" not in {d for _, d in fresh})

    # ── convergence: a third discovery pass flags nothing fetched ──
    again = refresh_candidates(_discover(spark, "v2"), seen.read())
    left = [r["curl"] for r in again.collect()]
    print(f"converged:   third pass flags {len(left)} "
          f"(all robots-disallowed: {left})")
    assert all(c.endswith("/p/5") for c in left)
    # warm-start from the pre-refresh ranks: the fixed point is the
    # same (affine contraction), so the re-rank pays iterations for
    # the one-page delta, not the cold-start distance
    cold_iters, warm_iters = [], []
    pagerank(stored_link_edges(edges), max_iters=40,
             on_iteration=cold_iters.append)
    ranks2 = pagerank(
        stored_link_edges(edges),
        max_iters=40,
        init_ranks=ranks1,
        on_iteration=warm_iters.append,
    )
    assert len(warm_iters) < len(cold_iters)
    print(f"final graph: {stored_link_edges(edges).count()} edges, "
          f"{ranks2.count()} ranked nodes (re-rank after the one-page "
          f"delta: {len(warm_iters)} warm iterations vs "
          f"{len(cold_iters)} cold)")

    # ── topic-sensitive frontier signal: seed the trusted host's
    # pages; mass flows along their links, so h0's hub must outrank
    # the structurally-identical h1/h2 hubs ──
    seeds = spark.createDataFrame(
        [(f"http://h0.example/p/{i}", 1.0) for i in range(5)],
        "node string, weight double",
    )
    prank_df = pagerank(
        stored_link_edges(edges), max_iters=40, personalization=seeds
    )
    pranks = {r["node"]: r["rank"] for r in prank_df.collect()}
    assert pranks["http://h0.example/hub"] > pranks["http://h1.example/hub"]
    top_p = sorted(pranks, key=pranks.get, reverse=True)[:2]
    print(f"seeded rank: teleport on h0 pages → top {top_p}")
    assert all(n.startswith("http://h0.example/") for n in top_p)

    # ── ...and the personalized rank AS the frontier priority (the
    # Haveliwala crawl-frontier form the operator docstring cites):
    # the next generation's governed worklist fetches in order of
    # proximity to the trusted seeds — every h0 page precedes every
    # h1/h2 page, because off-seed-component mass is exactly zero ──
    queue = (
        govern(_discover(spark, "v2"))
        .join(prank_df.withColumnRenamed("node", "curl"), "curl", "left")
        .select(
            "curl", F.coalesce("rank", F.lit(0.0)).alias("priority")
        )
        .orderBy(F.desc("priority"), "curl")
    )
    ordered = [r["curl"] for r in queue.collect()]
    n_h0 = sum(1 for c in ordered if c.startswith("http://h0."))
    assert n_h0 > 0
    assert all(c.startswith("http://h0.") for c in ordered[:n_h0])
    print(f"frontier:    seeded priority puts all {n_h0} h0 URLs ahead "
          f"of {len(ordered) - n_h0} off-topic URLs")
    spark.stop()


if __name__ == "__main__":
    main()
