"""Sitemap discovery → incremental refetch scheduling, end to end:

    python examples/sitemap_discovery.py

The missing-question demo for the crawl governance stack (robots =
may we, quota = how much, Crawl-delay = how fast, seen-index =
seen before): WHERE TO LOOK, and WHEN TO COME BACK.

1. SIMULATE stored robots fetches for a small host fleet — each
   declares ``Sitemap:`` directives (absolute and relative forms);
   one host's robots is bare (no directive).
2. SIMULATE the fetched sitemap bodies those directives point at:
   plain XML urlsets, a gzipped urlset, a sitemapindex (whose
   children the example then "fetches" and feeds back through — the
   index-expansion loop), a plain-text sitemap, and one hostile
   sitemap listing a third-party host's URLs (must be scope-dropped).
3. Discover: ``host_sitemaps`` → ``parse_sitemaps`` →
   ``sitemap_frontier`` (same-host scope enforced).
4. First crawl: fold a subset of the frontier into the persistent
   canonical-URL seen-index (``streaming/crawl_index.py``).
5. A NEW sitemap generation arrives with fresher ``lastmod`` claims:
   ``refresh_candidates`` emits exactly the never-fetched and
   modified URLs — the next crawl's worklist — which then flows
   through the usual governance stack (robots → quota).
6. The refetches fold back into the seen-index (its ``fetched_at``
   is a MAX fold), so a THIRD discovery pass shows the modified
   flags CLEARED — the loop converges instead of refetching the
   same pages forever.

Everything after the simulation steps is the real production path.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
    per_host_quota,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
    drop_disallowed,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sitemaps import (
    host_sitemaps,
    parse_sitemaps,
    refresh_candidates,
    sitemap_frontier,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.crawl_index import (
    fold_crawl_url_index,
)

_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries) -> bytes:
    rows = "".join(
        f"<url><loc>{loc}</loc>"
        + (f"<lastmod>{lm}</lastmod>" if lm else "")
        + "</url>"
        for loc, lm in entries
    )
    return f'<?xml version="1.0"?><urlset {_NS}>{rows}</urlset>'.encode()


def _gen_sitemaps(gen: str) -> list[tuple[str, bytes]]:
    """(sitemap_url, body) fleet for one sitemap GENERATION: lastmod
    stamps carry the generation date, so re-discovery sees fresher
    claims for the odd pages."""
    fresh = f"2026-0{4 if gen == 'v2' else 2}-01"
    out = [
        (
            "http://shop.example/sm.xml",
            _urlset(
                [
                    (f"http://shop.example/p/{i}", fresh if i % 2 else "2026-01-01")
                    for i in range(12)
                ]
            ),
        ),
        (
            "http://blog.example/sm.xml.gz",
            gzip.compress(
                _urlset(
                    [(f"http://blog.example/post/{i}", "2026-01-15") for i in range(8)]
                )
            ),
        ),
        (
            "http://news.example/txt.map",
            "\n".join(f"http://news.example/a/{i}" for i in range(6)).encode(),
        ),
        # hostile: declares a victim host's URLs — scope must drop them
        (
            "http://spam.example/sm.xml",
            _urlset([("http://victim.example/steal/%d" % i, None) for i in range(5)]),
        ),
        # index file: children are separate fetches
        (
            "http://shop.example/idx.xml",
            (
                f'<?xml version="1.0"?><sitemapindex {_NS}>'
                "<sitemap><loc>http://shop.example/sm-archive.xml</loc></sitemap>"
                "</sitemapindex>"
            ).encode(),
        ),
        (
            "http://shop.example/sm-archive.xml",
            _urlset([(f"http://shop.example/old/{i}", "2025-06-01") for i in range(4)]),
        ),
    ]
    return out


def main() -> None:
    spark = get_spark("sitemap-discovery-example")
    robots = spark.createDataFrame(
        [
            ("shop.example",
             "User-agent: *\nDisallow: /old/\n"
             "Sitemap: http://shop.example/sm.xml\n"
             "Sitemap: /idx.xml\n"),
            ("blog.example", "Sitemap: http://blog.example/sm.xml.gz\n"),
            ("news.example", "User-agent: *\nAllow: /\nSitemap: /txt.map\n"),
            ("spam.example", "Sitemap: http://spam.example/sm.xml\n"),
            ("quiet.example", "User-agent: *\nDisallow: /private\n"),
        ],
        "host string, robots_txt string",
    )
    declared = host_sitemaps(robots)
    n_declared = declared.count()

    def discover(gen: str):
        bodies = {u: b for u, b in _gen_sitemaps(gen)}
        # "fetch" what robots declared, then expand index children
        fetched = [
            (r["sitemap_url"], bodies[r["sitemap_url"]])
            for r in declared.collect()
            if r["sitemap_url"] in bodies
        ]
        entries = parse_sitemaps(
            spark.createDataFrame(fetched, "sitemap_url string, content binary")
        )
        kids = [
            (r["loc"], bodies[r["loc"]])
            for r in entries.filter(F.col("kind") == "sitemapindex").collect()
            if r["loc"] in bodies
        ]
        if kids:
            entries = entries.unionByName(
                parse_sitemaps(
                    spark.createDataFrame(
                        kids, "sitemap_url string, content binary"
                    )
                )
            )
        return sitemap_frontier(entries)

    frontier_v1 = discover("v1")
    n_frontier = frontier_v1.count()

    # first crawl: fetch the allowed, quota'd worklist and fold it
    # into the persistent seen-index (fetch simulated as of March)
    worklist = per_host_quota(
        drop_disallowed(frontier_v1, robots, url_col="curl"), k=8, url_col="curl"
    )
    n_worklist = worklist.count()
    workdir = tempfile.mkdtemp(prefix="sm_demo_")
    index = ParquetTable(spark, os.path.join(workdir, "seen"))
    crawled = worklist.select(
        F.xxhash64("curl").alias("doc_id"),
        F.col("curl").alias("url"),
        F.lit("2026-03-01").alias("fetched_at"),
        F.concat(F.lit("<html><body>"), F.col("curl"), F.lit("</body></html>")).alias(
            "html"
        ),
    )
    fold_crawl_url_index(index, crawled, batch_id=0)
    n_seen = index.read().count()

    # re-discovery a month later: fresher lastmod claims on odd pages
    frontier_v2 = discover("v2")
    refetch = refresh_candidates(frontier_v2, index.read())
    by_reason = {
        r["reason"]: r["cnt"]
        for r in refetch.groupBy("reason").agg(F.count("*").alias("cnt")).collect()
    }
    next_work = per_host_quota(
        drop_disallowed(refetch, robots, url_col="curl"), k=8, url_col="curl"
    )

    print(f"declared:    {n_declared} sitemap URLs across the robots fleet")
    print(f"frontier:    {n_frontier} canonical URLs "
          "(hostile cross-host sitemap scope-dropped)")
    print(f"crawl 1:     {n_worklist} fetched within governance; "
          f"{n_seen} in the seen-index")
    print(f"re-discover: {by_reason.get('never_fetched', 0)} never fetched, "
          f"{by_reason.get('modified', 0)} modified since the last fetch")
    n_next = next_work.count()

    # crawl 2 folds back (May fetch stamps); a third discovery pass
    # must show the modified flags cleared — the loop converges
    refetched = next_work.select(
        F.xxhash64("curl").alias("doc_id"),
        F.col("curl").alias("url"),
        F.lit("2026-05-02").alias("fetched_at"),
        F.concat(F.lit("<html><body>"), F.col("curl"),
                 F.lit("</body></html>")).alias("html"),
    )
    fold_crawl_url_index(index, refetched, batch_id=1)
    again = {
        r["reason"]: r["cnt"]
        for r in refresh_candidates(discover("v2"), index.read())
        .groupBy("reason").agg(F.count("*").alias("cnt")).collect()
    }

    print(f"crawl 2:     {n_next} URLs in the next worklist")
    print(f"converged:   after folding crawl 2, re-discovery flags "
          f"{again.get('modified', 0)} modified / "
          f"{again.get('never_fetched', 0)} never-fetched "
          "(robots-disallowed pages stay unfetched by design)")
    spark.stop()


if __name__ == "__main__":
    main()
