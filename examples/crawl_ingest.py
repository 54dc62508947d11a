"""Crawl ingestion front half, end-to-end from real WARC bytes:

    python examples/crawl_ingest.py [sf_dir] [workdir]

1. SIMULATE the crawl: wrap every document of the corpus in the HTTP
   response + WARC record framing it would have been captured as
   (entity-escaped body, title, link-heavy footer chrome; one
   gzip member per record, the spec's recommended .warc.gz shape) —
   sharded into several files, the unit production crawl processing
   parallelizes over. A few records are deliberately adversarial:
   a page that lies about its charset, a gzip Content-Encoding body,
   a duplicate page fetched under tracking-parameter URL variants.
2. Ingest: ``sources/warc.py crawl_documents`` (record framing, HTTP
   envelope strip, chunked/gzip undo, replace-on-malformed charset
   decode — all inside the one record-splitter kernel).
3. URL dedup: canonicalize (``operators/urls.py``) and keep one
   fetch per canonical URL — the crawl-side dedup that runs BEFORE
   any content dedup.
4. Quota: ``operators/crawl_quota.py per_host_quota`` caps any one
   host's contribution (deterministic content-keyed keep-k via the
   bounded two-phase top-k — crawl politeness/budget governance),
   then ``politeness_budget`` additionally bounds each host to what
   its declared Crawl-delay permits inside a fetch window — the
   full governance triad: robots = may we, quota = how much,
   Crawl-delay = how fast.
5. Extract: ``operators/extraction.py extract_text`` → title, text,
   link-density; drop chrome-dominated pages.
6. Hand off: the surviving (doc_id, text) frame is exactly what
   ``examples/curate_corpus.py``'s signal/dedup/pack stages consume.

Everything after the simulation step is the real production path.
"""

from __future__ import annotations

import gzip
import html as html_mod
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (
    extract_text,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
    per_host_quota,
    politeness_budget,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.urls import (
    canonical_url,
    url_host,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.warc import (
    crawl_documents,
)


def _http(body: bytes, ctype: str = "text/html; charset=utf-8", extra: str = "") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n{extra}"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def _warc_record(uri: str, rec_id: str, payload: bytes) -> bytes:
    head = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <" + rec_id.encode() + b">\r\n"
        b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _page(doc_id: int, text: str) -> bytes:
    body = html_mod.escape(text)
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f"<h1>doc {doc_id}</h1><p>{body}</p>"
        f"<footer><a href='/share'>share</a><a href='/about'>about</a>"
        f"</footer></body></html>"
    ).encode()


def synthesize_crawl(spark, sf_dir: str, out_dir: str, shards: int = 8) -> int:
    """documents.parquet → sharded .warc.gz crawl simulation.
    Returns the number of records written."""
    rows = (
        catalog.table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    n = 0
    handles = [
        open(os.path.join(out_dir, f"crawl-{s:02d}.warc.gz"), "wb")
        for s in range(shards)
    ]
    try:
        for r in rows:
            did = r["doc_id"]
            page = _page(did, r["text"])
            url = f"http://site{did % 23}.example/doc/{did}"
            recs = [(url, f"urn:doc:{did}", _http(page))]
            if did % 31 == 0:
                # the same page refetched under a tracking variant —
                # the URL-dedup stage must collapse it
                recs.append(
                    (url + "?utm_source=feed", f"urn:doc:{did}:b", _http(page))
                )
            if did % 37 == 0:
                # gzip Content-Encoding body
                recs = [
                    (
                        url,
                        f"urn:doc:{did}",
                        _http(
                            gzip.compress(page),
                            extra="Content-Encoding: gzip\r\n",
                        ),
                    )
                ]
            if did % 41 == 0:
                # lies about its charset: latin-1 bytes labeled utf-8
                # (replace-decode keeps the crawl alive)
                recs = [
                    (
                        url,
                        f"urn:doc:{did}",
                        _http(page.replace(b"<p>", "<p>caf\xe9 ".encode("latin-1"))),
                    )
                ]
            for u, rid, payload in recs:
                handles[n % shards].write(
                    gzip.compress(_warc_record(u, rid, payload))
                )
                n += 1
    finally:
        for h in handles:
            h.close()
    return n


def main(sf_dir: str, workdir: str) -> None:
    spark = get_spark("crawl-ingest")
    n_src = catalog.table(spark, sf_dir, "documents").count()
    n_written = synthesize_crawl(spark, sf_dir, workdir)

    # cache the parsed records: every downstream action would
    # otherwise re-run the whole WARC kernel over all shards
    canon = crawl_documents(
        spark, os.path.join(workdir, "*.warc.gz")
    ).withColumn("curl", canonical_url(F.col("url"))).persist()
    n_fetched = canon.count()

    # crawl-side dedup: one fetch per canonical URL — keep-min via
    # aggregate + semi-join, the shuffle-once shape that scales
    # (a row_number window would single-thread each hot URL); the
    # final dropDuplicates guards byte-identical re-ingested records
    # that share (curl, doc_id)
    keep = canon.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
    unique = canon.join(keep, ["curl", "doc_id"], "left_semi").dropDuplicates(
        ["curl"]
    )
    n_unique = unique.count()

    # politeness/budget cap: at most 20 pages per host, selected
    # deterministically (content-keyed) so reruns keep the same pages
    quota = per_host_quota(unique, k=20, url_col="curl")
    n_quota = quota.count()

    # rate governance: every 4th host declares a Crawl-delay; a
    # 60-second fetch window then bounds its page count to
    # floor(60 / delay) (delay 12 → 5 pages)
    robots = spark.createDataFrame(
        [(f"site{h}.example", "User-agent: *\nCrawl-delay: 12\n")
         for h in range(0, 23, 4)],
        "host string, robots_txt string",
    )
    budget = politeness_budget(quota, robots, window_seconds=60.0,
                               url_col="curl")
    n_budget = budget.count()

    feats = extract_text(budget, html_col="html")
    kept = feats.filter(
        F.col("text").isNotNull() & (F.col("link_density") < 0.5)
    )
    n_kept = kept.count()

    # link graph: out-link edges from the governed pages → PageRank
    # (the frontier-prioritization / corpus-centrality signal); every
    # page's footer links its host's /about and /share pages, which
    # therefore out-rank the content pages
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.extraction import (  # noqa: E501
        extract_links,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.pagerank import (  # noqa: E501
        pagerank,
    )

    edges = extract_links(budget, html_col="html", url_col="curl")
    ranks = pagerank(edges, max_iters=10)
    top_ranked = ranks.orderBy(F.desc("rank")).limit(3).collect()
    n_edges = edges.count()
    hosts = (
        canon.select(url_host(F.col("url")).alias("h"))
        .groupBy("h")
        .count()
        .orderBy(F.desc("count"))
        .limit(3)
        .collect()
    )

    shards = len([f for f in os.listdir(workdir) if f.endswith(".warc.gz")])
    print(f"corpus:      {n_src} source docs → {n_written} WARC records "
          f"({shards} .warc.gz shards)")
    print(f"ingested:    {n_fetched} pages (HTTP 200 text/html, decoded)")
    print(f"url dedup:   {n_unique} unique canonical URLs "
          f"({n_fetched - n_unique} canonical-key collisions collapsed)")
    print(f"host quota:  {n_quota} pages within the 20/host budget "
          f"({n_unique - n_quota} over-quota pages dropped)")
    print(f"crawl-delay: {n_budget} pages within the 60s politeness "
          f"window ({n_quota - n_budget} rate-capped pages deferred)")
    print(f"extracted:   {n_kept} pages kept (parse ok, link density < 0.5)")
    print(f"link graph:  {n_edges} edges; top PageRank: "
          f"{[(r['node'], round(r['rank'], 5)) for r in top_ranked]}")
    print(f"top hosts:   {[(r['h'], r['count']) for r in hosts]}")
    sample = kept.orderBy("doc_id").limit(1).collect()
    if sample:
        print(f"sample:      title={sample[0]['title']!r} "
              f"text[:40]={sample[0]['text'][:40]!r}")
    else:
        print("sample:      (no page survived the filters)")
    canon.unpersist()
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wd = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="crawl_")
    main(sf, wd)
