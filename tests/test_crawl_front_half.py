"""The driver-checked crawl_front_half row, pinned against
INDEPENDENT per-stage references: robots flags vs a direct
_Rfc9309Matcher evaluation, canonical URLs vs the expected plain
form, titles/hosts vs the synthesis rule, and the URL-dedup collapse
arithmetic. (The registry oracle re-checks the committed golden; this
file checks the golden is RIGHT.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_queries import (
    _ROBOTS_BY_RESIDUE,
    crawl_front_half,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.robots import (
    _Rfc9309Matcher,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.warc import (
    WARC_SCHEMA,
    crawl_pages,
    synthetic_warc_corpus,
    warc_kernel,
)


def test_crawl_front_half_stage_references(spark, sf_dir):
    rows = crawl_front_half(spark, sf_dir).collect()
    # one row per source doc: the tracking-variant refetches and the
    # 404/request/JSON records are all collapsed or filtered
    assert len(rows) == 400

    # url → source doc number is recoverable from the canonical form
    for r in rows:
        host = r["host"]
        d = int(r["url"].rsplit("=", 1)[1])
        assert r["url"] == f"http://site{d % 23}.example/Doc/{d}?id={d}"
        assert host == f"site{d % 23}.example"
        assert r["title"] == f"Doc {d}"
        # link accounting: 2 footer links, +30 nav links every 11th
        assert r["n_links"] == (32 if d % 11 == 0 else 2)
        # robots: independent longest-match evaluation
        h = d % 23
        if h % 4 == 3:
            want = True  # no robots row
        else:
            want = _Rfc9309Matcher(_ROBOTS_BY_RESIDUE[h % 4], "*").can_fetch(
                r["url"]
            )
        assert r["allowed"] is want, (d, h, r["url"])

    # the three rule families all produce BOTH outcomes somewhere
    by_family = {}
    for r in rows:
        d = int(r["url"].rsplit("=", 1)[1])
        by_family.setdefault((d % 23) % 4, set()).add(r["allowed"])
    assert by_family[0] == {True, False}
    assert by_family[1] == {True, False}
    assert by_family[2] == {True, False}
    assert by_family[3] == {True}


def test_synthetic_corpus_shape(spark, sf_dir):
    """Shards are deterministic bytes, mixed gzip/plain, and the
    record mix survives the kernel: refetch duplicates exist BEFORE
    canonical dedup, non-document records are present and filtered."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    docs = (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    shards = synthetic_warc_corpus(docs)
    got = {r["path"]: bytes(r["content"]) for r in shards.collect()}
    assert len(got) == 8
    assert sum(p.endswith(".warc.gz") for p in got) == 4
    # byte-determinism across a different partitioning
    got2 = {
        r["path"]: bytes(r["content"])
        for r in synthetic_warc_corpus(docs.repartition(7)).collect()
    }
    assert got == got2

    recs = shards.mapInPandas(warc_kernel, WARC_SCHEMA)
    by_type = {
        r["warc_type"]: r["cnt"]
        for r in recs.groupBy("warc_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type["warcinfo"] == 8
    assert by_type["request"] == len([d for d in range(100) if d % 17 == 0])
    # responses: 100 pages + refetches + 404s + JSON rows
    n_refetch = len([d for d in range(100) if d % 31 == 0])
    n_404 = len([d for d in range(100) if d % 13 == 0])
    n_json = len([d for d in range(100) if d % 19 == 0])
    assert by_type["response"] == 100 + n_refetch + n_404 + n_json
    assert recs.filter(F.col("parse_error").isNotNull()).count() == 0
    # the curation view keeps pages + refetch dups only
    assert crawl_pages(recs).count() == 100 + n_refetch
