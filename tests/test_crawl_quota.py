"""Per-host crawl quota: deterministic content-keyed keep-k per site,
differential against an explicit pandas reference, partition-count
independence, registered-domain pooling."""

from __future__ import annotations

import pyspark.sql.functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
    per_host_quota,
)


def _urls(spark, n=400, hosts=7, partitions=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("http://h"),
            (F.col("id") % hosts).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    return df.repartition(partitions) if partitions else df


def test_quota_matches_reference_selection(spark):
    """Survivors are exactly the k smallest xxhash64(url) per host —
    computed independently here via Spark's own hash over collected
    rows."""
    k = 5
    df = _urls(spark)
    hashed = df.withColumn("h", F.xxhash64("url")).collect()
    by_host = {}
    for r in hashed:
        host = r["url"].split("/")[2]
        by_host.setdefault(host, []).append((r["h"], r["doc_id"]))
    expected = {
        doc_id
        for rows in by_host.values()
        for _, doc_id in sorted(rows)[:k]
    }
    got = {r["doc_id"] for r in per_host_quota(df, k).collect()}
    assert got == expected
    # columns pass through unchanged
    assert per_host_quota(df, k).columns == ["doc_id", "url"]


def test_quota_partition_independent(spark):
    """The same rows survive at any partitioning (content-keyed, no
    order dependence)."""
    k = 3
    a = {r["doc_id"] for r in per_host_quota(_urls(spark, partitions=1), k).collect()}
    b = {r["doc_id"] for r in per_host_quota(_urls(spark, partitions=13), k).collect()}
    assert a == b and len(a) == 7 * k


def test_quota_small_hosts_untouched(spark):
    """A host under its quota keeps every row."""
    df = _urls(spark, n=10, hosts=10)  # one URL per host
    assert per_host_quota(df, 5).count() == 10


def test_quota_tolerates_reserved_column_names(spark):
    """Self-review r7: a payload column named rank (or __site/__key)
    must survive the round trip instead of colliding with
    grouped_topk's output."""
    rows = [(i, f"http://h{i % 3}.example/p/{i}", i * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string, rank long")
    out = per_host_quota(df, 4)
    assert out.columns == ["doc_id", "url", "rank"]
    got = {r["doc_id"]: r["rank"] for r in out.collect()}
    assert len(got) == 3 * 4
    assert all(v == k * 10 for k, v in got.items())  # values intact


def test_quota_by_registered_domain(spark):
    """registered_domain pools subdomains into one budget."""
    rows = [(i, f"http://sub{i % 4}.example.com/p/{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    by_host = per_host_quota(df, 6, by="host")
    by_dom = per_host_quota(df, 6, by="registered_domain")
    assert by_host.count() == 4 * 6  # each subdomain its own budget
    assert by_dom.count() == 6      # one pooled example.com budget


def test_politeness_budget(spark):
    """The 'how fast' governance leg (VERDICT r7 #7): per-host caps =
    max(1, floor(window / Crawl-delay)); no-delay hosts unlimited
    unless default_delay; selection deterministic (content-keyed) and
    identical across reruns."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
        politeness_budget,
    )

    rows = [
        (h, i, f"http://{h}/p/{i}")
        for h in ("slow.example", "fast.example", "free.example")
        for i in range(10)
    ]
    urls = spark.createDataFrame(rows, "h string, i long, url string")
    robots = spark.createDataFrame(
        [("slow.example", "User-agent: *\nCrawl-delay: 30\n"),
         ("fast.example", "User-agent: *\nCrawl-delay: 5\n"),
         ("free.example", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    out = politeness_budget(urls, robots, window_seconds=60.0)
    per_host = {
        r["h"]: r["c"]
        for r in out.groupBy("h").agg(F.count("*").alias("c")).collect()
    }
    # slow: floor(60/30)=2; fast: floor(60/5)=12 > 10 rows -> all 10;
    # free: no delay -> unlimited
    assert per_host == {
        "slow.example": 2, "fast.example": 10, "free.example": 10
    }
    # deterministic: a rerun keeps the SAME slow pages
    a = {r["url"] for r in out.filter(F.col("h") == "slow.example").collect()}
    b = {
        r["url"]
        for r in politeness_budget(urls, robots, window_seconds=60.0)
        .filter(F.col("h") == "slow.example")
        .collect()
    }
    assert a == b and len(a) == 2

    # default_delay pulls no-delay hosts under a cap too
    capped = politeness_budget(
        urls, robots, window_seconds=60.0, default_delay=20.0
    )
    per_host2 = {
        r["h"]: r["c"]
        for r in capped.groupBy("h").agg(F.count("*").alias("c")).collect()
    }
    assert per_host2 == {
        "slow.example": 2, "fast.example": 10, "free.example": 3
    }
    # schema passthrough
    assert out.columns == ["h", "i", "url"]


def test_politeness_budget_floor_and_no_limits(spark):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
        politeness_budget,
    )

    urls = spark.createDataFrame(
        [(i, f"http://one.example/p/{i}") for i in range(5)],
        "i long, url string",
    )
    # delay longer than the window: still 1 fetch allowed
    robots = spark.createDataFrame(
        [("one.example", "User-agent: *\nCrawl-delay: 999\n")],
        "host string, robots_txt string",
    )
    assert politeness_budget(urls, robots, window_seconds=60.0).count() == 1
    # zero delay = no limit; empty robots = no limits at all
    robots0 = spark.createDataFrame(
        [("one.example", "User-agent: *\nCrawl-delay: 0\n")],
        "host string, robots_txt string",
    )
    assert politeness_budget(urls, robots0, window_seconds=60.0).count() == 5
    empty = spark.createDataFrame([], "host string, robots_txt string")
    assert politeness_budget(urls, empty, window_seconds=60.0).count() == 5


def test_politeness_budget_review_edges(spark):
    """Review-pinned edges: (a) a tiny float Crawl-delay whose cap
    would overflow INT32 means unlimited, never a CAST_OVERFLOW crash
    or a wrapped-negative zero-row host; (b) default_delay governs
    hosts ABSENT from the robots frame, while an explicit zero delay
    still opts out of it; (c) caller columns named after internal
    working names round-trip untouched."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
        politeness_budget,
    )

    urls = spark.createDataFrame(
        [
            (h, i, f"http://{h}/p/{i}")
            for h in ("tiny.example", "norobots.example", "optout.example")
            for i in range(6)
        ],
        "h string, i long, url string",
    )
    robots = spark.createDataFrame(
        [
            # rfc9309 mode accepts floats: cap = floor(60 / 1e-9) >> INT32
            ("tiny.example", "User-agent: *\nCrawl-delay: 0.000000001\n"),
            ("optout.example", "User-agent: *\nCrawl-delay: 0\n"),
        ],
        "host string, robots_txt string",
    )
    out = politeness_budget(
        urls, robots, window_seconds=60.0, rep="rfc9309", default_delay=30.0
    )
    per_host = {
        r["h"]: r["c"]
        for r in out.groupBy("h").agg(F.count("*").alias("c")).collect()
    }
    assert per_host == {
        "tiny.example": 6,      # overflow-range cap = unlimited
        "norobots.example": 2,  # absent host: default floor(60/30)=2
        "optout.example": 6,    # explicit 0 beats default_delay
    }

    # internal-name caller columns survive the round trip
    clash = urls.withColumnsRenamed({"h": "__cap", "i": "__has_robots"})
    back = politeness_budget(
        clash, robots, window_seconds=60.0, rep="rfc9309", default_delay=30.0
    )
    assert back.columns == ["__cap", "__has_robots", "url"]
    assert back.count() == out.count()


def test_politeness_budget_hostless_rows_pass_through(spark):
    """Rows whose URL yields no host have no site to budget — they
    pass through (for downstream validation to route), instead of
    pooling into ONE shared NULL pseudo-host that default_delay's cap
    would silently truncate."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
        politeness_budget,
    )

    urls = spark.createDataFrame(
        [(f"garbage-{i}",) for i in range(5)]
        + [(f"http://real.example/p/{i}",) for i in range(5)],
        "url string",
    )
    robots = spark.createDataFrame(
        [("real.example", "User-agent: *\nCrawl-delay: 30\n")],
        "host string, robots_txt string",
    )
    out = politeness_budget(
        urls, robots, window_seconds=60.0, rep="rfc9309", default_delay=20.0
    ).collect()
    got = sorted(r["url"] for r in out)
    # all 5 hostless rows survive (default cap floor(60/20)=3 must
    # NOT apply to them); real.example is capped at floor(60/30)=2
    assert [u for u in got if u.startswith("garbage")] == [
        f"garbage-{i}" for i in range(5)
    ]
    assert len([u for u in got if u.startswith("http")]) == 2
