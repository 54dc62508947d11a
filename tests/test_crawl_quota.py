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
