"""Deterministic sampling / dataset-split operator tests: engine
parity via the DuckDB differential harness (the md5 path must give
IDENTICAL membership in any engine) + stability and split-law
properties the operator guarantees at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import sampling

from .oracle_harness import compare

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_matches_duckdb(spark, sf_dir):
    """Split membership (not just counts) matches DuckDB exactly."""

    def q(spark, sf_dir):
        docs = catalog.table(spark, sf_dir, "documents")
        return (
            sampling.train_val_test_split(docs, "doc_id", WEIGHTS)
            .groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"),
            )
            .orderBy("split")
        )

    oracle = f"""
    SELECT {sampling.split_column_sql("doc_id", WEIGHTS)} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY 1 ORDER BY split
    """
    compare(spark, sf_dir, q, oracle)


def test_sample_matches_duckdb(spark, sf_dir):
    def q(spark, sf_dir):
        docs = catalog.table(spark, sf_dir, "documents")
        return (
            sampling.deterministic_sample(docs, "doc_id", 0.25)
            .select("doc_id")
            .orderBy("doc_id")
        )

    oracle = f"""
    SELECT doc_id FROM documents
    WHERE {sampling.md5_sample_key_sql("doc_id")} < '4000'
    ORDER BY doc_id
    """
    compare(spark, sf_dir, q, oracle)


def test_sample_partition_independent(spark, sf_dir):
    """Same membership regardless of physical layout — the property
    df.sample() lacks and the reason this operator exists."""
    docs = catalog.table(spark, sf_dir, "documents")
    a = sorted(
        r[0] for r in sampling.deterministic_sample(docs, "doc_id", 0.3).select("doc_id").collect()
    )
    b = sorted(
        r[0]
        for r in sampling.deterministic_sample(docs.repartition(7), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_split_disjoint_and_exhaustive(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    total = docs.count()
    counts = dict(
        (r["split"], r["n"])
        for r in sampling.train_val_test_split(docs, "doc_id", WEIGHTS)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(counts.values()) == total
    # weights hold approximately (hash uniformity)
    assert abs(counts.get("train", 0) / total - 0.8) < 0.1


def test_xxhash_sample_stable_and_maponly(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents")
    a = sorted(r[0] for r in sampling.xxhash_sample(docs, "doc_id", 0.2).select("doc_id").collect())
    b = sorted(
        r[0]
        for r in sampling.xxhash_sample(docs.repartition(5), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    )
    assert a == b
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n
    # the sample is a pure filter: no shuffle anywhere in the plan
    plan = sampling.xxhash_sample(docs, "doc_id", 0.2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_threshold_edges():
    assert sampling._threshold_hex(0.0) == "0000"
    assert sampling._threshold_hex(0.5) == "8000"
    # 1.0 must sort after EVERY 4-hex key under string comparison —
    # '10000' would not ('1' < 'f'); the sentinel 'g' does
    assert sampling._threshold_hex(1.0) == "g"
    assert "ffff" < sampling._threshold_hex(1.0)


def test_sample_monotone_subset(spark, sf_dir):
    """Growing the fraction only ADDS members (hash-threshold
    property) — the guarantee that lets a curation pipeline scale a
    sample up without resampling the world."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    small = {r[0] for r in sampling.deterministic_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    big = {r[0] for r in sampling.deterministic_sample(docs, "doc_id", 0.4).select("doc_id").collect()}
    assert small <= big
    assert len(small) < len(big)


def test_stratified_sample_matches_duckdb(spark, sf_dir):
    """Per-stratum membership matches DuckDB exactly (not just the
    counts) — language-balanced curation is reproducible anywhere."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    fr = {"en": 0.2, "de": 0.8, "fr": 1.0}

    def q(spark, sf_dir):
        docs = catalog.table(spark, sf_dir, "documents")
        return (
            sampling.stratified_sample(docs, "lang", fr, "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
            .orderBy("lang")
        )

    oracle = f"""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    WHERE {sampling.stratified_sample_sql("lang", fr, "doc_id")}
    GROUP BY lang ORDER BY lang
    """
    compare(spark, sf_dir, q, oracle)


def test_stratified_sample_drops_unlisted_and_scales(spark, sf_dir):
    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    got = sampling.stratified_sample(docs, "lang", {"en": 1.0}, "doc_id")
    n_en = docs.filter(F.col("lang") == "en").count()
    assert got.count() == n_en  # fraction 1.0 keeps all, others dropped
    assert {r[0] for r in got.select("lang").distinct().collect()} == {"en"}


def test_resample_to_mixture_hits_target_shares(spark):
    """Skewed 4-source corpus resampled onto temperature-0.5 weights:
    realized token shares land on the target (±2%), the most
    up-weighted sources keep every document, and membership is
    partition-independent."""
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.sampling import (
        resample_to_mixture,
    )
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.text import (
        token_count,
    )

    sizes = {"big": 1000, "mid": 500, "small1": 250, "small2": 250}
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"tok{i} tok{i} tok{i} tok{i}", src))  # 4 tokens each
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # target: temperature-0.5 (w ∝ sqrt(tokens)), same math as
    # source_mixture_weights
    tok = {s: n * 4 for s, n in sizes.items()}
    total = sum(tok.values())
    pw = {s: t**0.5 for s, t in tok.items()}
    z = sum(pw.values())
    weights = spark.createDataFrame(
        [(s, tok[s] / total, pw[s] / z) for s in sizes],
        "source string, token_share double, sample_weight_t05 double",
    )

    out = resample_to_mixture(docs, weights)
    realized = {
        r["source"]: r["t"]
        for r in out.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    rt = sum(realized.values())
    for s in sizes:
        target = pw[s] / z
        assert abs(realized[s] / rt - target) < 0.02, (s, realized[s] / rt, target)
    # the most up-weighted strata (highest w/p) keep everything
    kept = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert kept["small1"] == 250 and kept["small2"] == 250
    assert kept["big"] < 1000  # the dominant source downsampled
    # partition independence
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    again = {
        r["doc_id"]
        for r in resample_to_mixture(docs.repartition(13), weights)
        .select("doc_id")
        .collect()
    }
    assert again == ids
