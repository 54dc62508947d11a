"""Persisted self-join intermediates must not leak across registry
queries: invoking the next registered query releases the previous
query's tracked caches (ADVICE round 1)."""

from __future__ import annotations

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators import cache

SF = "/root/testdata/sf0.001"


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_registry_releases_previous_querys_caches(spark):
    registry.load_all_queries()
    cache.release_tracked()
    # DELTA-based, not absolute-zero: earlier tests' localCheckpoint
    # blocks linger in getPersistentRDDs until the ContextCleaner
    # collects them (GC-timing dependent), so an absolute == 0 was
    # latently flaky against suite ordering (fired once the r10
    # audio suites ran first). What this test owns is the REGISTRY
    # contract: the next query releases the previous one's tracked
    # caches — a delta against the pre-query baseline.
    base = _n_cached(spark)

    jaccard = registry.QUERIES["dedup_pair_methods"]
    jaccard(spark, SF).collect()
    assert _n_cached(spark) > base  # posting table persisted

    # invoking ANY next registry query frees the previous one's caches
    registry.QUERIES["text_token_stats"](spark, SF).collect()
    assert _n_cached(spark) <= base

    cache.release_tracked()


def test_release_tracked_is_idempotent(spark):
    assert cache.release_tracked() == 0
