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
    # Assert on the TRACKED frames themselves, not the session-wide
    # getPersistentRDDs count: earlier suites' localCheckpoint blocks
    # linger there until the ContextCleaner collects them, so both an
    # absolute == 0 and a count delta race GC timing (the former
    # fired once the r10 audio suites ran first; a reviewer showed
    # the delta form races the other way). What this test owns is the
    # REGISTRY contract: the previous query's tracked frames are
    # persisted during its action and unpersisted by the next query.
    jaccard = registry.QUERIES["dedup_pair_methods"]
    jaccard(spark, SF).collect()
    live = list(cache._LIVE)
    assert live, "the posting table should be tracked-persisted"
    assert any(
        f.storageLevel.useMemory or f.storageLevel.useDisk for f in live
    )

    # invoking ANY next registry query frees the previous one's caches
    registry.QUERIES["text_token_stats"](spark, SF).collect()
    assert all(
        not f.storageLevel.useMemory and not f.storageLevel.useDisk
        for f in live
    )
    assert not any(f is g for f in live for g in cache._LIVE)

    cache.release_tracked()


def test_release_tracked_is_idempotent(spark):
    assert cache.release_tracked() == 0
