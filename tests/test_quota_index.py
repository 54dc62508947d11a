"""Streaming per-site quota with a persistent member index: folding
URL batches in ANY chunking converges the index to EXACTLY the batch
``per_host_quota`` keep-set (over distinct URLs — the documented
deviation), with displacement evictions reported, exactly-once
replays, a derived admitted-table kept in lockstep (deletes applied),
and a real file stream across a checkpoint restart."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.crawl_quota import (
    per_host_quota,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.quota_index import (
    fold_quota_index,
    quota_index_writer,
)

K = 4
N = 120
HOSTS = 6


def _urls(spark, n=N, hosts=HOSTS):
    return spark.range(n).select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % hosts).cast("string"),
            F.lit(".example/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )


def _keep_set(df, url_col="url"):
    return {r[url_col] for r in df.select(url_col).collect()}


@pytest.mark.parametrize("chunks", [1, 4])
def test_folded_index_equals_batch_quota(spark, tmp_path, chunks):
    urls = _urls(spark).persist()
    try:
        want = _keep_set(per_host_quota(urls.distinct(), k=K))
        assert len(want) == K * HOSTS

        index = ParquetTable(spark, str(tmp_path / f"qidx{chunks}"))
        for i in range(chunks):
            chunk = urls.filter(
                F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(chunks)) == i
            )
            fold_quota_index(index, chunk, k=K, batch_id=i)
        stored = index.read().collect()
        assert {r["url"] for r in stored} == want
        # rank slots are a dense 1..count per site, count <= k
        by_site: dict = {}
        for r in stored:
            by_site.setdefault(r["site"], []).append(r["rank"])
        for site, ranks in by_site.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), site
            assert len(ranks) <= K
    finally:
        urls.unpersist()


def test_displacement_evicts_and_reports(spark, tmp_path):
    """A later batch with smaller hashes DISPLACES earlier members:
    the delta reports both sides and the index converges to the
    global k-smallest — regardless of arrival order."""
    urls = _urls(spark, n=60, hosts=1).persist()
    try:
        hashed = sorted(
            (r["h"], r["url"])
            for r in urls.withColumn("h", F.xxhash64("url")).collect()
        )
        ordered = [u for _, u in hashed]  # ascending hash
        want = set(ordered[:K])

        # batch 0 = the WORST half (largest hashes); batch 1 = the best
        index = ParquetTable(spark, str(tmp_path / "qidx_disp"))
        worst = spark.createDataFrame(
            [(u,) for u in ordered[30:]], "url string"
        )
        d0 = fold_quota_index(index, worst, k=K, batch_id=0).collect()
        assert {r["change"] for r in d0} == {"admitted"}
        assert {r["url"] for r in d0} == set(ordered[30 : 30 + K])

        best = spark.createDataFrame(
            [(u,) for u in ordered[:30]], "url string"
        )
        d1 = fold_quota_index(index, best, k=K, batch_id=1).collect()
        admitted = {r["url"] for r in d1 if r["change"] == "admitted"}
        evicted = {r["url"] for r in d1 if r["change"] == "evicted"}
        assert admitted == want
        assert evicted == set(ordered[30 : 30 + K])  # full displacement
        assert _keep_set(index.read()) == want
    finally:
        urls.unpersist()


def test_replay_is_exactly_once(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "qidx_replay"))
    batch = _urls(spark, n=40)
    assert fold_quota_index(index, batch, k=K, batch_id=0).count() > 0
    v = index.current_version()
    # replayed fold: index already converged → empty delta, no commit
    assert fold_quota_index(index, batch, k=K, batch_id=0).count() == 0
    assert index.current_version() == v
    # a no-op later batch (all worse) also commits nothing
    assert fold_quota_index(index, batch, k=K, batch_id=1).count() == 0
    assert index.current_version() == v


def test_writer_maintains_admitted_table(spark, tmp_path):
    """The foreachBatch writer keeps the derived admitted-url table in
    lockstep: admissions merge, evictions DELETE, replays converge."""
    index = ParquetTable(spark, str(tmp_path / "qidx_w"))
    admitted = ParquetTable(spark, str(tmp_path / "qadm_w"))
    handle = quota_index_writer(index, k=K, admitted_table=admitted)

    urls = _urls(spark, n=60, hosts=1)
    hashed = sorted(
        (r["h"], r["url"])
        for r in urls.withColumn("h", F.xxhash64("url")).collect()
    )
    ordered = [u for _, u in hashed]

    worst = spark.createDataFrame([(u,) for u in ordered[30:]], "url string")
    best = spark.createDataFrame([(u,) for u in ordered[:30]], "url string")
    handle(worst, 0)
    assert _keep_set(admitted.read()) == set(ordered[30 : 30 + K])
    handle(best, 1)
    handle(best, 1)  # replay: must converge, not duplicate or re-delete
    want = set(ordered[:K])
    assert _keep_set(admitted.read()) == want
    assert _keep_set(index.read()) == want
    # the derived table mirrors the index EXACTLY (evictions deleted)
    assert admitted.read().count() == K


def test_registered_domain_pooling_with_psl(spark, tmp_path):
    """by='registered_domain' + a PSL table pools subdomains into one
    budget while keeping ccTLD registrants apart — composed through
    the same streaming fold."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.psl import (
        psl_frame,
    )

    psl = psl_frame(spark, ["com", "uk", "co.uk"])
    rows = [
        (f"http://{sub}.a.co.uk/{i}",)
        for sub in ("x", "y", "z")
        for i in range(4)
    ] + [(f"http://b.co.uk/{i}",) for i in range(6)]
    urls = spark.createDataFrame(rows, "url string")
    index = ParquetTable(spark, str(tmp_path / "qidx_psl"))
    fold_quota_index(
        index, urls, k=3, batch_id=0, by="registered_domain", psl=psl
    )
    stored = index.read().collect()
    per_site = {}
    for r in stored:
        per_site.setdefault(r["site"], set()).add(r["url"])
    # a.co.uk pools x/y/z subdomains into ONE 3-slot budget; b.co.uk
    # keeps its own (two-label would have merged both into 'co.uk')
    assert set(per_site) == {"a.co.uk", "b.co.uk"}
    assert len(per_site["a.co.uk"]) == 3
    assert len(per_site["b.co.uk"]) == 3


def test_real_file_stream_with_checkpoint_restart(spark, tmp_path):
    """URL batches arrive as parquet FILES via readStream → the
    foreachBatch writer — across a real checkpoint restart; re-arrived
    files (replay scenario) must not leak budget. The index equals the
    batch quota over everything that ever arrived."""
    src = tmp_path / "in"
    src.mkdir()
    index = ParquetTable(spark, str(tmp_path / "qidx_s"))
    ckpt = str(tmp_path / "ckpt")
    urls = _urls(spark, n=N).persist()
    try:
        parts = [
            urls.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
            for i in range(3)
        ]
        parts[0].coalesce(1).write.parquet(str(src / "b0"))
        parts[1].coalesce(1).write.parquet(str(src / "b1"))

        def run_until_idle():
            stream = (
                spark.readStream.schema("url string")
                .option("pathGlobFilter", "*.parquet")
                .option("recursiveFileLookup", "true")
                .parquet(str(src))
                .writeStream.foreachBatch(quota_index_writer(index, k=K))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert stream.awaitTermination(120)

        run_until_idle()
        partial = _keep_set(index.read())
        want_partial = _keep_set(
            per_host_quota(parts[0].unionByName(parts[1]).distinct(), k=K)
        )
        assert partial == want_partial

        # late shard + restart from the same checkpoint
        parts[2].coalesce(1).write.parquet(str(src / "b2"))
        time.sleep(1.1)  # distinct file mtimes for the source log
        run_until_idle()
        assert _keep_set(index.read()) == _keep_set(
            per_host_quota(urls.distinct(), k=K)
        )
    finally:
        urls.unpersist()


def test_writer_eviction_deletes_are_chunked(spark, tmp_path, monkeypatch):
    """A batch displacing more members than one driver chunk deletes
    in waves (review r8: the old loud error would re-fire on every
    checkpoint replay of the same batch — an unrecoverable wedge)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming import (
        quota_index as qi,
    )

    monkeypatch.setattr(qi, "_MAX_IN_LIST", 3)
    index = ParquetTable(spark, str(tmp_path / "qidx_chunk"))
    admitted = ParquetTable(spark, str(tmp_path / "qadm_chunk"))
    handle = qi.quota_index_writer(index, k=8, admitted_table=admitted)

    urls = _urls(spark, n=40, hosts=1)
    hashed = sorted(
        (r["h"], r["url"])
        for r in urls.withColumn("h", F.xxhash64("url")).collect()
    )
    ordered = [u for _, u in hashed]
    worst = spark.createDataFrame([(u,) for u in ordered[20:]], "url string")
    best = spark.createDataFrame([(u,) for u in ordered[:20]], "url string")
    handle(worst, 0)
    handle(best, 1)  # displaces all 8 members -> 3 delete chunks
    want = set(ordered[:8])
    assert _keep_set(admitted.read()) == want
    assert _keep_set(index.read()) == want
