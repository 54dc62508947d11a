"""Streaming MinHash-LSH near-dup index: chunked-streaming union of
emitted pairs must equal the batch minhash_candidates over the whole
corpus (including est_jaccard), under any chunking; replays fold
exactly once; the index table carries one band row per (doc, band)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.dedup import (
    minhash_candidates,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.dedup_index import (
    fold_near_dup_index,
    near_dup_index_writer,
)

N_DOCS = 400  # enough shingle collisions in the corpus for real pairs


def _docs(spark, sf_dir):
    return (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
    )


def _pairs_set(df):
    return {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9)) for r in df.collect()
    }


@pytest.mark.parametrize("chunks", [1, 3])
def test_streamed_pairs_equal_batch_candidates(spark, sf_dir, tmp_path, chunks):
    docs = _docs(spark, sf_dir)
    want = _pairs_set(minhash_candidates(docs))
    assert want, "expected candidate pairs in the corpus slice"

    index = ParquetTable(spark, str(tmp_path / f"idx{chunks}"))
    got: set = set()
    per = (N_DOCS + chunks - 1) // chunks
    for i in range(chunks):
        chunk = docs.filter(
            (F.col("doc_id") >= i * per) & (F.col("doc_id") < (i + 1) * per)
        )
        got |= _pairs_set(fold_near_dup_index(index, chunk, batch_id=i))
    assert got == want


def test_arrival_order_does_not_change_pairs(spark, sf_dir, tmp_path):
    """Chunking by doc_id parity (interleaved ids across batches)
    yields the same pair set — discovery order is immaterial."""
    docs = _docs(spark, sf_dir)
    want = _pairs_set(minhash_candidates(docs))
    index = ParquetTable(spark, str(tmp_path / "idx_parity"))
    got = _pairs_set(
        fold_near_dup_index(index, docs.filter(F.col("doc_id") % 2 == 0), batch_id=0)
    )
    got |= _pairs_set(
        fold_near_dup_index(index, docs.filter(F.col("doc_id") % 2 == 1), batch_id=1)
    )
    assert got == want


def test_replayed_batch_is_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch replay: same batch_id re-emits identical pairs and
    the index does NOT double-append (a doubled index would make the
    next batch see duplicate band rows)."""
    docs = _docs(spark, sf_dir)
    index = ParquetTable(spark, str(tmp_path / "idx_replay"))
    first = docs.filter(F.col("doc_id") < 200)
    p1 = _pairs_set(fold_near_dup_index(index, first, batch_id=0))
    rows_after_first = index.read().count()
    # replay batch 0 (simulated checkpoint recovery)
    p1_replay = _pairs_set(fold_near_dup_index(index, first, batch_id=0))
    assert index.read().count() == rows_after_first  # append was idempotent
    # replay emits a superset-consistent view: identical in-batch pairs
    # plus possibly the same pairs rediscovered via the index — keyed
    # pair sinks converge either way; the PAIR SET must not change
    assert {p[:2] for p in p1_replay} >= {p[:2] for p in p1}
    second = docs.filter(F.col("doc_id") >= 200)
    p2 = _pairs_set(fold_near_dup_index(index, second, batch_id=1))
    assert _pairs_set(minhash_candidates(docs)) == p1 | p2


def test_writer_maintains_keyed_pair_table(spark, sf_dir, tmp_path):
    """The foreachBatch writer: pairs land keyed on (id_a, id_b) so a
    replay converges; index and pair tables stay consistent."""
    docs = _docs(spark, sf_dir)
    index = ParquetTable(spark, str(tmp_path / "idx_w"))
    pairs = ParquetTable(spark, str(tmp_path / "pairs_w"))
    handle = near_dup_index_writer(index, pairs)
    handle(docs.filter(F.col("doc_id") < 200), 0)
    handle(docs.filter(F.col("doc_id") >= 200), 1)
    # replay batch 1
    handle(docs.filter(F.col("doc_id") >= 200), 1)
    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
        for r in pairs.read().collect()
    }
    assert got == _pairs_set(minhash_candidates(docs))
    # one band row per (doc, band): 4 bands by default
    per_doc = index.read().groupBy("doc_id").count().select("count").distinct()
    assert [r["count"] for r in per_doc.collect()] == [4]


def test_empty_and_shingleless_batches_are_safe(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "idx_e"))
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert fold_near_dup_index(index, empty, batch_id=0).count() == 0
    # a doc too short for a 3-gram shingle produces no band rows
    tiny = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert fold_near_dup_index(index, tiny, batch_id=1).count() == 0
    assert index.read().count() == 0


def test_real_stream_with_checkpoint_restart(spark, sf_dir, tmp_path):
    """End-to-end readStream → foreachBatch writer across a restart:
    the pair table converges to the batch candidate set exactly."""
    docs = _docs(spark, sf_dir)
    index = ParquetTable(spark, str(tmp_path / "idx_s"))
    pairs = ParquetTable(spark, str(tmp_path / "pairs_s"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    chunks = [
        docs.filter(F.col("doc_id") < 150),
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)),
        docs.filter(F.col("doc_id") >= 300),
    ]
    chunks[0].coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(near_dup_index_writer(index, pairs))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    chunks[1].coalesce(1).write.mode("append").parquet(src)
    chunks[2].coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
        for r in pairs.read().collect()
    }
    assert got == _pairs_set(minhash_candidates(docs))


def test_writer_inline_compaction_bounds_files(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    index = ParquetTable(spark, str(tmp_path / "idx_c"))
    pairs = ParquetTable(spark, str(tmp_path / "pairs_c"))
    handle = near_dup_index_writer(index, pairs, compact_at_files=2)
    for i in range(4):
        handle(docs.filter(F.col("doc_id") % 4 == i), i)
    assert len(index.files()) < 4
    got = {
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
        for r in pairs.read().collect()
    }
    assert got == _pairs_set(minhash_candidates(docs))


def test_random_chunkings_equal_batch_candidates(spark, sf_dir, tmp_path):
    """Hypothesis-style model check with fixed seeds: ANY partition of
    the corpus into arrival batches yields the batch candidate set."""
    docs = _docs(spark, sf_dir)
    want = _pairs_set(minhash_candidates(docs))
    for seed in (7, 23):
        n_chunks = 2 + seed % 3
        index = ParquetTable(spark, str(tmp_path / f"idx_r{seed}"))
        got: set = set()
        for i in range(n_chunks):
            # deterministic pseudo-random assignment of docs to batches
            chunk = docs.filter(
                F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed)), F.lit(n_chunks))
                == i
            )
            got |= _pairs_set(fold_near_dup_index(index, chunk, batch_id=i))
        assert got == want, f"seed={seed}"
