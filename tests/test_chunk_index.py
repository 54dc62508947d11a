"""Streaming chunk-hash index: reading the stored index must equal
the batch CDC operators over the accumulated corpus — under any
chunking, for any read-time (max_posting, min_chunk_bytes), through
replays, count compaction, and a real checkpoint restart. (VERDICT
r9 #1 / SURVEY §2.10's deferred design brief: counts fold
associatively per batch; the ubiquity cap is a query-time filter.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (
    chunk_dedup_stats,
    chunk_documents,
    shared_chunk_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.chunk_index import (
    chunk_index_writer,
    compact_chunk_counts,
    fold_chunk_index,
    stored_chunk_counts,
    stored_chunk_dedup_stats,
    stored_shared_chunk_pairs,
)

N_DOCS = 300


def _docs(spark, sf_dir):
    return (
        catalog.table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
    )


def _stats_set(df):
    return {
        (
            r["chunk_hash"],
            r["n_docs"],
            r["n_occurrences"],
            r["chunk_bytes"],
            r["duplicate_bytes"],
        )
        for r in df.collect()
    }


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["shared_chunks"]) for r in df.collect()
    }


def _batch_views(docs, max_posting=64, min_chunk_bytes=64):
    chunks = chunk_documents(docs)
    return (
        _stats_set(chunk_dedup_stats(chunks, min_chunk_bytes)),
        _pairs_set(shared_chunk_pairs(chunks, max_posting, min_chunk_bytes)),
    )


@pytest.mark.parametrize("n_batches", [1, 3])
def test_streamed_reads_equal_batch(spark, sf_dir, tmp_path, n_batches):
    docs = _docs(spark, sf_dir)
    want_stats, want_pairs = _batch_views(docs)
    assert want_stats, "corpus slice must contain duplicate chunks"

    counts = ParquetTable(spark, str(tmp_path / f"c{n_batches}"))
    postings = ParquetTable(spark, str(tmp_path / f"p{n_batches}"))
    per = (N_DOCS + n_batches - 1) // n_batches
    for i in range(n_batches):
        fold_chunk_index(
            counts,
            postings,
            docs.filter(
                (F.col("doc_id") >= i * per)
                & (F.col("doc_id") < (i + 1) * per)
            ),
            batch_id=i,
        )
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings))
        == want_pairs
    )


def test_cap_and_tail_are_read_time(spark, tmp_path):
    """A hash whose document frequency crosses the ubiquity cap only
    ACROSS batches must be dropped by the read exactly as the batch
    operator drops it — the brief's non-trivial case (corpus-wide
    frequency is unknowable at fold time). Synthetic corpus: 4 docs
    share an 800-byte boilerplate prefix (its content-defined chunks
    are hash-identical across docs), 2 docs per batch."""
    boiler = " ".join(f"boilerplate sentence number {i}." for i in range(40))
    rows = [
        (i, boiler + f" unique tail of document {i} " * 8)
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    counts = ParquetTable(spark, str(tmp_path / "cc"))
    postings = ParquetTable(spark, str(tmp_path / "cp"))
    fold_chunk_index(counts, postings, docs.filter("doc_id < 2"), batch_id=0)
    fold_chunk_index(counts, postings, docs.filter("doc_id >= 2"), batch_id=1)

    # sanity: some hash is carried by all 4 docs (so cap 2/3 bites)
    top = stored_chunk_counts(counts).agg(F.max("n_docs")).collect()[0][0]
    assert top == 4
    for cap in (2, 3, 64):
        for tail in (0, 64, 200):
            want = _pairs_set(
                shared_chunk_pairs(chunk_documents(docs), cap, tail)
            )
            got = _pairs_set(
                stored_shared_chunk_pairs(counts, postings, cap, tail)
            )
            assert got == want, f"cap={cap} tail={tail}"
            assert _stats_set(
                stored_chunk_dedup_stats(counts, tail)
            ) == _stats_set(
                chunk_dedup_stats(chunk_documents(docs), tail)
            ), f"tail={tail}"
    # cap=2 genuinely dropped the 4-doc boilerplate pairs
    assert _pairs_set(
        stored_shared_chunk_pairs(counts, postings, 2, 64)
    ) != _pairs_set(stored_shared_chunk_pairs(counts, postings, 64, 64))


def test_replayed_batch_is_exactly_once(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    counts = ParquetTable(spark, str(tmp_path / "rc"))
    postings = ParquetTable(spark, str(tmp_path / "rp"))
    first = docs.filter(F.col("doc_id") < 150)
    fold_chunk_index(counts, postings, first, batch_id=0)
    c_rows, p_rows = counts.read().count(), postings.read().count()
    # replay (simulated foreachBatch retry): both ledgers skip
    fold_chunk_index(counts, postings, first, batch_id=0)
    assert counts.read().count() == c_rows
    assert postings.read().count() == p_rows
    fold_chunk_index(
        counts, postings, docs.filter(F.col("doc_id") >= 150), batch_id=1
    )
    want_stats, want_pairs = _batch_views(docs)
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings))
        == want_pairs
    )


def test_count_compaction_preserves_reads_and_ledger(
    spark, sf_dir, tmp_path
):
    """compact_chunk_counts folds partials to one row per hash with
    identical reads — and because it commits maintenance-marked, a
    foreachBatch retry arriving AFTER the compaction still skips
    (an overwrite here would double-apply the batch)."""
    docs = _docs(spark, sf_dir)
    counts = ParquetTable(spark, str(tmp_path / "kc"))
    postings = ParquetTable(spark, str(tmp_path / "kp"))
    fold_chunk_index(counts, postings, docs.filter("doc_id < 100"), batch_id=0)
    fold_chunk_index(
        counts, postings,
        docs.filter("doc_id >= 100 and doc_id < 200"), batch_id=1,
    )
    before = _stats_set(stored_chunk_dedup_stats(counts))
    n_hashes = stored_chunk_counts(counts).count()
    assert counts.read().count() > n_hashes  # partials really overlap
    compact_chunk_counts(counts)
    assert counts.read().count() == n_hashes  # one row per hash
    assert _stats_set(stored_chunk_dedup_stats(counts)) == before
    # replay of batch 1 after compaction: the guard walks past the
    # maintenance commit to batch 1's data commit and skips
    fold_chunk_index(
        counts, postings,
        docs.filter("doc_id >= 100 and doc_id < 200"), batch_id=1,
    )
    assert counts.read().count() == n_hashes
    # and the NEXT real batch still folds correctly
    fold_chunk_index(counts, postings, docs.filter("doc_id >= 200"), batch_id=2)
    want_stats, want_pairs = _batch_views(docs)
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings))
        == want_pairs
    )


def test_replay_skips_kernel_and_crash_window_is_cap_safe(
    spark, tmp_path
):
    """Self-review catches, pinned: (a) a FULLY-applied replay
    returns an empty frame without re-running the chunking kernel or
    touching either table; (b) commit order is counts-first with the
    postings-first read pin, so in the crash window (counts carries
    a batch postings lacks) the eligibility verdict is the NEWER
    counts — a hash blown past the cap by the half-committed batch
    is excluded even though its posting rows are stale — and the
    replay heals the window back to batch equality."""
    boiler = " ".join(f"boilerplate sentence number {i}." for i in range(40))
    docs = spark.createDataFrame(
        [(i, boiler + f" unique tail of document {i} " * 8) for i in range(6)],
        "doc_id long, text string",
    )
    counts = ParquetTable(spark, str(tmp_path / "xc"))
    postings = ParquetTable(spark, str(tmp_path / "xp"))
    fold_chunk_index(counts, postings, docs.filter("doc_id < 3"), batch_id=0)

    # (a) fully-applied replay: no new versions, empty return
    vc, vp = counts.current_version(), postings.current_version()
    out = fold_chunk_index(
        counts, postings, docs.filter("doc_id < 3"), batch_id=0
    )
    assert out.count() == 0
    assert counts.current_version() == vc
    assert postings.current_version() == vp

    # (b) simulate the crash window: batch 1 commits counts, then
    # dies before the postings append (the fold's commit order)
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cdc import (  # noqa: E501
        chunk_documents as _cd,
    )

    batch1 = docs.filter("doc_id >= 3")
    ch = _cd(batch1)
    partial = ch.groupBy("chunk_hash").agg(
        F.max("length").alias("chunk_bytes"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    counts.append(
        partial.select("chunk_hash", "chunk_bytes", "n_docs",
                       "n_occurrences"),
        batch_id=1,
    )
    # with all 6 docs counted, the boilerplate hashes exceed cap=4:
    # the stale postings (3 docs) must NOT pair through them
    window_pairs = _pairs_set(
        stored_shared_chunk_pairs(counts, postings, max_posting=4)
    )
    shared_all = stored_chunk_counts(counts).filter("n_docs > 4")
    assert shared_all.count() > 0  # the blown-cap hashes exist
    # the window read is exactly: stale (batch-0) posting rows under
    # the NEW eligibility — i.e. batch pairs over batch-0 docs with
    # the hashes the full-corpus counts blew past the cap removed
    b0_chunks = chunk_documents(docs.filter("doc_id < 3"))
    survived = _pairs_set(
        shared_chunk_pairs(
            b0_chunks.join(
                shared_all.select("chunk_hash"), "chunk_hash",
                "left_anti",
            ),
            4,
        )
    )
    assert window_pairs == survived
    # the replay heals: counts ledger skips, postings applies
    fold_chunk_index(counts, postings, batch1, batch_id=1)
    want_stats, want_pairs = _batch_views(docs, max_posting=4)
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings, 4))
        == want_pairs
    )


def test_empty_and_null_batches_commit_nothing(spark, tmp_path):
    counts = ParquetTable(spark, str(tmp_path / "ec"))
    postings = ParquetTable(spark, str(tmp_path / "ep"))
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert fold_chunk_index(counts, postings, empty, batch_id=0).count() == 0
    nulls = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    assert fold_chunk_index(counts, postings, nulls, batch_id=0).count() == 0
    assert counts.current_version() == 0  # no ledger entry burned
    assert postings.current_version() == 0
    # the same batch_id later carries a REAL fold
    real = spark.createDataFrame(
        [(2, "some genuinely chunkable text " * 20)],
        "doc_id long, text string",
    )
    fold_chunk_index(counts, postings, real, batch_id=0)
    assert counts.read().count() > 0


def test_real_stream_with_checkpoint_restart(spark, sf_dir, tmp_path):
    """readStream → chunk_index_writer across a restart with late
    files: stored reads equal batch over the full corpus."""
    docs = _docs(spark, sf_dir)
    counts = ParquetTable(spark, str(tmp_path / "sc"))
    postings = ParquetTable(spark, str(tmp_path / "sp"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    parts = [
        docs.filter(F.col("doc_id") < 100),
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)),
        docs.filter(F.col("doc_id") >= 200),
    ]
    parts[0].coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                chunk_index_writer(counts, postings, compact_at_files=2)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream did not finish in time"

    run_once()
    assert counts.read().count() > 0
    parts[1].coalesce(1).write.mode("append").parquet(src)
    parts[2].coalesce(1).write.mode("append").parquet(src)
    run_once()

    want_stats, want_pairs = _batch_views(docs)
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings))
        == want_pairs
    )


def test_writer_inline_compaction_bounds_files(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    counts = ParquetTable(spark, str(tmp_path / "wc"))
    postings = ParquetTable(spark, str(tmp_path / "wp"))
    handle = chunk_index_writer(counts, postings, compact_at_files=2)
    for i in range(4):
        handle(docs.filter(F.col("doc_id") % 4 == i), i)
    assert len(counts.files()) <= 3
    assert len(postings.files()) <= 3
    want_stats, want_pairs = _batch_views(docs)
    assert _stats_set(stored_chunk_dedup_stats(counts)) == want_stats
    assert (
        _pairs_set(stored_shared_chunk_pairs(counts, postings))
        == want_pairs
    )
