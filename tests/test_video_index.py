"""Streaming video near-dup index: the two-tier contract — the
stored read-time view (ubiquity cap + fraction cut) equals the batch
operator over the accumulated corpus EXACTLY (any chunking, replays,
checkpoint restart), and the emitted candidate stream never misses a
final pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.video_fp import (
    _VARIANTS,
    synthetic_near_dup_video_corpus,
    video_near_dup_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.video_index import (
    fold_video_index,
    stored_video_pairs,
    video_index_writer,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    """6 duplicate groups × 4 variants, materialized once so batch
    slicing never regenerates the corpus."""
    docs = catalog.table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 6 * _VARIANTS
    )
    rows = [
        (r["doc_id"], bytearray(r["blob"]))
        for r in synthetic_near_dup_video_corpus(docs).collect()
    ]
    return spark.createDataFrame(
        [(d, bytes(b)) for d, b in rows], "doc_id long, blob binary"
    )


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): r["shared_probes"]
        for r in df.select("doc_a", "doc_b", "shared_probes").collect()
    }


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stored_equals_batch_and_stream_never_misses(
    spark, tmp_path, media, n_batches
):
    want = _pairs(video_near_dup_pairs(media))
    assert len(want) == 6 * 6  # complete groups

    index = ParquetTable(spark, str(tmp_path / f"vi{n_batches}"))
    emitted: dict = {}
    n_docs = media.count()
    per = (n_docs + n_batches - 1) // n_batches
    for i in range(n_batches):
        found = fold_video_index(
            index,
            media.filter(
                (F.col("doc_id") >= i * per)
                & (F.col("doc_id") < (i + 1) * per)
            ),
            batch_id=i,
        )
        for k, v in _pairs(found).items():
            emitted[k] = max(emitted.get(k, 0), v)
    assert _pairs(stored_video_pairs(index)) == want
    for k in want:
        assert k in emitted, k


def test_cross_batch_discovery(spark, tmp_path, media):
    """A duplicate whose two renditions arrive in DIFFERENT batches
    must be emitted by the later fold, via the store."""
    index = ParquetTable(spark, str(tmp_path / "vc"))
    # batch 0: group 0's original + group 1 complete; batch 1: the
    # q40 re-encode of group 0
    p0 = _pairs(fold_video_index(
        index,
        media.filter("doc_id = 0 or (doc_id >= 4 and doc_id < 8)"),
        batch_id=0,
    ))
    assert (0, 1) not in p0
    p1 = _pairs(fold_video_index(
        index, media.filter("doc_id = 1"), batch_id=1
    ))
    assert (0, 1) in p1  # discovered across batches
    assert p1[(0, 1)] >= 6


def test_replay_is_exactly_once(spark, tmp_path, media):
    index = ParquetTable(spark, str(tmp_path / "vr"))
    first = media.filter("doc_id < 6")
    p1 = _pairs(fold_video_index(index, first, batch_id=0))
    n_rows = index.read().count()
    p1r = _pairs(fold_video_index(index, first, batch_id=0))
    assert index.read().count() == n_rows  # idempotent append
    assert set(p1r) >= set(p1)
    fold_video_index(index, media.filter("doc_id >= 6"), batch_id=1)
    assert _pairs(stored_video_pairs(index)) == _pairs(
        video_near_dup_pairs(media)
    )


def test_fraction_cut_is_read_time_only(spark, tmp_path, media):
    """The emitted stream filters by the absolute floor only; the
    fraction cut applies in the exact view. A pair that the floor
    passes but the fraction rejects may be emitted — and must NOT
    appear in stored_video_pairs with a high threshold."""
    index = ParquetTable(spark, str(tmp_path / "vf"))
    fold_video_index(index, media, batch_id=0)
    loose = _pairs(stored_video_pairs(index, min_shared_frac=0.0))
    tight = _pairs(stored_video_pairs(index, min_shared_frac=0.99))
    assert set(tight) <= set(loose)
    # 0.99 keeps only near-complete overlaps (brightness/truncated
    # exact-invariance pairs), drops the q40 re-encode pairs
    assert len(tight) < len(loose)


def test_writer_checkpoint_restart_and_pair_table(
    spark, tmp_path, media
):
    index = ParquetTable(spark, str(tmp_path / "vs"))
    pairs = ParquetTable(spark, str(tmp_path / "vp"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    media.filter("doc_id < 10").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                video_index_writer(index, pairs, compact_at_files=2)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    media.filter("doc_id >= 10").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    want = _pairs(video_near_dup_pairs(media))
    assert _pairs(stored_video_pairs(index)) == want
    table_pairs = _pairs(pairs.read())
    for k in want:
        assert k in table_pairs, k
    assert media.count() == index.read().select(
        "doc_id"
    ).distinct().count()


def test_empty_and_corrupt_batches_are_safe(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "ve"))
    empty = spark.createDataFrame([], "doc_id long, blob binary")
    assert fold_video_index(index, empty, batch_id=0).count() == 0
    junk = spark.createDataFrame(
        [(1, bytearray(b"not a video"))], "doc_id long, blob binary"
    )
    assert fold_video_index(index, junk, batch_id=1).count() == 0
    assert index.current_version() == 0 or index.read().count() == 0
