"""Streaming image near-dup index: stored read-time view equals the
batch banded machinery over the accumulated corpus EXACTLY (any
chunking, replays, checkpoint restart), and the emitted candidate
stream never misses a final pair — including cross-batch discovery
and a slot cap crossed only across batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (
    _VARIANTS,
    image_near_dup_pairs,
    synthetic_near_dup_image_corpus,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.image_index import (
    fold_image_index,
    image_index_writer,
    stored_image_pairs,
    stored_signatures,
)

N_GROUPS = 6


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = catalog.table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < N_GROUPS * _VARIANTS
    )
    rows = [
        (r["doc_id"], bytearray(r["blob"]))
        for r in synthetic_near_dup_image_corpus(docs).collect()
    ]
    return spark.createDataFrame(
        [(d, bytes(b)) for d, b in rows], "doc_id long, blob binary"
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["dhash_hamming"], r["ahash_hamming"])
        for r in df.select(
            "id_a", "id_b", "dhash_hamming", "ahash_hamming"
        ).collect()
    }


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stored_equals_batch_and_stream_never_misses(
    spark, tmp_path, media, n_batches
):
    want = _pairs(image_near_dup_pairs(media))
    # complete groups: 6 groups × C(6,2) pairs
    assert len(want) == N_GROUPS * 15

    index = ParquetTable(spark, str(tmp_path / f"ii{n_batches}"))
    emitted: dict = {}
    n_docs = media.count()
    per = (n_docs + n_batches - 1) // n_batches
    for i in range(n_batches):
        found = fold_image_index(
            index,
            media.filter(
                (F.col("doc_id") >= i * per)
                & (F.col("doc_id") < (i + 1) * per)
            ),
            batch_id=i,
        )
        emitted.update(_pairs(found))
    assert _pairs(stored_image_pairs(index)) == want
    for k, v in want.items():
        assert emitted.get(k) == v, k  # distances are deterministic


def test_cross_batch_discovery(spark, tmp_path, media):
    index = ParquetTable(spark, str(tmp_path / "ic"))
    # batch 0: group 0's PNG original + group 1 complete;
    # batch 1: group 0's q40 re-encode
    p0 = _pairs(fold_image_index(
        index,
        media.filter("doc_id = 0 or (doc_id >= 6 and doc_id < 12)"),
        batch_id=0,
    ))
    assert (0, 2) not in p0
    p1 = _pairs(fold_image_index(
        index, media.filter("doc_id = 2"), batch_id=1
    ))
    assert (0, 2) in p1  # discovered across batches, via the store


def test_replay_is_exactly_once(spark, tmp_path, media):
    index = ParquetTable(spark, str(tmp_path / "ir"))
    first = media.filter("doc_id < 9")
    p1 = _pairs(fold_image_index(index, first, batch_id=0))
    n_rows = index.read().count()
    p1r = _pairs(fold_image_index(index, first, batch_id=0))
    assert index.read().count() == n_rows
    assert set(p1r) >= set(p1)
    fold_image_index(index, media.filter("doc_id >= 9"), batch_id=1)
    assert _pairs(stored_image_pairs(index)) == _pairs(
        image_near_dup_pairs(media)
    )


def test_slot_cap_crossed_across_batches(spark, tmp_path, media):
    """With the cap below the per-slot carrier count that only the
    ACCUMULATED corpus reaches, the stored view drops the slot
    exactly as batch does."""
    index = ParquetTable(spark, str(tmp_path / "ix"))
    cap = 3  # each group's 6 variants share slots → capped out
    for i in range(3):
        fold_image_index(
            index,
            media.filter(
                (F.col("doc_id") >= i * 12)
                & (F.col("doc_id") < (i + 1) * 12)
            ),
            batch_id=i,
            max_posting=cap,
        )
    want = _pairs(image_near_dup_pairs(media, max_posting=cap))
    assert _pairs(stored_image_pairs(index, max_posting=cap)) == want


def test_signatures_reconstruct(spark, tmp_path, media):
    from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (  # noqa: E501
        image_signatures,
    )

    index = ParquetTable(spark, str(tmp_path / "is"))
    fold_image_index(index, media, batch_id=0)
    got = {
        r["doc_id"]: (r["dhash"], r["ahash"])
        for r in stored_signatures(index).collect()
    }
    ref = {
        r["doc_id"]: (r["dhash"], r["ahash"])
        for r in image_signatures(media).collect()
    }
    assert got == ref


def test_writer_checkpoint_restart_and_pair_table(
    spark, tmp_path, media
):
    index = ParquetTable(spark, str(tmp_path / "iw"))
    pairs = ParquetTable(spark, str(tmp_path / "ip"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    media.filter("doc_id < 18").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                image_index_writer(index, pairs, compact_at_files=2)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    media.filter("doc_id >= 18").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    want = _pairs(image_near_dup_pairs(media))
    assert _pairs(stored_image_pairs(index)) == want
    table_pairs = _pairs(pairs.read())
    for k, v in want.items():
        assert table_pairs.get(k) == v, k
    assert media.count() == index.read().select(
        "doc_id"
    ).distinct().count()


def test_empty_and_corrupt_batches_are_safe(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "ie"))
    empty = spark.createDataFrame([], "doc_id long, blob binary")
    assert fold_image_index(index, empty, batch_id=0).count() == 0
    junk = spark.createDataFrame(
        [(1, bytearray(b"not an image"))], "doc_id long, blob binary"
    )
    assert fold_image_index(index, junk, batch_id=1).count() == 0
    assert index.current_version() == 0 or index.read().count() == 0


def test_slot_rows_track_banded_slicing(spark):
    """Self-review regression: the fold's slot derivation must use
    band_bits = 64 // bands exactly like banded_hamming_pairs — a
    hard-coded 16 broke the no-miss guarantee at bands != 4 for
    hash pairs whose differing bits spread 2 per 16-bit slice."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.image_index import (  # noqa: E501
        _slot_rows,
    )

    dhash = 0x0123456789ABCDEF
    sigs = spark.createDataFrame(
        [(1, dhash, 0)], "doc_id long, dhash long, ahash long"
    )
    for bands in (2, 4, 8):
        bb = 64 // bands
        got = {
            r["slot"] for r in _slot_rows(sigs, bands, 1).collect()
        }
        want = set()
        for b in range(bands):
            raw = (dhash >> (b * bb)) & ((1 << bb) - 1)
            for flip in [0] + [1 << j for j in range(bb)]:
                want.add((b << bb) | (raw ^ flip))
        assert got == want, bands
