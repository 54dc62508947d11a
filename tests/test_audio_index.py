"""Streaming audio near-dup index: the two-tier contract — the
stored read-time view equals the batch operator over the accumulated
corpus EXACTLY (any chunking, replays, checkpoint restart), and the
emitted pair stream never misses a final pair (fold-time eligibility
⊇ final eligibility), even when a probe crosses the ubiquity cap
only across batches."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.audio_fp import (
    audio_near_dup_pairs,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.multimodal import (
    encode_wav_pcm16,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.audio_index import (
    audio_index_writer,
    fold_audio_index,
    stored_audio_pairs,
)

RATE = 16_000


def _voice_like(seed: int, seconds: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(RATE * seconds)) / RATE
    x = np.zeros_like(t)
    for _ in range(6):
        f0 = rng.uniform(320, 2800)
        drift = rng.uniform(-80, 80)
        x += rng.uniform(0.05, 0.2) * np.sin(
            2 * np.pi * (f0 + drift * t) * t + rng.uniform(0, 6)
        )
    x += 0.01 * rng.standard_normal(t.size)
    return (x / np.max(np.abs(x)) * 0.7).astype(np.float64)


def _corpus(spark, n_pairs: int = 3, n_single: int = 4):
    """2*n_pairs near-dup docs (even = original, odd = scaled+noisy
    copy) then n_single unrelated docs."""
    rng = np.random.default_rng(42)
    rows = []
    did = 0
    for p in range(n_pairs):
        x = _voice_like(100 + p)
        y = 0.6 * x + 0.02 * rng.standard_normal(x.size)
        for w in (x, y):
            rows.append(
                (did, bytearray(
                    encode_wav_pcm16((w * 20_000).astype(np.int16), RATE)
                ))
            )
            did += 1
    for s in range(n_single):
        w = _voice_like(500 + s)
        rows.append(
            (did, bytearray(
                encode_wav_pcm16((w * 20_000).astype(np.int16), RATE)
            ))
        )
        did += 1
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): r["shared_probes"] for r in df.collect()
    }


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stored_view_equals_batch_and_stream_never_misses(
    spark, tmp_path, n_batches
):
    media = _corpus(spark)
    want = _pairs(audio_near_dup_pairs(media))
    assert len(want) >= 3  # the three planted near-dup pairs

    index = ParquetTable(spark, str(tmp_path / f"ai{n_batches}"))
    emitted: dict = {}
    n_docs = media.count()
    per = (n_docs + n_batches - 1) // n_batches
    for i in range(n_batches):
        found = fold_audio_index(
            index,
            media.filter(
                (F.col("doc_id") >= i * per)
                & (F.col("doc_id") < (i + 1) * per)
            ),
            batch_id=i,
        )
        for k, v in _pairs(found).items():
            emitted[k] = max(emitted.get(k, 0), v)
    # exact tier: the stored read-time view IS the batch operator
    assert _pairs(stored_audio_pairs(index)) == want
    # no-miss tier: every final pair was emitted by some fold
    for k in want:
        assert k in emitted, k


def test_cap_crossed_across_batches(spark, tmp_path):
    """Shared silence carried by EVERY doc becomes ubiquitous only
    once enough batches folded: early folds may emit silence pairs
    (fold-time frequency under the cap — documented), but the stored
    view drops them exactly as batch does, and genuine pairs
    survive."""
    rng = np.random.default_rng(9)
    silence = np.zeros(RATE // 2)
    rows = []
    x0 = _voice_like(7)
    x1 = 0.5 * x0 + 0.02 * rng.standard_normal(x0.size)
    waves = [x0, x1] + [_voice_like(70 + d) for d in range(6)]
    for d, w in enumerate(waves):
        full = np.concatenate([silence, w])
        rows.append(
            (d, bytearray(
                encode_wav_pcm16((full * 20_000).astype(np.int16), RATE)
            ))
        )
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    cap = 4  # silence probes are in all 8 docs → ubiquitous
    want = _pairs(audio_near_dup_pairs(media, max_posting=cap))
    assert (0, 1) in want
    assert all(k == (0, 1) for k in want)  # silence pairs capped out

    index = ParquetTable(spark, str(tmp_path / "ax"))
    emitted: dict = {}
    for i in range(4):  # 2 docs per batch
        found = fold_audio_index(
            index,
            media.filter(
                (F.col("doc_id") >= 2 * i) & (F.col("doc_id") < 2 * i + 2)
            ),
            batch_id=i,
            max_posting=cap,
        )
        for k, v in _pairs(found).items():
            emitted[k] = max(emitted.get(k, 0), v)
    assert _pairs(stored_audio_pairs(index, max_posting=cap)) == want
    assert (0, 1) in emitted  # the genuine pair was discovered
    # early silence pairs MAY appear in the stream (documented
    # discovery-candidate semantics) — but never in the exact view


def test_cross_batch_discovery(spark, tmp_path):
    """The batch-vs-STORE join is the reason the index exists: a
    near-dup whose two recordings arrive in DIFFERENT batches must
    be emitted by the later fold (review catch: every other test's
    pairs landed in-batch, so a broken cross join passed)."""
    rng = np.random.default_rng(11)
    x = _voice_like(200)
    y = 0.6 * x + 0.02 * rng.standard_normal(x.size)
    others = [_voice_like(300 + d) for d in range(2)]
    rows = [
        (d, bytearray(
            encode_wav_pcm16((w * 20_000).astype(np.int16), RATE)
        ))
        for d, w in enumerate([x, others[0], others[1], y])
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    index = ParquetTable(spark, str(tmp_path / "ac"))
    # batch 0: the original + one unrelated; batch 1: the copy
    p0 = _pairs(fold_audio_index(index, media.filter("doc_id < 3"), batch_id=0))
    assert (0, 3) not in p0  # doc 3 not ingested yet
    p1 = _pairs(fold_audio_index(index, media.filter("doc_id = 3"), batch_id=1))
    assert (0, 3) in p1  # discovered ACROSS batches, via the store
    assert p1[(0, 3)] >= 8
    # and the exact view agrees with batch end-to-end
    assert _pairs(stored_audio_pairs(index)) == _pairs(
        audio_near_dup_pairs(media)
    )


def test_replay_is_exactly_once(spark, tmp_path):
    media = _corpus(spark, n_pairs=2, n_single=2)
    index = ParquetTable(spark, str(tmp_path / "ar"))
    first = media.filter("doc_id < 3")
    p1 = _pairs(fold_audio_index(index, first, batch_id=0))
    n_rows = index.read().count()
    p1r = _pairs(fold_audio_index(index, first, batch_id=0))
    assert index.read().count() == n_rows  # append was idempotent
    assert set(p1r) >= set(p1)  # re-emits (possibly via the index)
    fold_audio_index(index, media.filter("doc_id >= 3"), batch_id=1)
    assert _pairs(stored_audio_pairs(index)) == _pairs(
        audio_near_dup_pairs(media)
    )


def test_writer_checkpoint_restart_and_pair_table(spark, tmp_path):
    """readStream → audio_index_writer across a restart: the keyed
    pair table covers the exact final pairs, and the stored view
    equals batch."""
    media = _corpus(spark)
    rows = media.collect()
    index = ParquetTable(spark, str(tmp_path / "as"))
    pairs = ParquetTable(spark, str(tmp_path / "ap"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    media.filter("doc_id < 4").coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                audio_index_writer(index, pairs, compact_at_files=2)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    media.filter("doc_id >= 4").coalesce(1).write.mode("append").parquet(src)
    run_once()

    want = _pairs(audio_near_dup_pairs(media))
    assert _pairs(stored_audio_pairs(index)) == want
    table_pairs = _pairs(pairs.read().select(
        "doc_a", "doc_b", "shared_probes"
    ))
    for k in want:
        assert k in table_pairs, k
    assert len(rows) == index.read().select("doc_id").distinct().count()


def test_empty_and_corrupt_batches_are_safe(spark, tmp_path):
    index = ParquetTable(spark, str(tmp_path / "ae"))
    empty = spark.createDataFrame([], "doc_id long, blob binary")
    assert fold_audio_index(index, empty, batch_id=0).count() == 0
    junk = spark.createDataFrame(
        [(1, bytearray(b"not audio"))], "doc_id long, blob binary"
    )
    assert fold_audio_index(index, junk, batch_id=1).count() == 0
    assert index.current_version() == 0 or index.read().count() == 0


def test_duplicate_free_stream_leaves_readable_empty_pair_table(
    spark, tmp_path
):
    """Review catch: the empty-merge skip used to leave the pairs
    table at version 0, where read() raises — a duplicate-free
    stream must still bootstrap a readable EMPTY table (zero-row
    append, no rewrite)."""
    from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.audio_index import (  # noqa: E501
        audio_index_writer,
    )

    index = ParquetTable(spark, str(tmp_path / "di"))
    pairs = ParquetTable(spark, str(tmp_path / "dp"))
    handle = audio_index_writer(index, pairs)
    media = spark.createDataFrame(
        [
            (d, bytearray(encode_wav_pcm16(
                (_voice_like(900 + d) * 20_000).astype(np.int16), RATE
            )))
            for d in range(2)
        ],
        "doc_id long, blob binary",
    )
    handle(media, 0)
    assert pairs.read().count() == 0  # readable, empty — not a raise
    assert pairs.current_version() == 1
    # replay converges (the bootstrap append recorded the batch_id)
    handle(media, 0)
    assert pairs.current_version() == 1
