"""Streaming media catalog (streaming/triage_index.py): the stored
view equals the batch triage over the accumulated corpus EXACTLY
(any chunking, replays, checkpoint restart) — the strongest contract
in the streaming-index family, available because triage rows are
pure per-blob functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.triage import (
    synthetic_mixed_corpus,
    triage_media,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.sources.table_format import (
    ParquetTable,
)
from amante_s_supabase_full_cloud_etl_pipeline_spark.streaming.triage_index import (
    fold_triage_index,
    stored_media_census,
    stored_triage,
    triage_index_writer,
)


def _corpus(spark, n: int = 56):
    docs = spark.range(0, n).withColumnRenamed("id", "doc_id")
    return synthetic_mixed_corpus(docs).select("doc_id", "blob")


def _rows(df):
    return {
        r["doc_id"]: (r["family"], r["codec"], r["parseable"],
                      r["width"], r["height"], r["duration_ms"],
                      r["n_streams"], r["detail"], r["byte_length"])
        for r in df.collect()
    }


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stored_equals_batch_under_any_chunking(
    spark, tmp_path, n_batches
):
    media = _corpus(spark)
    media.persist()
    try:
        want = _rows(triage_media(media))
        assert len(want) == 56  # exactly one row per blob
        index = ParquetTable(spark, str(tmp_path / f"ti{n_batches}"))
        emitted: dict = {}
        per = (56 + n_batches - 1) // n_batches
        for i in range(n_batches):
            out = fold_triage_index(
                index,
                media.filter(
                    (F.col("doc_id") >= i * per)
                    & (F.col("doc_id") < (i + 1) * per)
                ),
                batch_id=i,
            )
            emitted.update(_rows(out))
        # EXACT: stored view row-for-row equals batch triage, and
        # the emitted event stream covered every row
        assert _rows(stored_triage(index)) == want
        assert emitted == want
        # census equals the same aggregation over batch triage
        want_census = {
            (r["family"], r["codec"], r["parseable"]):
                (r["blobs"], r["bytes"])
            for r in triage_media(media)
            .groupBy("family", "codec", "parseable")
            .agg(F.count(F.lit(1)).alias("blobs"),
                 F.sum("byte_length").alias("bytes"))
            .collect()
        }
        got_census = {
            (r["family"], r["codec"], r["parseable"]):
                (r["blobs"], r["bytes"])
            for r in stored_media_census(index).collect()
        }
        assert got_census == want_census
        # the mixed corpus really lands unknowns in the catalog
        assert any(k[0] == "unknown" for k in got_census)
    finally:
        media.unpersist()


def test_replay_is_exactly_once(spark, tmp_path):
    media = _corpus(spark, n=28)
    index = ParquetTable(spark, str(tmp_path / "tr"))
    first = media.filter("doc_id < 14")
    r1 = _rows(fold_triage_index(index, first, batch_id=0))
    n_rows = index.read().count()
    r1r = _rows(fold_triage_index(index, first, batch_id=0))
    assert index.read().count() == n_rows  # ledger skipped the dup
    assert r1r == r1  # pure re-emission
    fold_triage_index(index, media.filter("doc_id >= 14"), batch_id=1)
    assert _rows(stored_triage(index)) == _rows(triage_media(media))


def test_writer_checkpoint_restart(spark, tmp_path):
    """readStream → triage_index_writer across a restart: stored
    stays exactly batch, compaction keeps the table at few files."""
    media = _corpus(spark, n=42)
    index = ParquetTable(spark, str(tmp_path / "ts"))
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    media.filter("doc_id < 28").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                triage_index_writer(index, compact_at_files=2)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    media.filter("doc_id >= 28").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    assert _rows(stored_triage(index)) == _rows(triage_media(media))
    assert len(index.files()) <= 4  # compaction engaged
