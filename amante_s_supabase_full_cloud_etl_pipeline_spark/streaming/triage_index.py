"""Incrementally-maintained media catalog — the streaming twin of
:mod:`..operators.triage` (charter §2.10 × §2.8: every landing-zone
operator here carries a persistent cross-batch tier — crawl URLs,
chunk hashes, audio probes; the mixed-drop census lands with one).

What a growing 100 TB landing prefix actually needs is not a
one-shot census (``examples/mixed_drop.py``) but a CATALOG that
stays current as files arrive: per blob, what is it, is it intact,
how big — so routing decisions (ship these bytes to the pdf fleet,
quarantine those) read a table instead of re-sniffing history.

The pattern is the sibling indexes', SIMPLER because triage rows are
pure per-blob functions (no cross-document eligibility, so no
two-tier cap contract): a persistent ParquetTable holds one triage
row per ingested blob; each micro-batch

1. classifies its blobs in the one-pass Arrow kernel
   (:func:`..operators.triage.triage_media`),
2. appends the rows exactly-once (``batch_id`` ledger),
3. returns the batch's rows — the per-file classification EVENT
   stream (route on it, alert on ``family = 'unknown'`` spikes).

EXACT equivalence (stronger than the audio/chunk twins' two-tier
contract): the stored view equals the batch operator over the union
of all folded batches, row for row, under ANY chunking, replays, and
checkpoint restarts — pinned in tests/test_triage_index.py.

Scale shape: the fold is map-only (no shuffle, no join against the
store — nothing in a blob's classification depends on other blobs);
index growth is one row per blob; :func:`stored_media_census` is a
tiny two-column aggregation over the store, and
``compact(sort_by=["family", "codec"])`` keeps family scans
file-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.triage import triage_media
from ..sources.table_format import ParquetTable


def fold_triage_index(
    index: ParquetTable,
    batch: DataFrame,
    batch_id: int | None = None,
) -> DataFrame:
    """Process one micro-batch of (doc_id, blob): classify every
    blob, append the rows to the catalog exactly-once, return them.
    The returned frame is materialized BEFORE the append commits
    (replay shape: a retried batch re-emits identical rows — they
    are pure functions of the bytes — and the ledger skips the
    double append)."""
    rows = triage_media(batch).localCheckpoint(eager=True)
    index.append(rows, batch_id=batch_id)
    return rows


def stored_triage(index: ParquetTable) -> DataFrame:
    """The accumulated per-blob catalog — equals
    :func:`..operators.triage.triage_media` over the union of all
    folded batches (exactly; pinned in tests)."""
    return index.read()


def stored_media_census(index: ParquetTable) -> DataFrame:
    """The census over the catalog: (family, codec, parseable) →
    blob count + byte total — the report a routing layer reads.
    A tiny hash aggregation; never re-touches blob bytes."""
    return (
        stored_triage(index)
        .groupBy("family", "codec", "parseable")
        .agg(
            F.count(F.lit(1)).alias("blobs"),
            F.sum("byte_length").alias("bytes"),
        )
    )


def triage_index_writer(index: ParquetTable, compact_at_files: int = 0):
    """``foreachBatch`` handler maintaining the catalog exactly-once:

        (stream.writeStream
            .foreachBatch(triage_index_writer(index))
            .option("checkpointLocation", ...).start())

    ``compact_at_files``: when > 0, a fold that leaves the table
    with at least this many live files triggers
    ``compact(sort_by=["family", "codec"])`` so family-filtered
    routing scans stay file-prunable as the catalog grows."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # compaction-before-fold keeps the replay-guard walk short,
        # same ordering as the sibling writers
        if compact_at_files and len(index.files()) >= compact_at_files:
            index.compact(sort_by=["family", "codec"])
        fold_triage_index(index, batch_df, batch_id=batch_id)

    return handle
