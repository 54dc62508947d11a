"""Streaming corpus curation: the batch curation chain
(quality band → PII redaction → dedup → decontamination) applied to
documents as they ARRIVE, with idempotent commits into the
snapshot-isolated table format.

Composition per micro-batch:

1. map-only signals + band filter (same expressions as batch — one
   codegen stage, no state),
2. PII redaction (map-only),
3. content dedup-on-arrival (``dropDuplicatesWithinWatermark`` on the
   batch fingerprint key — bounded state; see streaming/dedup.py),
4. benchmark decontamination against a BROADCAST eval-shingle set
   (the eval set is fixed for the run, so it is built once up front
   and every micro-batch probes the same broadcast — no per-batch
   recompute),
5. ``ParquetTable.append(batch_id=...)`` — replays after a crash are
   no-ops, so at-least-once ``foreachBatch`` delivery becomes
   exactly-once table content.

At 100 TB/day the same topology holds: stages 1-2 and 4 are
stateless map work, stage 3's state is bounded by the watermark, and
stage 5 commits manifests, never rewrites data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.decontam import eval_shingle_set
from ..operators.dedup import shingle_table
from ..operators.redact import redact_pii
from ..operators.text import quality_score, token_count
from ..sources.table_format import ParquetTable
from .dedup import content_dedup_on_arrival


def curate_batch(
    batch: DataFrame,
    eval_shingles: DataFrame | None,
    min_quality: float = 0.4,
    min_tokens: int = 20,
    decontam_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-micro-batch transform (also usable on a plain batch
    frame): band filter → redact → decontaminate. Deduplication is
    NOT here — on the streaming path it runs upstream with watermark
    state; on a batch path use operators/dedup.py directly."""
    kept = batch.filter(
        (quality_score(F.col(text_col)) >= min_quality)
        & (token_count(F.col(text_col)) >= min_tokens)
    )
    redacted = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    if eval_shingles is None:
        return redacted
    sh = shingle_table(redacted, k=3, text_col=text_col, id_col=id_col)
    hits = (
        sh.join(F.broadcast(eval_shingles), "shingle", "left_semi")
        .groupBy(F.col(id_col), F.col("set_size"))
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(
            F.col("n_hit").cast("double") / F.col("set_size").cast("double")
            >= F.lit(float(decontam_threshold))
        )
        .select(id_col)
    )
    return redacted.join(hits, id_col, "left_anti")


def run_curation_stream(
    stream: DataFrame,
    table: ParquetTable,
    eval_docs: DataFrame | None = None,
    checkpoint: str | None = None,
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
    text_col: str = "text",
    id_col: str = "doc_id",
    **curate_kwargs,
) -> StreamingQuery:
    """Wire the chain under a streaming source with AvailableNow
    semantics left to the caller's source options. The eval-shingle
    set is computed once here; every micro-batch reuses it."""
    eval_sh = (
        eval_shingle_set(eval_docs, k=3, text_col=text_col, id_col=id_col)
        if eval_docs is not None
        else None
    )

    deduped = content_dedup_on_arrival(
        stream, text_col=text_col, event_time=event_time, watermark=watermark
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        curated = curate_batch(
            batch.drop("fp"), eval_sh, text_col=text_col, id_col=id_col, **curate_kwargs
        )
        if not curated.isEmpty():
            table.append(curated, batch_id=batch_id)

    writer = deduped.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()
