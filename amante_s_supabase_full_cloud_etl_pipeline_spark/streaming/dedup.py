"""Streaming dedup-on-arrival (charter extension, SURVEY.md §2.10 ×
§2.8): the streaming twin of the batch exact-dedup operator, for
corpus ingest where duplicates arrive across micro-batches.

``dropDuplicatesWithinWatermark`` keys the state store on the dedup
key and expires entries once the watermark passes — state stays
bounded by (arrival-rate × watermark window), not corpus size, which
is what makes exactly-one-copy ingest feasible at 100 TB/day: a
plain ``dropDuplicates`` on an unbounded stream would grow state
forever. Duplicates farther apart than the watermark are left to the
downstream batch dedup (operators/dedup.py) — the standard two-tier
design: cheap bounded-state online pass, exact offline pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def dedup_on_arrival(
    stream: DataFrame,
    keys: list[str],
    event_time: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per key within the watermark window."""
    return stream.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(keys)


def content_dedup_on_arrival(
    stream: DataFrame,
    text_col: str = "text",
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-keyed variant: dedup on the md5 fingerprint of the
    normalized text (same key the batch operator uses, so online and
    offline passes agree on what "duplicate" means)."""
    keyed = stream.withColumn("fp", fingerprint(F.col(text_col)))
    return dedup_on_arrival(keyed, ["fp"], event_time, watermark)
