"""Streaming joins (SURVEY.md §2.8 completion): watermarked
stream-stream interval joins and stream-static dimension enrichment.

The reference has no streaming joins at all (its one join surface is
the in-database star resolution, SURVEY.md J2); these are the two
join shapes a real event pipeline needs the moment two event feeds
must correlate:

- :func:`attribution_join` — the canonical stream-stream pattern:
  match each RIGHT event (conversion) to LEFT events (impressions)
  for the same key within a bounded event-time delay. Both sides are
  watermarked and the join condition carries the time bound, so
  Spark can expire state: an impression older than
  ``watermark + max_delay`` can never match again and is dropped —
  bounded state at any stream length, the thing an unbounded-delay
  join can never give. ``how='left_outer'`` additionally emits
  unmatched left rows (null right columns) once the watermark passes
  their window — but only then, so finite test streams append a
  watermark-advancing sentinel to flush the tail.
- :func:`enrich_stream` — stream-static join against a batch
  dimension table: the static side broadcasts fresh per micro-batch
  (dimension updates picked up on the next trigger), the streaming
  side never shuffles.

Both functions are plain DataFrame transforms: applied to batch
frames they compute the exact same relation (``withWatermark`` is a
no-op in batch), which is how the tests pin streaming == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    conversions: DataFrame,
    key: str = "user_id",
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Correlate conversions to the impressions that preceded them by
    at most ``max_delay`` (same ``key``), event-time semantics.
    Returns (key, imp_id, imp_ts, conv_id, conv_ts, delay_s) — for
    ``left_outer``, unmatched impressions carry null conv columns.

    State bound: both inputs watermarked; the BETWEEN condition gives
    the engine the expiry proof (impression state older than
    watermark + max_delay is unreachable)."""
    imp = impressions.select(
        F.col(key).alias("k"),
        F.col("event_id").alias("imp_id"),
        F.col("ts").alias("imp_ts"),
    ).withWatermark("imp_ts", watermark)
    conv = conversions.select(
        F.col(key).alias("_ck"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    ).withWatermark("conv_ts", watermark)
    cond = (
        (F.col("k") == F.col("_ck"))
        & (F.col("conv_ts") >= F.col("imp_ts"))
        & (F.col("conv_ts") <= F.col("imp_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return (
        imp.join(conv, cond, how)
        .select(
            F.col("k").alias(key),
            "imp_id",
            "imp_ts",
            "conv_id",
            "conv_ts",
            (F.unix_timestamp("conv_ts") - F.unix_timestamp("imp_ts")).alias("delay_s"),
        )
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) events
    frame against a batch dimension table. The static side is re-read
    per micro-batch (dim updates appear on the next trigger) and
    broadcast when small; the stream side never shuffles."""
    return events.join(F.broadcast(dim), on, how)
