"""Driver-checked registry queries for the time-series operators
(operators/timeseries.py): rolling z-score anomalies, OHLC bucket
downsampling, gap-fill with linear interpolation. All three are pure
window/groupBy compositions with exact-decimal accumulation, so each
has a plain relational DuckDB oracle mirroring the same explicit
float formulas (identical operands -> identical IEEE doubles, with a
final round(6))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..registry import register
from ._common import dec


@register(
    "events_rolling_zscore",
    oracle="""
    WITH fr AS (
        SELECT event_type, ts, event_id, value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2))
                             * CAST(value AS DECIMAL(18,2))
                        AS DECIMAL(38,4))) OVER w AS DOUBLE) AS q,
               COUNT(value) OVER w AS n
        FROM events
        WINDOW w AS (
            PARTITION BY event_type ORDER BY ts, event_id
            ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, ts, value,
           round((value - s / CAST(n AS DOUBLE))
                 / sqrt((q - s * s / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)), 6) AS zscore
    FROM fr
    WHERE n = 50
      AND (q - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) > 0
      AND abs(round((value - s / CAST(n AS DOUBLE))
                    / sqrt((q - s * s / CAST(n AS DOUBLE))
                           / (CAST(n AS DOUBLE) - 1.0)), 6)) > 2.0
    ORDER BY event_type, ts
    """,
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: each event's value scored
    against the exact-decimal mean/variance of the 50 PRECEDING
    events of its type (self-excluded frame), |z| > 2 emitted. The
    bounded frame is precisely the state a watermarked streaming twin
    would keep per key."""
    from ..operators.timeseries import rolling_zscore

    ev = catalog.table(spark, sf_dir, "events")
    return rolling_zscore(
        ev,
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        order_cols=["ts", "event_id"],
        window=50,
        threshold=2.0,
    ).orderBy("event_type", "ts")


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket_start, value,
               first_value(value) OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id
               ) AS open,
               first_value(value) OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC
               ) AS close
        FROM events
    )
    SELECT event_type, bucket_start,
           MAX(open) AS open, MAX(value) AS high, MIN(value) AS low,
           MAX(close) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
           COUNT(*) AS n_rows
    FROM b GROUP BY event_type, bucket_start
    ORDER BY event_type, bucket_start
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: hourly open/high/low/close/volume bars per
    event type in ONE hash aggregation (open/close via min_by/max_by
    on the (ts, event_id) struct — no window, no second shuffle; the
    oracle needs windows only because SQL lacks min_by over a
    composite order)."""
    from ..operators.timeseries import ohlc_buckets

    ev = catalog.table(spark, sf_dir, "events")
    return ohlc_buckets(
        ev,
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
        bucket="hour",
    )


@register(
    "events_gap_fill_daily",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS obs
        FROM events WHERE event_type = 'purchase' AND user_id < 40
        GROUP BY 1, 2
    ),
    bounds AS (
        SELECT user_id, min(ts) AS lo, max(ts) AS hi FROM daily GROUP BY user_id
    ),
    grid AS (
        SELECT b.user_id, g.ts
        FROM bounds b, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g(ts)
    ),
    j AS (
        SELECT g.user_id, g.ts, d.obs
        FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.ts = g.ts
    ),
    f AS (
        SELECT user_id, ts, obs,
               last_value(obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN obs IS NOT NULL THEN ts END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN obs IS NOT NULL THEN ts END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
    )
    SELECT user_id, ts,
           CASE WHEN obs IS NOT NULL THEN obs
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE round(pv + (nv - pv)
                     * (CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE)
                        / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE)), 6)
           END AS value,
           obs IS NULL AS filled
    FROM f ORDER BY user_id, ts
    """,
)
def events_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + linear interpolation: each user's (sparse) daily
    purchase totals regularized onto a per-user daily grid, missing
    days interpolated between observed neighbors (epoch-microsecond
    fraction), edges clamped to the nearest observation. The grid is
    generated per key with sequence()/explode — no global calendar
    table, no cross join."""
    from ..operators.timeseries import gap_fill_interpolate

    ev = catalog.table(spark, sf_dir, "events")
    daily = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40))
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("ts"))
        .agg(F.sum(dec(F.col("value"))).cast("double").alias("daily_total"))
    )
    return gap_fill_interpolate(
        daily, key_cols=["user_id"], ts_col="ts", value_col="daily_total",
        step="1 day",
    )
