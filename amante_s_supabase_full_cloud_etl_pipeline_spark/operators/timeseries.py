"""Time-series operators over event streams — rolling anomaly
scores, OHLC bucket downsampling, and gap-fill with linear
interpolation. The reference's dashboard slices time into fixed
buckets (SURVEY F19); these are the operators a monitoring or
feature-engineering pipeline needs on the same events table, each a
pure window/groupBy composition (no UDFs, single shuffle per key).

Float-determinism: every statistic that feeds an output value is
accumulated as DECIMAL (exact, order-independent) and converted to
DOUBLE only inside the final scalar expression, which is written as
the SAME explicit formula in the DuckDB oracles — identical operands
and operation order give identical IEEE results, with a final
round(6) guarding the representation boundary.

Scale shape: all three operators shuffle once on their key and apply
sequential logic only inside per-key ordered windows (bounded frames
for the z-score; grid sizes are (range/step) per key for gap-fill —
callers pick steps so the per-key series is memory-sane, same
contract as any window op). Nothing is ever globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans._common import dec

_D4 = "decimal(38,4)"


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    window: int = 50,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key rolling z-score of ``value_col`` against the PRECEDING
    ``window`` rows (the current row is excluded so an outlier never
    dilutes its own baseline), emitting only rows whose |z| exceeds
    ``threshold`` with a complete window — the streaming-friendly
    anomaly flag (a bounded frame is exactly the state a watermarked
    stream keeps).

    Returns key cols + ts + value + ``zscore`` (rounded to 6). The
    mean and variance come from exact decimal SUM/SUM-of-squares over
    the frame, so the score is engine- and partitioning-independent:
    var = (q - s^2/n) / (n-1), z = (x - s/n) / sqrt(var).
    """
    if window < 2:
        raise ValueError("window must be >= 2 (sample variance needs n-1 > 0)")
    order_cols = order_cols or [ts_col]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    s = F.sum(dec(F.col(value_col))).over(w).cast("double")
    q = F.sum((dec(F.col(value_col)) * dec(F.col(value_col))).cast(_D4)).over(w).cast(
        "double"
    )
    n = F.count(F.col(value_col)).over(w)
    nd = n.cast("double")
    # Incomplete frames (n < window, so possibly n ∈ {0, 1} with zero
    # divisors under ANSI mode) evaluate var to NULL inside a when()
    # guard rather than dividing; zero-variance frames (a constant
    # baseline has no z-score; ANSI would error, DuckDB would emit
    # inf) are then dropped by the var > 0 gate before z is computed.
    var = F.when(
        n == window, (q - s * s / nd) / (nd - F.lit(1.0))
    )
    gated = df.select(
        *key_cols,
        ts_col,
        value_col,
        s.alias("_s"),
        nd.alias("_nd"),
        var.alias("_var"),
    ).filter(F.col("_var") > 0)
    z = F.round(
        (F.col(value_col) - F.col("_s") / F.col("_nd")) / F.sqrt(F.col("_var")), 6
    )
    return (
        gated.select(*key_cols, ts_col, value_col, z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > threshold)
    )


def ohlc_buckets(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Downsample to per-(key, bucket) OHLC bars: open/close are the
    first/last value by (ts, tiebreaker) — ``min_by``/``max_by`` over
    a struct, one hash aggregation, no window — plus high, low, the
    exact-decimal volume sum, and the row count. The financial-tick
    shape, equally the right reduction for any metric stream."""
    period = F.date_trunc(bucket, F.col(ts_col))
    ordkey = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(*key_cols, period.alias("bucket_start"))
        .agg(
            F.min_by(F.col(value_col), ordkey).alias("open"),
            F.max(F.col(value_col)).alias("high"),
            F.min(F.col(value_col)).alias("low"),
            F.max_by(F.col(value_col), ordkey).alias("close"),
            F.sum(dec(F.col(value_col))).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(*key_cols, "bucket_start")
    )


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Regularize each key's series onto a fixed ``step`` grid from
    its own min to max timestamp, linearly interpolating missing
    points between observed neighbors and clamping the edges to the
    nearest observation (leading/trailing gaps take the first/last
    real value — documented ffill/bfill edge rule).

    Returns key cols + ``ts`` (grid) + ``value`` (observed exact, or
    round-6 interpolated) + ``filled`` flag. Construction: per-key
    min/max agg -> ``sequence()`` grid explode -> left join observed
    (grid timestamps are exact-µs members, so observed points land on
    their own grid rows) -> one ordered window with last/first
    ignore-nulls carrying (prev, next) observation and their
    timestamps -> pure arithmetic. Interpolation fraction uses
    epoch-microsecond integers, so both engines divide identical
    numbers."""
    grid = (
        df.groupBy(*key_cols)
        .agg(F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias("ts"),
        )
    )
    obs = df.select(
        *key_cols, F.col(ts_col).alias("ts"), F.col(value_col).alias("_obs")
    )
    joined = grid.join(obs, [*key_cols, "ts"], "left")
    w = Window.partitionBy(*key_cols).orderBy("ts")
    obs_ts = F.when(F.col("_obs").isNotNull(), F.col("ts"))
    prev_v = F.last("_obs", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_t = F.last(obs_ts, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    next_v = F.first("_obs", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    next_t = F.first(obs_ts, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    frac = (F.unix_micros(F.col("ts")) - F.unix_micros(prev_t)).cast("double") / (
        F.unix_micros(next_t) - F.unix_micros(prev_t)
    ).cast("double")
    interp = F.round(prev_v + (next_v - prev_v) * frac, 6)
    value = (
        F.when(F.col("_obs").isNotNull(), F.col("_obs"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(interp)
    )
    return (
        joined.select(
            *key_cols,
            "ts",
            value.alias("value"),
            F.col("_obs").isNull().alias("filled"),
        )
        .orderBy(*key_cols, "ts")
    )
