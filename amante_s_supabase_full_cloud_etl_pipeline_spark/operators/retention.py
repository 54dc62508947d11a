"""Cohort retention analysis over the events stream — with
:mod:`.funnel` the second canonical product-analytics query an events
table gets asked: group users by first-seen period (their cohort) and
count who comes back N periods later.

Pure relational, two shuffles total regardless of events volume:

1. ``min(period)`` per user = cohort assignment (hash agg on the
   user key);
2. the user's DISTINCT active periods (map-side-combining distinct on
   (user, period));
3. join 1⇆2 on the user key (same partitioning, AQE-reused), then one
   hash agg on (cohort, periods_since) with ``count_distinct(user)``
   — output is cohort×periods sized, tiny at any scale.

Period arithmetic stays exact: periods are ``date_trunc`` timestamps,
so day-difference division by the period length is always an integer
— no calendar ambiguity, identical in any engine (the DuckDB
differential mirrors it verbatim)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIOD_DAYS = {"week": 7, "day": 1}


def cohort_retention(
    events: DataFrame,
    granularity: str = "week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, periods_since, n_active, cohort_size, retention) —
    one row per cohort × period offset with activity, where
    ``retention = n_active / cohort_size`` and ``periods_since = 0``
    rows are the cohort sizes themselves (retention 1.0 by
    construction: the first-seen period is an active period)."""
    if granularity not in _PERIOD_DAYS:
        raise ValueError(f"granularity must be one of {sorted(_PERIOD_DAYS)}")
    days = _PERIOD_DAYS[granularity]
    period = F.date_trunc(granularity, F.col(ts_col))
    active = (
        events.select(F.col(user_col).alias("user"), period.alias("period"))
        .distinct()
    )
    cohorts = active.groupBy("user").agg(F.min("period").alias("cohort"))
    sized = cohorts.groupBy("cohort").agg(F.count_distinct("user").alias("cohort_size"))
    grid = (
        active.join(cohorts, "user")
        .withColumn(
            "periods_since",
            (F.datediff(F.col("period"), F.col("cohort")) / days).cast("long"),
        )
        .groupBy("cohort", "periods_since")
        .agg(F.count_distinct("user").alias("n_active"))
    )
    return (
        grid.join(sized, "cohort")
        .select(
            "cohort",
            "periods_since",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort", "periods_since")
    )
