"""F19 date/time bucketing (dashboard slicers, SURVEY.md §2.4 F19).

The reference's dashboard buckets ``Payment time`` by hour,
day-of-week, ISO week, and month (``assets/New BI SC.jpg``). These are
plain Catalyst expressions; at 100 TB the fact table would be
partitioned by a date column so these predicates partition-prune.

Cross-engine notes (pinned by the DuckDB oracle):
- Spark ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB's is
  0=Sunday..6 — oracles add 1.
- ``weekofyear`` is ISO in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hour_of_day(ts: Column) -> Column:
    return F.hour(ts)


def day_of_week(ts: Column) -> Column:
    """1=Sunday .. 7=Saturday (Spark semantics)."""
    return F.dayofweek(ts)


def day_name(ts: Column) -> Column:
    return F.date_format(ts, "EEEE")


def week_of_year(ts: Column) -> Column:
    return F.weekofyear(ts)


def month_number(ts: Column) -> Column:
    return F.month(ts)


def month_name(ts: Column) -> Column:
    return F.date_format(ts, "MMMM")


def with_time_buckets(df, ts_col: str):
    """Attach the full dashboard bucket set to a DataFrame."""
    ts = F.col(ts_col)
    return df.withColumns(
        {
            "hour_of_day": hour_of_day(ts),
            "day_of_week": day_of_week(ts),
            "day_name": day_name(ts),
            "week_of_year": week_of_year(ts),
            "month_number": month_number(ts),
            "month_name": month_name(ts),
        }
    )
